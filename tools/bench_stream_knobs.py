"""Kernel-only A/B of the stream-mins variants under the env knobs
(DELTAPQ_STREAM_SERIAL / DELTAPQ_NO_UT / DELTAPQ_NO_DIG), one config
per process (the knobs are read at trace time; a fresh process avoids
stale jit caches).  Workload codes are cached in /tmp so only the
first run pays the learn+encode.

Usage: python tools/bench_stream_knobs.py         # this config
       for cfg in ...; do env $cfg python tools/bench_stream_knobs.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CACHE = "/tmp/deltapq_knobs_codes_1m.npz"


def get_codes(N, M, K):
    if os.path.exists(CACHE):
        return np.load(CACHE)["codes"]
    from bench import make_clustered_codes
    codes = make_clustered_codes(N, M, K)
    np.savez(CACHE, codes=codes)
    return codes


def main():
    import jax
    import jax.numpy as jnp

    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.fused import FusedCompressedEngine

    M, K, Ds = 8, 256, 16
    N, B = 1_048_576, 512
    D = M * Ds
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = get_codes(N, M, K)
    eng = FusedCompressedEngine(cw, codes, precision="int8",
                                fmt="stream")

    q_np = rng.normal(size=(B, D)).astype(np.float32)
    qc = q_np - eng.mu[None, :]
    qk = fp.pack_query_grouped(qc[:, :D], M, Ds)
    qop = jnp.asarray(np.clip(np.rint(qk / eng.scale), -127, 127
                              ).astype(np.int8).T)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_fn(qop, cwbd, rd, vals, meta, salt, iters):
        def body(i, acc):
            q = (qop.astype(jnp.int32)
                 * (1 + jax.lax.rem(salt.astype(jnp.int32) + i, 2)))
            q = jnp.clip(q, -127, 127).astype(jnp.int8)
            mins, echo = fp.fused_stream_mins(
                q, cwbd, rd, vals, meta, jnp.int32(N),
                eng.tiles.e_max, M)
            return (acc + jnp.sum(mins[:4])
                    + jnp.sum(echo[:2]).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def run(salt, it):
        return t_fn(qop, eng.cwbd, eng.row_data, eng.vals, eng.meta,
                    jnp.float32(salt), it)

    for it in (2, 12):
        float(run(np.float32(0), it))
    res = {}
    for it in (2, 12):
        ts = []
        for k in range(3):
            t = time.perf_counter()
            float(run(np.float32(k + 7 * it + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    t = (res[12] - res[2]) / 10
    tag = "+".join(
        [("pipe" if os.environ.get("DELTAPQ_STREAM_PIPELINED")
          else "serial"),
         ("hillis" if os.environ.get("DELTAPQ_NO_UT") else "utmm"),
         ("digpre" if os.environ.get("DELTAPQ_DIG") else "sqpre"),
         f"tile{__import__('deltapq_tpu.ops.fused_pallas', fromlist=['TILE']).TILE}"]
        + ([os.environ["DELTAPQ_STAGEISO"]]
           if os.environ.get("DELTAPQ_STAGEISO") else []))
    print(f"{tag:22s}: {t*1000:6.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
