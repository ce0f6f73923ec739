"""Kernel-only stage isolation for the int16 stream kernel on a
calibrated workload (one DELTAPQ_STAGEISO config per process — the
knob is read at trace time).

Usage:
  for k in "" nodecode novg nooh noscan; do
    DELTAPQ_STAGEISO=$k python tools/bench_stream_stages16.py sift_like
  done
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def get_codes(name, N, M, K):
    cache = f"/tmp/deltapq_codes_{name}_{N}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["cw"], z["codes"]
    from bench import WORKLOADS, make_clustered_codes
    cw, codes = make_clustered_codes(N, M, K, **WORKLOADS[name])
    order = np.lexsort(codes.T[::-1])
    codes = codes[order]
    np.savez(cache, cw=cw, codes=codes)
    return cw, codes


def main():
    import jax
    import jax.numpy as jnp

    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.fused import (FusedCompressedEngine,
                                       _mins_query_args, _pad_queries)

    name = sys.argv[1] if len(sys.argv) > 1 else "sift_like"
    tier = os.environ.get("TIER", "stream")   # stream | codes
    M, K, Ds = 8, 256, 16
    N, B = 1_048_576, 512
    D = M * Ds
    cw, codes = get_codes(name, N, M, K)
    eng = FusedCompressedEngine(cw, codes, precision="int16",
                                fmt="stream")
    rng = np.random.default_rng(0)
    qb = rng.normal(size=(B, D)).astype(np.float32)
    qp, _ = _pad_queries(qb, eng.d_pad)
    qc = qp - eng.mu[None, :]
    qk = fp.pack_query_grouped(qc[:, :D], M, Ds)
    qop, _, uq, _eq = _mins_query_args(qk, "int16", eng.scale)
    if tier == "codes":
        # same scan tail, u8 codes resident (no stream decode): the
        # VERDICT #2 ratio denominator at equal precision
        n_pad = -(-N // fp.TILE) * fp.TILE
        cp = np.zeros((n_pad, M), np.uint8)
        cp[:N] = codes
        codes_dev = jnp.asarray(cp)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_fn(qop, salt, iters):
        def body(i, acc):
            # flip digit signs by salt parity: changes the dispatch
            # without changing shapes (relay caches identical ones)
            s = (1 - 2 * jax.lax.rem(salt + i, 2)).astype(jnp.int8)
            q = qop * s
            if tier == "codes":
                mins, echo = fp.fused_codes_mins(
                    q, eng.cwbd, codes_dev, jnp.int32(N), u=uq,
                    int16=True)
            else:
                mins, echo = fp.fused_stream_mins(
                    q, eng.cwbd, eng.row_data, eng.vals, eng.meta,
                    jnp.int32(N), eng.tiles.e_max, M, u=uq,
                    int16=True)
            return acc + jnp.sum(mins[0]) + jnp.float32(
                jnp.sum(echo[0]))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    iters = (2, 10)
    for it in iters:
        np.asarray(t_fn(qop, jnp.int32(0), it))
    res = {}
    for it in iters:
        ts = []
        for k in range(3):
            t0 = time.perf_counter()
            np.asarray(t_fn(qop, jnp.int32(k + it), it))
            ts.append(time.perf_counter() - t0)
        res[it] = min(ts)
    per = (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])
    iso = os.environ.get("DELTAPQ_STAGEISO", "(full)") or "(full)"
    print(f"workload={name} tier={tier} STAGEISO={iso}: "
          f"{per*1000:.2f} ms/batch",
          flush=True)


if __name__ == "__main__":
    main()
