"""On-chip A/B: stream-tile kernel (v2) vs fixed-slot delta kernel (v1)
vs codes-tier kernel, at N=1M / B=512, bf16 and int8.

Also reports bytes/vec for both compressed formats on the bench
workload and verifies engine-level exactness of the stream path.
Timing: salted difference-quotient loops (see bench.py).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(fn, iters=(2, 12), repeats=3):
    for it in iters:
        float(fn(np.float32(0), it))
    res = {}
    for it in iters:
        ts = []
        for k in range(repeats):
            t = time.perf_counter()
            float(fn(np.float32(k + 7 * it + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clustered_codes
    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.fused import (FusedCodesEngine,
                                       FusedCompressedEngine)

    M, K, Ds = 8, 256, 16
    N, B = 1_048_576, 512
    D = M * Ds
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)

    for precision in ("bf16", "int8"):
        eng_s = FusedCompressedEngine(cw, codes, precision=precision,
                                      fmt="stream")
        eng_v1 = FusedCompressedEngine(cw, codes, precision=precision,
                                       fmt="slots")
        eng_c = FusedCodesEngine(cw, codes, precision=precision)
        if precision == "bf16":
            print(f"stream: {eng_s.bytes_per_vec():.3f} B/vec "
                  f"(e_max={eng_s.tiles.e_max}) | slots: "
                  f"{eng_v1.bytes_per_vec():.3f} B/vec "
                  f"(S={eng_v1.tiles.S} Cap={eng_v1.tiles.Cap})",
                  flush=True)

        q_np = rng.normal(size=(B, D)).astype(np.float32)
        qc = q_np - eng_s.mu[None, :]
        qk = fp.pack_query_grouped(qc[:, :D], M, Ds)
        if precision == "int8":
            qop = jnp.asarray(np.clip(
                np.rint(qk / eng_s.scale), -127, 127).astype(np.int8).T)
        else:
            qop = jnp.asarray(qk.astype(jnp.bfloat16).T)

        def salted(qop, salt, i):
            # integer-ish multiplicative salt that survives int8 casts
            if precision == "int8":
                q = (qop.astype(jnp.int32)
                     * (1 + jax.lax.rem(salt.astype(jnp.int32)
                                        + i, 2)))
                return jnp.clip(q, -127, 127).astype(jnp.int8)
            return (qop.astype(jnp.float32)
                    * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
                    ).astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def t_stream(qop, cwbd, rd, vals, meta, salt, iters):
            def body(i, acc):
                mins, echo = fp.fused_stream_mins(
                    salted(qop, salt, i), cwbd, rd, vals, meta,
                    jnp.int32(N), eng_s.tiles.e_max, M)
                return acc + jnp.sum(mins[:4])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        @functools.partial(jax.jit, static_argnames=("iters",))
        def t_slots(qop, cwbd, rd, ovf, salt, iters):
            def body(i, acc):
                mins, echo = fp.fused_delta_mins(
                    salted(qop, salt, i), cwbd, rd, ovf, jnp.int32(N),
                    eng_v1.tiles.S)
                return acc + jnp.sum(mins[:4])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        @functools.partial(jax.jit, static_argnames=("iters",))
        def t_codes(qop, cwbd, codes_d, salt, iters):
            def body(i, acc):
                mins, echo = fp.fused_codes_mins(
                    salted(qop, salt, i), cwbd, codes_d, jnp.int32(N))
                return acc + jnp.sum(mins[:4])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        ts = measure(lambda s, it: t_stream(
            qop, eng_s.cwbd, eng_s.row_data, eng_s.vals, eng_s.meta,
            jnp.float32(s), it))
        tv = measure(lambda s, it: t_slots(
            qop, eng_v1.cwbd, eng_v1.row_data, eng_v1.ovf,
            jnp.float32(s), it))
        tc = measure(lambda s, it: t_codes(
            qop, eng_c.cwbd, eng_c.codes, jnp.float32(s), it))
        print(f"[{precision}] mins kernels ms/batch(B={B}): "
              f"stream={ts*1000:.2f} slots={tv*1000:.2f} "
              f"codes={tc*1000:.2f} (stream/codes="
              f"{ts/tc:.2f}x)", flush=True)

    # engine-level exactness of the stream path (int8, full pipeline)
    eng = FusedCompressedEngine(cw, codes, precision="int8",
                                fmt="stream")
    from deltapq_tpu.ops.adc import adc_query_topk, adc_table, pad_codes
    qs = rng.normal(size=(128, D)).astype(np.float32)
    d, i = eng.query(qs, top_k=10)
    table = adc_table(jnp.asarray(cw), jnp.asarray(qs))
    d_ref, i_ref = adc_query_topk(table, jnp.asarray(
        pad_codes(codes, 16384)), jnp.int32(N), 10)
    print("engine dists exact:",
          bool(np.allclose(d, np.asarray(d_ref), rtol=1e-5, atol=1e-3)),
          flush=True)


if __name__ == "__main__":
    main()
