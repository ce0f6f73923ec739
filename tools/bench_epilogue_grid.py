"""In-graph cost grid for the dense-tier pipeline on a workload:
kernel-only, then kernel+epilogue for a (pool, ns, n_rungs) grid —
all measured with the bench's salted fori_loop difference-quotient
(host-transfer-free), plus the first-shot pass rate per config.

Usage: python tools/bench_epilogue_grid.py [workload] [B]
"""

import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from bench import WORKLOADS, make_clustered_codes
    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.adc import adc_table
    from deltapq_tpu.ops.fused import (FusedCompressedEngine,
                                       fused_select_esc)

    name = sys.argv[1] if len(sys.argv) > 1 else "sift_like"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    N, M, K, top_k = 1_048_576, 8, 256, 10
    D = M * 16
    cw, codes = make_clustered_codes(N, M, K, **WORKLOADS[name])
    order = np.lexsort(codes.T[::-1])
    eng = FusedCompressedEngine(cw, codes[order], row_to_db=order,
                                precision="int16")
    rng = np.random.default_rng(0)
    qb = rng.normal(size=(B, D)).astype(np.float32)
    qj = jnp.asarray(qb)
    cwj = jnp.asarray(cw)
    mu = jnp.asarray(eng.mu)
    scale = eng.scale
    s_eff = scale / 128.0
    s2 = jnp.float32(s_eff * s_eff)
    err_c = jnp.float32(eng.err_c)
    e_max = eng.tiles.e_max

    def prep(q):
        qc = q - mu[None, :]
        uq = jnp.maximum(
            1.0, jnp.max(jnp.abs(qc), axis=1) / (127.0 * scale))
        Aq = jnp.clip(jnp.round(qc * (128.0 / scale) / uq[:, None]),
                      -16256, 16256)
        qa = jnp.clip(jnp.round(Aq / 128.0), -127, 127)
        qd = Aq - 128.0 * qa
        qop = jnp.concatenate([qa, qd], axis=1).astype(jnp.int8).T
        q2 = s2 * uq * uq * jnp.sum(Aq * Aq, axis=1)
        e_q = jnp.sqrt(jnp.sum(
            (qc - (jnp.float32(s_eff) * uq[:, None]) * Aq) ** 2,
            axis=1))
        return qop, uq, q2, e_q

    @functools.partial(jax.jit, static_argnames=("iters",))
    def bench_kernel(qb, salt, iters):
        def body(i, carry):
            acc = carry
            q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
            qop, uq, q2, e_q = prep(q)
            mins, echo = fp.fused_stream_mins(
                qop, eng.cwbd, eng.row_data, eng.vals, eng.meta,
                jnp.int32(N), e_max, M, u=uq[None, :], int16=True)
            return acc + jnp.sum(mins[0]) + jnp.sum(echo[0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def timeit(fn, iters=(2, 10), repeats=3):
        for it in iters:
            np.asarray(fn(qj, np.float32(0), it))
        res = {}
        for it in iters:
            ts = []
            for k in range(repeats):
                t = time.perf_counter()
                np.asarray(fn(qj, np.float32(k + 7 * it + 1), it))
                ts.append(time.perf_counter() - t)
            res[it] = min(ts)
        return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])

    t_k = timeit(lambda q, s, it: bench_kernel(q, jnp.float32(s), it))
    print(f"kernel-only: {t_k*1000:.2f} ms/batch", flush=True)

    pools = tuple(int(x) for x in os.environ.get(
        "GRID_POOLS", "1,2,4").split(","))
    rung_sets = tuple(
        tuple(int(r) for r in s.split(":")) for s in os.environ.get(
            "GRID_RUNGS",
            "1024:8192,2048:16384,4096:32768,8192").split(","))
    for pool in pools:
        for rungs_rows in rung_sets:
            unit = fp.SUB * pool
            rungs = tuple(dict.fromkeys(
                max(2, r // unit) for r in rungs_rows))

            @functools.partial(jax.jit,
                               static_argnames=("iters", "rungs",
                                                "pool"))
            def bench_full(qb, salt, iters, rungs=rungs, pool=pool):
                def body(i, carry):
                    acc, nok, nok1 = carry
                    q = qb * (1.0
                              + (salt + i.astype(jnp.float32)) * 0.01)
                    tab = adc_table(cwj, q[:, :D])
                    qop, uq, q2, e_q = prep(q)
                    mins, echo = fp.fused_stream_mins(
                        qop, eng.cwbd, eng.row_data, eng.vals,
                        eng.meta, jnp.int32(N), e_max, M,
                        u=uq[None, :], int16=True)
                    d, r, ok, ok1 = fused_select_esc(
                        mins, q2, tab, echo, jnp.int32(N), top_k,
                        rungs, pool, err_r=e_q + err_c + 1e-4,
                        scale2=s2, final_exact=True)
                    return (acc + jnp.sum(d)
                            + jnp.sum(r).astype(jnp.float32),
                            nok + jnp.sum(ok.astype(jnp.int32)),
                            nok1 + jnp.sum(ok1.astype(jnp.int32)))
                return jax.lax.fori_loop(
                    0, iters, body,
                    (jnp.float32(0), jnp.int32(0), jnp.int32(0)))

            t = timeit(lambda q, s, it: bench_full(
                q, jnp.float32(s), it))
            r = bench_full(qj, jnp.float32(99.0), 2)
            frac1 = int(np.asarray(r[2])) / (2 * B)
            frac = int(np.asarray(r[1])) / (2 * B)
            print(f"pool={pool} rungs_rows={rungs_rows}: "
                  f"{t*1000:.2f} ms/batch = {B/t:.0f} QPS "
                  f"(first-shot {frac1:.3f}, certified {frac:.3f})",
                  flush=True)


if __name__ == "__main__":
    main()
