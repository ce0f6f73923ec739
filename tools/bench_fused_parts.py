"""Component timing for the fused engines: mins kernels alone vs the
select+rerank epilogue, at SIFT1M scale."""

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

    from bench_fused import make_clustered_codes
    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.adc import adc_table
    from deltapq_tpu.ops.fused import (FusedCompressedEngine,
                                       FusedDecodedEngine,
                                       _default_n_sub, _pool_for)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    M, K, Ds, top_k = 8, 256, 16, 10
    D = M * Ds
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    ns_total = -(-N // fp.SUB)
    pool = _pool_for(ns_total)
    ns = _default_n_sub(top_k, -(-ns_total // pool), fp.SUB * pool)

    deng = FusedDecodedEngine(cw, codes)
    ceng = FusedCompressedEngine(cw, codes)
    qp = jnp.asarray(queries)
    qb = qp.astype(jnp.bfloat16).T
    table = adc_table(jnp.asarray(cw), qp)
    q2 = jnp.sum(qp * qp, axis=1)
    mins0 = fp.fused_decoded_mins(qb, deng.xt, jnp.int32(N)).T

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_dec_mins(qb, xt, salt, iters):
        def body(i, acc):
            q = qb + (salt + i.astype(jnp.bfloat16)) * 1e-6
            mins = fp.fused_decoded_mins(q, xt, jnp.int32(N))
            return acc + jnp.sum(mins[:8])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_select(mins, q2, table, cdev, salt, iters):
        def body(i, acc):
            m2 = mins + (salt + i.astype(jnp.float32)) * 1e-9
            d, r, ok = fp.select_rerank(m2, q2, table, cdev,
                                        jnp.int32(N), top_k, ns, pool)
            return acc + jnp.sum(d)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_delta_mins(qb, cwbd, rd, ovf, salt, iters):
        def body(i, acc):
            q = qb + (salt + i.astype(jnp.bfloat16)) * 1e-6
            mins, echo = fp.fused_delta_mins(q, cwbd, rd, ovf,
                                             jnp.int32(N),
                                             ceng.tiles.S)
            return acc + jnp.sum(mins[:8])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_table(qp, salt, iters):
        def body(i, acc):
            q = qp + (salt + i.astype(jnp.float32)) * 1e-6
            tab = adc_table(jnp.asarray(cw), q)
            return acc + jnp.sum(tab[0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = {}
    r["decoded_mins"] = measure(lambda s, it: t_dec_mins(
        qb, deng.xt, jnp.bfloat16(s), it))
    r["select_rerank"] = measure(lambda s, it: t_select(
        mins0, q2, table, deng.codes, jnp.float32(s), it))
    r["delta_mins"] = measure(lambda s, it: t_delta_mins(
        qb, ceng.cwbd, ceng.row_data, ceng.ovf, jnp.float32(s), it))
    r["adc_table"] = measure(lambda s, it: t_table(
        qp, jnp.float32(s), it))
    for k, v in r.items():
        print(f"{k}: {v*1000:.3f} ms")


if __name__ == "__main__":
    main()
