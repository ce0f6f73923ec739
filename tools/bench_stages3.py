"""Stage split of the stream-int8 compressed tier at B=512 / N=1M:
table build, stream-mins kernel, codes-mins kernel (MXU floor),
decoded-mins kernel (HBM floor), select_rerank epilogue, and the full
pipeline.  Salted fori_loop difference-quotient timing (relay caching).

Usage: python tools/bench_stages3.py [N] [B]
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

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.adc import adc_table
    from deltapq_tpu.ops.fused import (FusedCompressedEngine,
                                       FusedCodesEngine,
                                       FusedDecodedEngine,
                                       _default_n_sub, _pool_for)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from bench_fused import make_clustered_codes

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    M, K, Ds, top_k = 8, 256, 16, 10
    D = M * Ds
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)
    order = np.lexsort(codes.T[::-1])
    codes = codes[order]
    queries = rng.normal(size=(B, D)).astype(np.float32)

    eng = FusedCompressedEngine(cw, codes, precision="int8")
    ceng = FusedCodesEngine(cw, codes, precision="int8")
    deng = FusedDecodedEngine(cw, codes)
    print(f"stream tiles: {eng.bytes_per_vec():.2f} B/vec, "
          f"e_max={eng.tiles.e_max}, "
          f"W_A={__import__('deltapq_tpu.ops.stream_tiles', fromlist=['window_groups']).window_groups(M, eng.tiles.e_max)}",
          file=sys.stderr)

    ns_total = eng.row_data.shape[0] * fp.TILE // fp.SUB
    pool = _pool_for(ns_total)
    ns = _default_n_sub(top_k, -(-ns_total // pool), fp.SUB * pool)

    cwj = jnp.asarray(cw)
    qp = jnp.asarray(queries)
    table = adc_table(cwj, qp)
    mu = jnp.asarray(eng.mu)
    inv_s = jnp.float32(1.0 / eng.scale)
    qc = qp - mu[None, :]
    q2 = jnp.sum(qc * qc, axis=1)
    qq8 = jnp.clip(jnp.round(qc * inv_s), -127, 127).astype(jnp.int8).T
    qbf = qc.astype(jnp.bfloat16).T

    r = {}

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_table(qp, salt, iters):
        def body(i, acc):
            q = qp * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
            tab = adc_table(cwj, q)
            return acc + jnp.sum(tab[:, 0, 0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def rec(name, val):
        r[name] = val
        print(f"  {name:20s} {val*1000:8.3f} ms/batch   "
              f"({B/val:10.0f} QPS)", flush=True)

    rec("adc_table", measure(
        lambda s, it: t_table(qp, jnp.float32(s), it)))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_stream(q8, salt, iters):
        def body(i, acc):
            q = (q8 + ((salt + i.astype(jnp.float32)) % 3 - 1)
                 .astype(jnp.int8))
            mins, echo = fp.fused_stream_mins(
                q, eng.cwbd, eng.row_data, eng.vals, eng.meta,
                jnp.int32(N), eng.tiles.e_max, M)
            return acc + jnp.sum(mins[:8]) + jnp.sum(
                echo[:8].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rec("stream_mins_i8", measure(
        lambda s, it: t_stream(qq8, jnp.float32(s), it)))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_codes(q8, salt, iters):
        def body(i, acc):
            q = (q8 + ((salt + i.astype(jnp.float32)) % 3 - 1)
                 .astype(jnp.int8))
            mins, echo = fp.fused_codes_mins(
                q, ceng.cwbd, ceng.codes, jnp.int32(N))
            return acc + jnp.sum(mins[:8]) + jnp.sum(
                echo[:8].astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rec("codes_mins_i8", measure(
        lambda s, it: t_codes(qq8, jnp.float32(s), it)))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_dec(qb, xt, salt, iters):
        def body(i, acc):
            q = qb * (1.0 + (salt + i.astype(jnp.bfloat16)) * 0.01)
            mins = fp.fused_decoded_mins(q, xt, jnp.int32(N))
            return acc + jnp.sum(mins[:8])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rec("decoded_mins_bf16", measure(
        lambda s, it: t_dec(qbf, deng.xt, jnp.float32(s), it)))

    mins0, echo0 = fp.fused_stream_mins(
        qq8, eng.cwbd, eng.row_data, eng.vals, eng.meta, jnp.int32(N),
        eng.tiles.e_max, M)
    mins0 = (mins0 * jnp.float32(eng.scale * eng.scale)).T

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_select(mins, q2, table, cdev, salt, iters):
        def body(i, acc):
            m2 = mins * (1.0 + (salt + i.astype(jnp.float32)) * 1e-4)
            d, rr, ok = fp.select_rerank(m2, q2, table, cdev,
                                         jnp.int32(N), top_k, ns, pool)
            return (acc + jnp.sum(d) +
                    jnp.sum(rr[:, :1]).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rec("select_rerank", measure(
        lambda s, it: t_select(mins0, q2, table, echo0,
                               jnp.float32(s), it)))

    s2 = jnp.float32(eng.scale * eng.scale)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_full(qb, salt, iters):
        def body(i, acc):
            q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
            tab = adc_table(cwj, q[:, :D])
            qcc = q - mu[None, :]
            q2_ = jnp.sum(qcc * qcc, axis=1)
            qq = jnp.clip(jnp.round(qcc * inv_s), -127, 127
                          ).astype(jnp.int8)
            mins, echo = fp.fused_stream_mins(
                qq.T, eng.cwbd, eng.row_data, eng.vals, eng.meta,
                jnp.int32(N), eng.tiles.e_max, M)
            mins = mins * s2
            d, rr, ok = fp.select_rerank(mins.T, q2_, tab, echo,
                                         jnp.int32(N), top_k, ns, pool)
            return (acc + jnp.sum(d)
                    + jnp.sum(rr[:, :1]).astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rec("full_pipeline", measure(
        lambda s, it: t_full(qp, jnp.float32(s), it)))

    print(f"N={N} B={B} ns={ns} pool={pool}")


if __name__ == "__main__":
    main()
