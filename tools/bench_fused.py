"""Benchmark the fused-scan engine tiers on the live chip at SIFT1M
scale: clustered synthetic codes (the DeltaPQ workload), M=8, K=256,
B=128 query batches, top-10.

Per tier: ms/batch (salted difference-quotient timing, same
methodology as bench.py), QPS, resident bytes/vec, first-shot
exactness certificate rate, and id/distance agreement vs the exact XLA
scan on a verification batch.

Usage: python tools/bench_fused.py [N] [B] [tier ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from bench import make_clustered_codes  # noqa: E402


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

    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.adc import adc_table
    from deltapq_tpu.ops.fused import (FusedCodesEngine,
                                       FusedCompressedEngine,
                                       FusedDecodedEngine,
                                       _default_n_sub, _pool_for)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    tiers = sys.argv[3:] or ["decoded", "codes", "delta"]
    M, K, Ds, top_k = 8, 256, 16, 10
    D = M * Ds

    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)
    queries = rng.normal(size=(B, D)).astype(np.float32)
    print(f"backend={jax.default_backend()} N={N} B={B} M={M} K={K}",
          file=sys.stderr)

    # exact reference on the verification batch
    from deltapq_tpu.ops.adc import adc_query_topk, pad_codes
    table = adc_table(jnp.asarray(cw), jnp.asarray(queries))
    cp = pad_codes(codes, 16384)
    d_ref, i_ref = adc_query_topk(table, jnp.asarray(cp),
                                  jnp.int32(N), top_k)
    d_ref = np.asarray(d_ref)

    q2_host = (queries * queries).sum(axis=1)

    def verify(eng, name):
        d, i = eng.query(queries, top_k=top_k)
        dok = np.allclose(d, d_ref, rtol=1e-5, atol=1e-3)
        iok = float(np.mean(np.asarray(i) == np.asarray(i_ref)))
        print(f"  {name}: dists_match={dok} id_agree={iok:.4f} "
              f"first_shot_cert={eng.last_exact_frac:.3f}",
              file=sys.stderr)

    results = {}
    ns_total = -(-N // fp.SUB)
    pool = _pool_for(ns_total)
    ns = _default_n_sub(top_k, -(-ns_total // pool), fp.SUB * pool)

    if "decoded" in tiers:
        eng = FusedDecodedEngine(cw, codes)
        verify(eng, "decoded")

        @functools.partial(jax.jit, static_argnames=("iters",))
        def bench_decoded(qb, xt, cdev, salt, iters):
            def body(i, acc):
                q = qb + (salt + i.astype(jnp.float32)) * 1e-6
                tab = adc_table(jnp.asarray(cw), q[:, :D])
                q2 = jnp.sum(q * q, axis=1)
                mins = fp.fused_decoded_mins(
                    q.astype(jnp.bfloat16).T, xt, jnp.int32(N))
                d, r, ok = fp.select_rerank(
                    mins.T, q2, tab, cdev, jnp.int32(N), top_k, ns, pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        qp = jnp.asarray(np.pad(queries,
                                ((0, 0), (0, eng.d_pad - D))))
        t = measure(lambda s, it: bench_decoded(
            qp, eng.xt, eng.codes, jnp.float32(s), it))
        results["decoded"] = (t, (eng.xt.nbytes + eng.codes.nbytes) / N)

    if "codes" in tiers:
        eng = FusedCodesEngine(cw, codes)
        verify(eng, "codes")

        @functools.partial(jax.jit, static_argnames=("iters",))
        def bench_codes(qb, cwbd, cdev, salt, iters):
            def body(i, acc):
                q = qb + (salt + i.astype(jnp.float32)) * 1e-6
                tab = adc_table(jnp.asarray(cw), q[:, :D])
                q2 = jnp.sum(q * q, axis=1)
                mins, echo = fp.fused_codes_mins(
                    q.astype(jnp.bfloat16).T, cwbd, cdev,
                    jnp.int32(N))
                d, r, ok = fp.select_rerank(
                    mins.T, q2, tab, echo, jnp.int32(N), top_k, ns, pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        qp = jnp.asarray(np.pad(queries,
                                ((0, 0), (0, eng.d_pad - D))))
        t = measure(lambda s, it: bench_codes(
            qp, eng.cwbd, eng.codes, jnp.float32(s), it))
        results["codes"] = (t, eng.codes.nbytes / N)

    if "delta8" in tiers:
        eng = FusedCompressedEngine(cw, codes, precision="int8")
        print(f"  delta8 tiles: S={eng.tiles.S} Cap={eng.tiles.Cap} "
              f"bytes/vec={eng.bytes_per_vec():.3f}", file=sys.stderr)
        verify(eng, "delta8")

        qq0 = np.clip(np.rint((np.pad(queries, ((0, 0),
                      (0, eng.d_pad - D))) - eng.mu[None, :])
                      / eng.scale), -127, 127).astype(np.int8)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def bench_delta8(qb, qq, cwbd, rd, ovf, salt, iters):
            def body(i, acc):
                q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
                tab = adc_table(jnp.asarray(cw), q[:, :D])
                q2 = jnp.sum(q * q, axis=1)
                mins, echo = fp.fused_delta_mins(
                    qq.T, cwbd, rd, ovf, jnp.int32(N), eng.tiles.S)
                mins = mins * jnp.float32(eng.scale * eng.scale)
                d, r, ok = fp.select_rerank(mins.T, q2, tab, echo,
                                            jnp.int32(N), top_k, ns,
                                            pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        qp = jnp.asarray(np.pad(queries,
                                ((0, 0), (0, eng.d_pad - D))))
        t = measure(lambda s_, it: bench_delta8(
            qp, jnp.asarray(qq0), eng.cwbd, eng.row_data, eng.ovf,
            jnp.float32(s_), it))
        results["delta8"] = (t, eng.bytes_per_vec())

    if "delta" in tiers:
        eng = FusedCompressedEngine(cw, codes)
        print(f"  delta tiles: S={eng.tiles.S} Cap={eng.tiles.Cap} "
              f"bytes/vec={eng.bytes_per_vec():.3f}", file=sys.stderr)
        verify(eng, "delta")

        @functools.partial(jax.jit, static_argnames=("iters",))
        def bench_delta(qb, cwbd, rd, ovf, salt, iters):
            def body(i, acc):
                q = qb + (salt + i.astype(jnp.float32)) * 1e-6
                tab = adc_table(jnp.asarray(cw), q[:, :D])
                q2 = jnp.sum(q * q, axis=1)
                mins, echo = fp.fused_delta_mins(
                    q.astype(jnp.bfloat16).T, cwbd, rd, ovf,
                    jnp.int32(N), eng.tiles.S)
                d, r, ok = fp.select_rerank(
                    mins.T, q2, tab, echo, jnp.int32(N), top_k, ns, pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        qp = jnp.asarray(np.pad(queries,
                                ((0, 0), (0, eng.d_pad - D))))
        t = measure(lambda s, it: bench_delta(
            qp, eng.cwbd, eng.row_data, eng.ovf, jnp.float32(s), it))
        results["delta"] = (t, eng.bytes_per_vec())

    for name, (t, bpv) in results.items():
        print(f"{name}: {t*1000:.3f} ms/batch  {B/t:,.0f} QPS  "
              f"{bpv:.2f} B/vec")


if __name__ == "__main__":
    main()
