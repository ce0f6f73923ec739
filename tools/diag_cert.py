"""Certificate failure analysis on a workload: for each candidate
rung size ns, measure (a) certificate pass rate, (b) ACTUAL top-k
agreement vs the plain scan, (c) rung cost — separating 'genuine miss'
(more candidates needed) from 'certificate too conservative' (results
right, bound too tight).
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
    from deltapq_tpu.ops.adc import (adc_query_topk, adc_table,
                                     pad_codes)
    from deltapq_tpu.ops.fused import (FusedCompressedEngine,
                                       _mins_query_args, _pad_queries,
                                       _pool_for)

    name = sys.argv[1] if len(sys.argv) > 1 else "sift_like"
    N, M, K, B, top_k = 1_048_576, 8, 256, 512, 10
    cw, codes = make_clustered_codes(N, M, K, **WORKLOADS[name])
    order = np.lexsort(codes.T[::-1])
    eng = FusedCompressedEngine(cw, codes[order], row_to_db=order,
                                precision="int8")
    rng = np.random.default_rng(0)
    qb = rng.normal(size=(B, M * 16)).astype(np.float32)
    qp, _ = _pad_queries(qb, eng.d_pad)
    qc = qp - eng.mu[None, :]
    qk = fp.pack_query_grouped(qc[:, :eng.D], M, 16)
    qop, _, uq, eq = _mins_query_args(qk, "int8", eng.scale)

    mins, echo = fp.fused_stream_mins(
        qop, eng.cwbd, eng.row_data, eng.vals, eng.meta,
        jnp.int32(N), eng.tiles.e_max, M, u=uq)
    table = adc_table(jnp.asarray(cw), jnp.asarray(qp[:, :eng.D]))
    s2 = jnp.float32(eng.scale ** 2)
    uqv = uq[0]
    q2 = s2 * uqv * uqv * jnp.sum(qop.astype(jnp.float32) ** 2, axis=0)
    err_r = eq + jnp.float32(eng.err_c)

    # reference plain-scan top-k (scan-order row ids)
    d_ref, i_ref = adc_query_topk(
        table, jnp.asarray(pad_codes(codes[order], 16384)),
        jnp.int32(N), top_k)
    d_ref = np.asarray(d_ref)

    ns_total = mins.shape[0]
    pool = _pool_for(ns_total)
    mins_bn = fp.pool_mins_nb(mins, pool) * s2
    print(f"pool={pool} err_c={eng.err_c:.4f} "
          f"mean_eq={float(np.asarray(eq).mean()):.4f} "
          f"scale={eng.scale:.5f} "
          f"mean_d10={d_ref[:, -1].mean():.2f}", flush=True)

    for ns in (8, 16, 32, 64, 128, 256, 512):
        t0 = time.perf_counter()
        d, rows, ok = fp.select_rerank(
            mins_bn, q2, table, echo, jnp.int32(N), top_k, ns, pool,
            prepooled=True, err_r=err_r)
        d = np.asarray(d); ok = np.asarray(ok)
        t_build = time.perf_counter() - t0
        # correctness: reranked distances equal the plain scan's?
        agree = np.isclose(d, d_ref, rtol=1e-5, atol=1e-3).all(axis=1)
        # timed rung cost (cached dispatch; rough)
        t0 = time.perf_counter()
        for _ in range(3):
            r = fp.select_rerank(
                mins_bn, q2, table, echo, jnp.int32(N), top_k, ns,
                pool, prepooled=True, err_r=err_r)
            np.asarray(r[0])
        t_rung = (time.perf_counter() - t0) / 3
        print(f"ns={ns:4d} ({ns*fp.SUB*pool:6d} rows): cert_pass="
              f"{ok.mean():.3f} actual_agree={agree.mean():.3f} "
              f"conservative={float((agree & ~ok).mean()):.3f} "
              f"rung~{t_rung*1000:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
