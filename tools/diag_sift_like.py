"""Stage isolation for the dup~1.06 (sift_like) dense-tier slowdown:
time the stream kernel alone, then the epilogue, on the same tiles.
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
                                       _mins_query_args, _pad_queries,
                                       _default_n_sub, _pool_for,
                                       fused_select_esc)
    from deltapq_tpu.ops.stream_tiles import window_groups

    name = sys.argv[1] if len(sys.argv) > 1 else "sift_like"
    N, M, K, B, top_k = 1_048_576, 8, 256, 512, 10
    cw, codes = make_clustered_codes(N, M, K, **WORKLOADS[name])
    order = np.lexsort(codes.T[::-1])
    eng = FusedCompressedEngine(cw, codes[order], row_to_db=order,
                                precision="int8")
    e_max = eng.tiles.e_max
    print(f"bpv={eng.bytes_per_vec():.2f} e_max={e_max} "
          f"W_A={window_groups(M, e_max)} "
          f"nT={eng.tiles.n_tiles}", flush=True)

    rng = np.random.default_rng(0)
    qb = rng.normal(size=(B, M * 16)).astype(np.float32)
    qp, _ = _pad_queries(qb, eng.d_pad)
    qc = qp - eng.mu[None, :]
    qk = fp.pack_query_grouped(qc[:, :eng.D], M, 16)
    qop, _, uq, eq = _mins_query_args(qk, "int8", eng.scale)

    def kernel_once(salt):
        mins, echo = fp.fused_stream_mins(
            qop * salt, eng.cwbd, eng.row_data, eng.vals, eng.meta,
            jnp.int32(N), e_max, M, u=uq)
        return mins, echo

    r = kernel_once(np.int8(1)); [np.asarray(x) for x in r]
    for s in (1, 1):
        t0 = time.perf_counter()
        r = kernel_once(np.int8(s))
        [np.asarray(x) for x in r]
        print(f"kernel: {(time.perf_counter()-t0)*1000:.2f} ms",
              flush=True)

    mins, echo = r
    table = adc_table(jnp.asarray(cw), jnp.asarray(qp[:, :eng.D]))
    s2 = jnp.float32(eng.scale ** 2)
    uqv = uq[0]
    q2 = s2 * uqv * uqv * jnp.sum(qop.astype(jnp.float32) ** 2, axis=0)
    err_r = eq + jnp.float32(eng.err_c)
    ns_total = mins.shape[0]
    pool = _pool_for(ns_total)
    n_units = -(-ns_total // pool)
    unit = fp.SUB * pool
    ns = min(_default_n_sub(top_k, n_units, unit),
             max(n_units - 1, 1))
    ns_cap = min(max(n_units - 1, 1), max(ns, 65536 // unit))
    rungs = tuple(dict.fromkeys([ns, min(ns * 8, ns_cap), ns_cap]))
    print(f"pool={pool} ns={ns} rungs={rungs}", flush=True)

    def epi(salt):
        return fused_select_esc(mins + salt, q2, table, echo,
                                jnp.int32(N), top_k, rungs, pool,
                                err_r=err_r, scale2=s2,
                                final_exact=True)

    r = epi(jnp.float32(0.0))
    [np.asarray(x) for x in r]
    ok1 = np.asarray(r[3])
    print(f"first-shot frac={ok1.mean():.3f}", flush=True)
    for s in (0.0, 0.0):
        t0 = time.perf_counter()
        r = epi(jnp.float32(s))
        [np.asarray(x) for x in r]
        print(f"epilogue: {(time.perf_counter()-t0)*1000:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
