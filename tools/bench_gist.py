"""GIST1M-config benchmark (BASELINE milestone 3): M=16, K=256,
D=960, top-100, 1000 queries, over the fused tiers.

Synthetic clustered codes at the GIST shape (the real dataset is not
vendored; corpus-texmex.irisa.fr, reference README.md:23).  Reports
ms/batch + QPS per tier and verifies distances against the exact XLA
scan on a verification batch.

Usage: python tools/bench_gist.py [N] [B] [tier ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

def make_gist_workload(n, M=16, K=256, Ds=60, n_clusters=4096, seed=0):
    """Clustered 960-d vectors -> PQ learn -> encode: the real
    pipeline at the GIST shape (same methodology as
    bench.make_clustered_codes).  Codes come back in DATABASE order;
    the caller builds the DeltaTree for the scan order."""
    import jax

    from deltapq_tpu.ops.encode import pq_encode
    from deltapq_tpu.ops.kmeans import pq_learn

    rng = np.random.default_rng(seed)
    D = M * Ds
    centers = rng.normal(size=(n_clusters, D)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    x = (centers[assign]
         + rng.normal(size=(n, D)).astype(np.float32) * 0.35)
    cw = pq_learn(jax.random.PRNGKey(seed), x[:20000], M=M, K=K,
                  max_iters=40, n_init=1)
    codes = np.asarray(pq_encode(cw, x))
    return np.asarray(cw), codes, x


def measure(fn, iters=(2, 10), repeats=3):
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
    from deltapq_tpu.ops.adc import adc_query_topk, adc_table, pad_codes
    from deltapq_tpu.ops.fused import (FusedCodesEngine,
                                       FusedCompressedEngine,
                                       FusedDecodedEngine,
                                       _default_n_sub, _pool_for)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    tiers = sys.argv[3:] or ["decoded", "codes", "stream", "delta8"]
    M, K, Ds, top_k = 16, 256, 60, 100
    D = M * Ds

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    cw, codes, x = make_gist_workload(N, M, K, Ds)
    print(f"workload built in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    queries = (x[rng.integers(0, N, size=B)]
               + rng.normal(size=(B, D)).astype(np.float32) * 0.1)
    del x

    # M=16 DeltaTree build (VERDICT r4 #4): method 1 with combination
    # subsampling (find_edge.cpp:1199-1202 semantics) makes the tree
    # build practical at M=16; the bench scans in TREE-DFS order — the
    # namesake data structure, not the lexsort shortcut
    from deltapq_tpu.ops.stream_tiles import build_stream_tiles
    from deltapq_tpu.tree.build import find_edges_by_diff
    from deltapq_tpu.tree.layout import build_layout

    t0 = time.perf_counter()
    res = find_edges_by_diff(codes, K=K, method=1)
    tree = build_layout(codes, res.edges, res.root_id, K=K,
                        tables="skip")
    t_tree = time.perf_counter() - t0
    order = tree.vec_id.astype(np.int64)
    bpv_dfs = build_stream_tiles(codes[order]).bytes_per_vec()
    bpv_lex = build_stream_tiles(
        codes[np.lexsort(codes.T[::-1])]).bytes_per_vec()
    codes = codes[order]
    print(f"M=16 tree build {t_tree:.1f}s ({res.n_diffs} diffs); "
          f"stream B/vec: tree-DFS {bpv_dfs:.3f} vs lexsort "
          f"{bpv_lex:.3f} (plain {M})", file=sys.stderr)

    print(f"backend={jax.default_backend()} N={N} B={B} M={M} K={K} "
          f"D={D} top_k={top_k}", file=sys.stderr)

    table = adc_table(jnp.asarray(cw), jnp.asarray(queries))
    cp = pad_codes(codes, 16384)
    d_ref, i_ref = adc_query_topk(table, jnp.asarray(cp),
                                  jnp.int32(N), top_k)
    d_ref = np.asarray(d_ref)

    def verify(eng, name):
        d, i = eng.query(queries, top_k=top_k)
        dok = np.allclose(d, d_ref, rtol=1e-5, atol=1e-3)
        i = np.asarray(i)
        iok = float(np.mean(i == np.asarray(i_ref)))
        audit = ""
        if iok < 1.0:
            # f64 tie audit (VERDICT r4 weak #5): every id disagreement
            # must be an fp tie — each id in the per-query symmetric
            # difference must sit within 1e-9 (rel) of the k-th f64
            # distance, else it is a REAL divergence
            tab64 = np.asarray(table).astype(np.float64)
            ci = codes.astype(np.int64)
            real_div = 0
            n_flip = 0
            iref = np.asarray(i_ref)
            for q in range(len(i)):
                ours, ref = set(i[q].tolist()), set(iref[q].tolist())
                sym = (ours - ref) | (ref - ours)
                if not sym:
                    continue
                d64 = tab64[q, np.arange(M)[None, :],
                            ci[sorted(sym)]].sum(axis=1)
                dk = tab64[q, np.arange(M)[None, :],
                           ci[iref[q]]].sum(axis=1).max()
                n_flip += len(sym)
                real_div += int(np.sum(
                    np.abs(d64 - dk) > 1e-9 * max(dk, 1e-12)))
            audit = (f" tie_audit: {n_flip} flips, "
                     f"{real_div} real divergences")
        print(f"  {name}: dists_match={dok} id_agree={iok:.4f} "
              f"first_shot_cert={eng.last_exact_frac:.3f}{audit}",
              file=sys.stderr)

    ns_total = -(-N // fp.SUB)
    pool = _pool_for(ns_total)
    ns = _default_n_sub(top_k, -(-ns_total // pool), fp.SUB * pool)
    results = {}

    def bench_engine(eng, name, mins_fn):
        verify(eng, name)
        qc0 = np.zeros((-(-B // 128) * 128, D), np.float32)
        qc0[:B] = queries
        qc0 = qc0 - eng.mu[None, :D]
        qk0 = fp.pack_query_grouped(qc0, M, Ds)
        Bp = qk0.shape[0]

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(qk, qf, salt, iters):
            def body(i, acc):
                q = qf * (1.0 + (salt + i.astype(jnp.float32)) * 1e-3)
                tab = adc_table(jnp.asarray(cw), q)
                q2 = jnp.sum(q * q, axis=1)
                qkk = qk * (1.0 + (salt + i.astype(jnp.float32))
                            * 1e-3)
                mins, echo = mins_fn(qkk)
                d, r, ok = fp.select_rerank(
                    mins.T, q2, tab, echo, jnp.int32(N), top_k, ns,
                    pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        qf = jnp.asarray(np.concatenate(
            [queries, np.zeros((Bp - B, D), np.float32)]))
        t = measure(lambda s, it: loop(
            jnp.asarray(qk0.astype(np.float32)), qf,
            jnp.float32(s), it))
        results[name] = (t, eng)

    if "decoded" in tiers:
        eng = FusedDecodedEngine(cw, codes)
        verify(eng, "decoded")

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop_dec(qf, salt, iters):
            def body(i, acc):
                q = qf * (1.0 + (salt + i.astype(jnp.float32)) * 1e-3)
                tab = adc_table(jnp.asarray(cw), q[:, :D])
                qc = q - jnp.asarray(eng.mu)[None, :]
                q2 = jnp.sum(qc * qc, axis=1)
                mins = fp.fused_decoded_mins(
                    qc.astype(jnp.bfloat16).T, eng.xt, jnp.int32(N))
                d, r, ok = fp.select_rerank(
                    mins.T, q2, tab, eng.codes, jnp.int32(N), top_k,
                    ns, pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        Bp = -(-B // 128) * 128
        qp = np.zeros((Bp, eng.d_pad), np.float32)
        qp[:B, :D] = queries
        qpj = jnp.asarray(qp)
        t = measure(lambda s, it: loop_dec(qpj, jnp.float32(s), it))
        results["decoded"] = (t, eng)

    if "codes" in tiers:
        eng = FusedCodesEngine(cw, codes)
        bench_engine(eng, "codes", lambda qk: fp.fused_codes_mins(
            qk.astype(jnp.bfloat16).T, eng.cwbd, eng.codes,
            jnp.int32(N)))

    if "delta" in tiers:
        eng = FusedCompressedEngine(cw, codes, fmt="slots")
        print(f"  delta tiles: S={eng.tiles.S} Cap={eng.tiles.Cap} "
              f"planes={eng.tiles.n_planes} "
              f"bytes/vec={eng.bytes_per_vec():.3f}", file=sys.stderr)
        bench_engine(eng, "delta", lambda qk: fp.fused_delta_mins(
            qk.astype(jnp.bfloat16).T, eng.cwbd, eng.row_data,
            eng.ovf, jnp.int32(N), eng.tiles.S))

    if "stream" in tiers:
        # the headline compressed format at the GIST shape (M=16 -> 2
        # mask planes), VERDICT r3 missing #4: an on-chip M=16
        # compressed-tier number
        eng = FusedCompressedEngine(cw, codes)
        print(f"  stream tiles: planes={eng.tiles.n_planes} "
              f"e_max={eng.tiles.e_max} "
              f"bytes/vec={eng.bytes_per_vec():.3f}", file=sys.stderr)
        bench_engine(eng, "stream",
                     lambda qk: fp.fused_stream_mins(
                         qk.astype(jnp.bfloat16).T, eng.cwbd,
                         eng.row_data, eng.vals, eng.meta,
                         jnp.int32(N), eng.tiles.e_max, M))

    if "delta8" in tiers:
        eng = FusedCompressedEngine(cw, codes, precision="int8")
        verify(eng, "delta8")

    Bp = -(-B // 128) * 128
    for name, (t, eng) in results.items():
        print(f"{name}: {t*1000:.3f} ms/batch  {Bp/t:,.0f} QPS")


if __name__ == "__main__":
    main()
