"""Diagnose delta-tile compression on the bigrun workload.

BIGRUN.json at N=100M reported bytes_per_vec = 8.0 (no size win) while
the tree itself found ~2 diffs/row.  This script reproduces the
workload at a smaller N and reports where the bytes go:

- tree diffs/row (the information content the reference format stores);
- sequential diffs/row (what the tile format stores) under several
  scan orders: tree DFS as built, DFS with code-sorted children,
  global lexsort;
- the tile packer's chosen S / Cap / overflow stats and bytes/vec per
  order, plus projected bytes/vec for per-tile S + unpadded Cap.

Usage: python tools/diag_compress.py [N] [n_parts]
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.bigrun import D, M, K, chunk_vectors, n_clusters_for  # noqa: E402


def seq_diff_stats(codes_scan, name):
    prev = np.empty_like(codes_scan)
    prev[0] = 0
    prev[1:] = codes_scan[:-1]
    nd = (codes_scan != prev).sum(axis=1)
    nd[0] = codes_scan.shape[1]
    hist = np.bincount(nd, minlength=M + 1)
    print(f"[{name}] seq diffs/row mean={nd.mean():.3f} "
          f"hist={hist.tolist()}", flush=True)
    return nd


def tile_report(codes_scan, name):
    from deltapq_tpu.ops.delta_tiles import TILE, build_delta_tiles

    dt = build_delta_tiles(codes_scan)
    nt = dt.n_tiles
    # overflow rows per tile distribution
    prev = np.empty_like(codes_scan)
    prev[0] = 0
    prev[1:] = codes_scan[:-1]
    n_pad = nt * TILE
    c = np.concatenate([codes_scan,
                        np.repeat(codes_scan[-1:],
                                  n_pad - len(codes_scan), axis=0)])
    prev = np.empty_like(c)
    prev[0] = 0
    prev[1:] = c[:-1]
    bits = c != prev
    first = (np.arange(n_pad) % TILE) == 0
    bits[first] = True
    nd = bits.sum(axis=1)

    # projected: per-tile best S, overflow unpadded (+first row)
    nd_t = nd.reshape(nt, TILE)
    total_v2 = 0
    s_hist = np.zeros(M + 1, np.int64)
    for t in range(nt):
        best = None
        for s in range(1, M):
            n_ovf = int((nd_t[t] > s).sum()) + (0 if nd_t[t][0] > s else 1)
            b = TILE * (1 + s) + n_ovf * M
            if best is None or b < best[0]:
                best = (b, s)
        total_v2 += best[0]
        s_hist[best[1]] += 1
    print(f"[{name}] tiles: S={dt.S} Cap={dt.Cap} "
          f"bytes/vec={dt.bytes_per_vec():.3f} | per-tile-S projected "
          f"bytes/vec={total_v2/len(codes_scan):.3f} "
          f"S-hist={s_hist.tolist()}", flush=True)


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax

    from deltapq_tpu.bigscale import encode_stream
    from deltapq_tpu.ops.kmeans import pq_learn
    from deltapq_tpu.tree.build import find_edges_by_diff
    from deltapq_tpu.tree.layout import build_layout

    rng = np.random.default_rng(7)
    n_cl = n_clusters_for(n_total)
    centers = rng.normal(size=(n_cl, D)).astype(np.float32) * 40.0
    n_chunks = -(-n_total // 1_000_000)

    def chunks():
        left = n_total
        for c in range(n_chunks):
            n = min(1_000_000, left)
            left -= n
            yield chunk_vectors(c, n, centers)

    t0 = time.time()
    cw = pq_learn(jax.random.PRNGKey(0),
                  chunk_vectors(0, min(100_000, n_total), centers),
                  M=M, K=K, max_iters=60)
    codes = encode_stream(cw, chunks())
    print(f"learn+encode {time.time()-t0:.1f}s N={len(codes)} "
          f"n_clusters={n_cl}", flush=True)

    order = np.lexsort(codes.T[::-1]).astype(np.int64)
    lex = codes[order]
    seq_diff_stats(lex, "lexsort")
    tile_report(lex, "lexsort")

    bounds = np.linspace(0, n_total, n_parts + 1).astype(np.int64)
    scan_default = []
    scan_codesort = []
    tree_diffs = 0
    t0 = time.time()
    for p in range(n_parts):
        part = np.ascontiguousarray(lex[bounds[p]:bounds[p + 1]])
        res = find_edges_by_diff(part, K=K, method=1)
        tree_diffs += res.n_diffs
        tree = build_layout(part, res.edges, res.root_id, K=K,
                            tables="skip")
        scan_default.append(part[tree.vec_id.astype(np.int64)])
        # code-sorted children variant
        tree2 = build_layout(part, res.edges, res.root_id, K=K,
                             tables="skip", child_order="code")
        scan_codesort.append(part[tree2.vec_id.astype(np.int64)])
    print(f"tree build {time.time()-t0:.1f}s "
          f"tree diffs/row={tree_diffs/n_total:.3f}", flush=True)

    dfs = np.concatenate(scan_default)
    seq_diff_stats(dfs, "tree-DFS(natural)")
    tile_report(dfs, "tree-DFS(natural)")

    dfs2 = np.concatenate(scan_codesort)
    seq_diff_stats(dfs2, "tree-DFS(code-sorted-children)")
    tile_report(dfs2, "tree-DFS(code-sorted-children)")


if __name__ == "__main__":
    main()
