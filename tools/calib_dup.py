"""Calibrate synthetic workload recipes to target PQ-code duplication
factors (VERDICT r4 #1: the headline must be measured at dup <= 1.1,
the regime real SIFT1M codes live in).

For each recipe (rows/cluster, noise sigma) this prints the resulting
duplication factor and the lexsort-order stream-tile bytes/vec — the
two properties that pick the product engine tier and set the
compressed-tier cost.

Usage: python tools/calib_dup.py [n]
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def make(n, M, K, rows_per_cluster, sigma, seed=0, scale=4.0):
    import jax

    from deltapq_tpu.ops.encode import pq_encode
    from deltapq_tpu.ops.kmeans import pq_learn

    rng = np.random.default_rng(seed)
    D = 128
    n_clusters = max(n // rows_per_cluster, 1)
    centers = rng.normal(size=(n_clusters, D)).astype(np.float32) * scale
    assign = rng.integers(0, n_clusters, size=n)
    x = (centers[assign]
         + rng.normal(size=(n, D)).astype(np.float32) * sigma)
    cw = pq_learn(jax.random.PRNGKey(seed), x[:20000], M=M, K=K,
                  max_iters=40, n_init=1)
    codes = np.asarray(pq_encode(cw, x))
    return codes


def main():
    from deltapq_tpu.ops.stream_tiles import build_stream_tiles

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    M, K = 8, 256
    for rpc, sigma in [(256, 0.35), (16, 0.35), (16, 0.8), (8, 0.8),
                       (4, 0.8), (4, 1.2), (2, 1.2), (4, 2.0)]:
        codes = make(n, M, K, rpc, sigma)
        nu = len(np.unique(codes, axis=0))
        dup = n / nu
        order = np.lexsort(codes.T[::-1])
        bpv = build_stream_tiles(codes[order]).bytes_per_vec()
        print(f"rows/cluster={rpc:4d} sigma={sigma:.2f}: "
              f"dup={dup:6.2f}x distinct={nu} lexsort_bpv={bpv:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
