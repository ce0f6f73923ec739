"""Validate the int16-certificate design: compute TRUE per-unit
minima (exact f32 distances), and for each rung size report the pass
rate of `d_k <= fence - margin` at the int8 margin (~72), the planned
int16 margin (~0.6), and zero margin — i.e., what certificate pass
rates a tighter kernel domain would buy.
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from bench import WORKLOADS, make_clustered_codes
    from deltapq_tpu.ops.adc import adc_table

    name = sys.argv[1] if len(sys.argv) > 1 else "sift_like"
    N, M, K, B, top_k = 1_048_576, 8, 256, 64, 10
    cw, codes = make_clustered_codes(N, M, K, **WORKLOADS[name])
    order = np.lexsort(codes.T[::-1])
    codes = codes[order]
    rng = np.random.default_rng(0)
    qb = rng.normal(size=(B, M * 16)).astype(np.float32)
    table = np.asarray(adc_table(jnp.asarray(cw), jnp.asarray(qb)))

    # full exact distances in chunks -> unit minima (unit = 128 rows)
    unit = 128
    nu_total = N // unit
    umins = np.zeros((B, nu_total), np.float32)
    d_sorted = np.zeros((B, 64), np.float32)
    tf = table.reshape(B, M * K)
    offs = np.arange(M) * K
    best = np.full((B, 0), np.inf, np.float32)
    chunk = 131072
    for lo in range(0, N, chunk):
        c = codes[lo:lo + chunk].astype(np.int64) + offs[None, :]
        d = tf[:, c].sum(axis=2)                      # [B, chunk]
        umins[:, lo // unit:(lo + chunk) // unit] = (
            d.reshape(B, -1, unit).min(axis=2))
        part = np.partition(d, 63, axis=1)[:, :64]
        best = np.sort(np.concatenate([best, part], axis=1),
                       axis=1)[:, :64]
    d_sorted = best
    d_k = d_sorted[:, top_k - 1]

    us = np.sort(umins, axis=1)
    for ns in (8, 16, 32, 64):
        fence = us[:, ns]              # true min of (ns+1)-th unit
        for margin, tag in ((72.0, "int8~72"), (0.6, "int16~0.6"),
                            (0.0, "exact   ")):
            ok = d_k <= fence - margin
            print(f"ns={ns:3d} margin={tag}: true-fence pass="
                  f"{ok.mean():.3f}", flush=True)
        # genuine coverage: are the top-k rows inside the ns best units?
        cov = (d_k <= fence).mean()
        print(f"ns={ns:3d} genuine coverage (d_k<=fence): {cov:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
