"""Synthetic datasets for testing/benchmarks.

``chain_codes`` mirrors the reference's ``-synth`` generator
(``main.cpp:443-462``): a chain of PQ codes where each code differs from
its predecessor in exactly one subspace — the designed best case for
DeltaPQ compression (every tree edge has weight 1).
"""

from __future__ import annotations

import numpy as np


def chain_codes(n: int, M: int = 8, K: int = 256, seed: int = 0
                ) -> np.ndarray:
    rng = np.random.default_rng(seed)
    dtype = np.uint8 if K <= 256 else np.uint16
    codes = np.empty((n, M), dtype)
    codes[0] = rng.integers(0, K, M)
    ms = rng.integers(0, M, n - 1)
    # new value differs from old: draw from K-1 and shift
    deltas = rng.integers(1, K, n - 1)
    for i in range(1, n):
        codes[i] = codes[i - 1]
        m = ms[i - 1]
        codes[i, m] = (int(codes[i, m]) + int(deltas[i - 1])) % K
    return codes


def clustered_vectors(n: int, dim: int, n_clusters: int = 64,
                      spread: float = 1.0, scale: float = 4.0,
                      seed: int = 0) -> np.ndarray:
    """Gaussian mixture — gives PQ codes with heavy sharing (realistic
    for DeltaTree compression tests)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * scale
    assign = rng.integers(0, n_clusters, n)
    return (centers[assign] +
            rng.normal(size=(n, dim)).astype(np.float32) * spread)
