"""Big-N (10^8+) single-chip pipeline: chunked encode, partitioned
tree build, compressed-tier query.

The reference reaches N~1.5B only by streaming 4KB blocks from disk
through a sequential scanner (``deltapq_create_approx_tree.h:
2805-2984``, ``N < INT_MAX`` cap at ``:982``).  The TPU-native big-N
story instead bounds *host* memory by chunked generation/encoding and
bounds *device* memory by the compressed tile representation
(~3 B/vec resident + bounded per-batch scratch):

* ``encode_stream``      — encode a vector stream chunk-by-chunk on
  the chip; only codes (M B/vec) accumulate on the host.
* ``build_partitioned``  — lexicographic global sort, split into P
  contiguous partitions, build an independent DeltaTree per partition
  (a process pool covers all cores; partitions are the unit of
  restartability), concatenate the per-partition DFS orders.  Delta
  tiles are TILE-self-contained, so partition boundaries cost nothing.
* ``BigCompressedIndex`` — the fused compressed engine over the
  concatenated order, with database-id mapping.

Device budget at N=1e8, B=128: tiles ~0.3 GB + decoded-codes echo
0.8 GB + subtile mins 1.6 GB — comfortably inside one chip's HBM, with
host RAM holding only codes + permutation (~1.6 GB).
"""

from __future__ import annotations

import time
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np


def encode_stream(codewords: np.ndarray,
                  chunks: Iterable[np.ndarray]) -> np.ndarray:
    """Encode a stream of vector chunks; returns codes [N, M] u8/u16.
    Host memory holds only the accumulated codes (M bytes/vec), never
    the full vector set (the reference's streaming encode loop,
    ``main.cpp:369-389``)."""
    from .ops import pq_encode

    out: List[np.ndarray] = []
    for x in chunks:
        out.append(pq_encode(codewords, x, batch_size=262144))
    return np.concatenate(out, axis=0)


def _build_one_partition(args):
    """Worker: edges + DFS layout for one contiguous code partition.
    Returns the DFS permutation *local to the partition* plus stats."""
    codes_part, K, method = args
    from .tree.build import find_edges_by_diff
    from .tree.layout import build_layout

    t0 = time.time()
    res = find_edges_by_diff(codes_part, K=K, method=method)
    t1 = time.time()
    tree = build_layout(codes_part, res.edges, res.root_id, K=K,
                        tables="skip")
    t2 = time.time()
    return (tree.vec_id.astype(np.int64), res.n_diffs,
            t1 - t0, t2 - t1)


@dataclass
class BigBuildStats:
    n: int
    n_parts: int
    n_diffs: int
    t_sort: float
    t_build: float
    per_part: List[Tuple[float, float]] = field(default_factory=list)


def build_partitioned(codes: np.ndarray, n_parts: int = 16,
                      K: int = 256, method: int = 1, workers: int = 2
                      ) -> Tuple[np.ndarray, BigBuildStats]:
    """Global lex sort + per-partition DeltaTree DFS orders.

    Returns (row_to_db [N] i64: scan row -> database id, stats).  The
    scan order is the concatenation of each partition's DFS order; use
    ``codes[row_to_db]`` as the tile packer's input.
    """
    n, M = codes.shape
    t0 = time.time()
    order = np.lexsort(codes.T[::-1]).astype(np.int64)
    t_sort = time.time() - t0
    bounds = np.linspace(0, n, n_parts + 1).astype(np.int64)

    t0 = time.time()
    jobs = []
    for p in range(n_parts):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        jobs.append((np.ascontiguousarray(codes[order[lo:hi]]), K,
                     method))
    results = []
    if workers > 1 and n_parts > 1:
        # spawn (not fork): the parent's JAX runtime is multithreaded
        # and fork risks deadlock in the children
        import multiprocessing as mp

        with ProcessPoolExecutor(
                max_workers=workers,
                mp_context=mp.get_context("spawn")) as ex:
            results = list(ex.map(_build_one_partition, jobs))
    else:
        results = [_build_one_partition(j) for j in jobs]
    t_build = time.time() - t0

    row_to_db = np.empty(n, np.int64)
    n_diffs = 0
    per_part = []
    for p, (vec_id_local, nd, te, tl) in enumerate(results):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        row_to_db[lo:hi] = order[lo:hi][vec_id_local]
        n_diffs += nd
        per_part.append((te, tl))
    stats = BigBuildStats(n=n, n_parts=n_parts, n_diffs=n_diffs,
                          t_sort=t_sort, t_build=t_build,
                          per_part=per_part)
    return row_to_db, stats


class BigCompressedIndex:
    """Compressed-tier index over a partition-concatenated scan order.

    Thin composition: ``build_partitioned`` + ``FusedCompressedEngine``
    (delta tiles resident on device, decode fused into the scan).
    """

    def __init__(self, codewords: np.ndarray, codes: np.ndarray,
                 n_parts: int = 16, method: int = 1, workers: int = 2,
                 batch_b: int = 128):
        from .ops.fused import FusedCompressedEngine

        K = codewords.shape[1]
        self.row_to_db, self.build_stats = build_partitioned(
            np.asarray(codes), n_parts=n_parts, K=K, method=method,
            workers=workers)
        codes_scan = np.asarray(codes)[self.row_to_db]
        self.engine = FusedCompressedEngine(
            codewords, codes_scan, row_to_db=self.row_to_db)
        self.batch_b = batch_b

    def bytes_per_vec(self) -> float:
        return self.engine.bytes_per_vec()

    def query(self, queries: np.ndarray, top_k: int = 10):
        return self.engine.query(queries, top_k=top_k)
