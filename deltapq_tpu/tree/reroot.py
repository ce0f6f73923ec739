"""Tree re-rooting utilities.

Behavioral equivalents of the reference's forest post-processing for
exact-MST builds: ``adjust_trees`` (pick the root minimizing tree height
in one BFS pass, ``pqbase.cpp:72-175``) and ``rotate_trees`` (iterative
height reduction, ``pqbase.cpp:177-286``).  A minimum-height root of a
tree is its center (middle of a diameter path), found with two BFS
sweeps; ``reroot_min_height`` computes it and re-orients the edge list.
The approximate DeltaTree path bounds height by construction
(MAX_HEIGHT) and never needs this.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _bfs_farthest(adj: List[List[int]], start: int
                  ) -> Tuple[int, np.ndarray]:
    n = len(adj)
    dist = np.full(n, -1, np.int64)
    dist[start] = 0
    frontier = [start]
    far = start
    while frontier:
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    nxt.append(w)
                    if dist[w] > dist[far]:
                        far = w
        frontier = nxt
    return far, dist


def reroot_min_height(edges: np.ndarray, n: int
                      ) -> Tuple[np.ndarray, int, int]:
    """Re-orient a tree's edges from its center.

    edges: [n-1, 2] (any orientation).  Returns (oriented edges
    (parent, child) from the new root, new_root, new_height).
    """
    adj: List[List[int]] = [[] for _ in range(n)]
    for a, b in np.asarray(edges, np.int64):
        adj[a].append(int(b))
        adj[b].append(int(a))
    # double BFS: endpoint of a diameter, then the diameter path
    u, _ = _bfs_farthest(adj, 0)
    v, dist_u = _bfs_farthest(adj, u)
    # walk back from v to u to find the middle of the path
    _, dist_v = _bfs_farthest(adj, v)
    diameter = dist_u[v]
    # center: node on the u-v path with max(dist_u, dist_v) minimized
    on_path = dist_u + dist_v == diameter
    ecc = np.maximum(dist_u, dist_v)
    ecc[~on_path] = np.iinfo(np.int64).max
    center = int(np.argmin(ecc))
    new_height = int(ecc[center])

    # orient edges away from center by BFS
    oriented = np.empty((max(n - 1, 0), 2), np.uint32)
    seen = np.zeros(n, bool)
    seen[center] = True
    frontier = [center]
    k = 0
    while frontier:
        nxt = []
        for p in frontier:
            for c in adj[p]:
                if not seen[c]:
                    seen[c] = True
                    oriented[k] = (p, c)
                    k += 1
                    nxt.append(c)
        frontier = nxt
    return oriented[:k], center, new_height


def tree_height(edges: np.ndarray, root: int, n: int) -> int:
    """Height of the tree when rooted at ``root``."""
    adj: List[List[int]] = [[] for _ in range(n)]
    for a, b in np.asarray(edges, np.int64):
        adj[a].append(int(b))
        adj[b].append(int(a))
    _, dist = _bfs_farthest(adj, root)
    return int(dist.max())
