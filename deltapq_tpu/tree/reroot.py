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


def rotate_tree(edges: np.ndarray, root: int, n: int
                ) -> Tuple[np.ndarray, int, int]:
    """Iterative root rotation (``PQBase::rotate_trees``,
    ``pqbase.cpp:177-286``): repeatedly move the root to its highest
    child while that reduces the height — a greedy descent toward the
    tree center.  Returns (oriented edges, new_root, new_height)."""
    adj: List[List[int]] = [[] for _ in range(n)]
    for a, b in np.asarray(edges, np.int64):
        adj[a].append(int(b))
        adj[b].append(int(a))

    def heights_from(r):
        # BFS order, then heights bottom-up (reference :221-244)
        order = [r]
        parent = {r: -1}
        for v in order:
            for w in adj[v]:
                if w not in parent:
                    parent[w] = v
                    order.append(w)
        h = {v: 0 for v in order}
        for v in reversed(order[1:]):
            p = parent[v]
            h[p] = max(h[p], h[v] + 1)
        return h, parent, order

    root = int(root)
    min_height = None
    while True:
        h, parent, order = heights_from(root)
        if min_height is not None and min_height <= h[root]:
            break
        min_height = h[root]
        best, best_h = root, 0
        for c in adj[root]:
            if h[c] > best_h:
                best_h, best = h[c], c
        if best == root:
            break
        root = best

    # orient away from the final root
    h, parent, order = heights_from(root)
    oriented = np.array([(parent[v], v) for v in order if parent[v] >= 0],
                        np.uint32).reshape(-1, 2)
    return oriented, root, h[root]


def repair_tree(tree, max_depth: int = 15, codewords=None, tables=None):
    """Rebuild a too-deep DeltaTree so it fits the DTC depth nibble.

    Strategy: (1) center re-root (optimal height for the same edge set,
    ``adjust_trees`` semantics); (2) if the diameter still exceeds
    2*max_depth, iteratively half deep chains by reparenting nodes
    deeper than max_depth to their grandparent — lossless (diffs are
    recomputed from the codes), at the cost of more diffs per repaired
    node.  Returns a new DeltaTree over the same codes/ids.
    """
    from .layout import build_layout

    n = tree.n
    codes_db = tree.decode_codes()
    M = tree.M
    # edges in database-id space
    pos = np.arange(n)
    par = tree.parent_pos
    child_mask = par >= 0
    edges = np.stack([tree.vec_id[par[child_mask]],
                      tree.vec_id[pos[child_mask]]], axis=1)
    oriented, root, height = reroot_min_height(edges, n)
    if height > max_depth:
        parents = np.full(n, -1, np.int64)
        parents[oriented[:, 1].astype(np.int64)] = oriented[:, 0]
        while True:
            depth = np.zeros(n, np.int64)
            # depths via pointer jumping
            anc = parents.copy()
            while (anc >= 0).any():
                depth += anc >= 0
                anc = np.where(anc >= 0, parents[np.maximum(anc, 0)], -1)
            if depth.max() <= max_depth:
                break
            deep = depth > max_depth
            gp = parents[np.maximum(parents, 0)]
            parents = np.where(deep & (parents >= 0)
                               & (parents[np.maximum(parents, 0)] >= 0),
                               gp, parents)
        child = np.flatnonzero(parents >= 0)
        oriented = np.stack([parents[child], child], axis=1
                            ).astype(np.uint32)
    if tables is None and codewords is None:
        # child-ordering heuristic (max_dist2p) needs inter-centroid
        # tables; zero tables keep the rebuild valid (ordering quality
        # only affects oracle pruning, not the byte format)
        tables = np.zeros((M, tree.K, tree.K), np.float32)
    return build_layout(codes_db, oriented, root, K=tree.K,
                        codewords=codewords, tables=tables)
