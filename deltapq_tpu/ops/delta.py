"""Compressed-code (DeltaTree) query execution on TPU.

The reference scans the DTC stream **sequentially** per query with a
stack of (code, distance) per tree depth, updating
``dist = parent_dist - T[m][from] + T[m][to]`` per diff
(``query_processing_scan_compressed_codes_opt_o_direct``,
``deltapq_create_approx_tree.h:2805-2984``); the batch variant
vectorizes that inner update over queries (``:3223-3447``).

TPU design (SURVEY.md §7): the stack recurrence is re-expressed
**level-by-level** — all nodes at depth d depend only on depth d-1, and
tree height is bounded by MAX_HEIGHT (= M*h) + finalist chain, so the
whole traversal is ~M+2 rounds of

    delta[b, j] = sum over node j's diffs of (T[b,m,to] - T[b,m,from])
    dist[b, node_at_level_d] = dist[b, parent] + delta

where the per-level diff lists are flat (ragged -> segment-sum) arrays
built once at index-build time.  Every round is a dense gather +
segment-sum, fully parallel over (queries x nodes) — the TPU-native
realization of the reference's per-node stack loop, touching only
compressed-size diff data plus the [B, N] distance frontier.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tree.layout import DeltaTree, _ragged_indices


@dataclass
class LevelPack:
    """Per-depth flat arrays for one level of the DeltaTree."""

    node_pos: np.ndarray     # i32[n_d] DFS positions at this depth
    parent_pos: np.ndarray   # i32[n_d]
    seg: np.ndarray          # i32[t_d] index into 0..n_d-1 per diff
    dm: np.ndarray           # i32[t_d] subspace of each diff
    dfrom: np.ndarray        # i32[t_d] parent's centroid id
    dto: np.ndarray          # i32[t_d] node's centroid id


@dataclass
class DeltaPack:
    """Device-ready level-wise layout of a DeltaTree."""

    levels: List[LevelPack]
    root_code: np.ndarray    # [M] int32
    vec_id: np.ndarray       # [N] int32: DFS pos -> database id
    n: int
    M: int
    K: int


def build_delta_pack(tree: DeltaTree) -> DeltaPack:
    """Host-side preparation: group nodes by depth, flatten diffs, and
    resolve each diff's ``from`` (= parent's centroid in that subspace,
    which the DTC stream stores implicitly via the decode stack)."""
    codes_dfs = np.zeros((tree.n, tree.M), np.int32)
    # decode in DFS-index order (parents precede children)
    decoded_db = tree.decode_codes()
    codes_dfs = decoded_db[tree.vec_id.astype(np.int64)].astype(np.int32)

    levels: List[LevelPack] = []
    maxd = int(tree.depth.max()) if tree.n else 0
    for d in range(1, maxd + 1):
        sel = np.flatnonzero(tree.depth == d).astype(np.int64)
        cnt = tree.diff_num[sel].astype(np.int64)
        flat = _ragged_indices(tree.diff_off[sel], cnt)
        seg = np.repeat(np.arange(len(sel)), cnt).astype(np.int32)
        dm = tree.diff_m[flat].astype(np.int32)
        dto = tree.diff_to[flat].astype(np.int32)
        par = tree.parent_pos[sel].astype(np.int64)
        dfrom = codes_dfs[np.repeat(par, cnt), dm]
        levels.append(LevelPack(
            node_pos=sel.astype(np.int32),
            parent_pos=par.astype(np.int32),
            seg=seg, dm=dm, dfrom=dfrom.astype(np.int32), dto=dto))
    return DeltaPack(levels=levels,
                     root_code=codes_dfs[0].astype(np.int32),
                     vec_id=tree.vec_id.astype(np.int32),
                     n=tree.n, M=tree.M, K=tree.K)


def _level_step(dist: jnp.ndarray, table_flat: jnp.ndarray,
                lp_node: jnp.ndarray, lp_parent: jnp.ndarray,
                lp_seg: jnp.ndarray, lp_midx_to: jnp.ndarray,
                lp_midx_from: jnp.ndarray, n_nodes_level: int
                ) -> jnp.ndarray:
    """One level of delta propagation.  table_flat: [B, M*K]."""
    terms = (jnp.take(table_flat, lp_midx_to, axis=1)
             - jnp.take(table_flat, lp_midx_from, axis=1))  # [B, t_d]
    # segment sum over diffs -> per-node deltas, via one-hot matmul-free
    # scatter-add (XLA lowers to efficient segmented reduce on TPU)
    delta = jax.vmap(
        lambda t: jax.ops.segment_sum(t, lp_seg, num_segments=n_nodes_level)
    )(terms)  # [B, n_d]
    parent_d = jnp.take(dist, lp_parent, axis=1)
    return dist.at[:, lp_node].set(parent_d + delta)


def make_compressed_query_fn(pack: DeltaPack):
    """Build a jitted function (table [B, M, K]) -> dists [B, N_db]
    running the full level-wise traversal.  Shapes are baked per index
    (one compile per dataset, like the reference's per-file decode).

    The level arrays are passed as jit *arguments* (a pytree captured in
    a partial), not closure constants — closure-captured device arrays
    are baked into the serialized HLO, which breaks remote-compile
    backends for large indexes.
    """
    levels_dev = [
        (jnp.asarray(lp.node_pos), jnp.asarray(lp.parent_pos),
         jnp.asarray(lp.seg), jnp.asarray(lp.dm * pack.K + lp.dto),
         jnp.asarray(lp.dm * pack.K + lp.dfrom))
        for lp in pack.levels]
    level_sizes = tuple(len(lp.node_pos) for lp in pack.levels)
    root_idx = jnp.asarray(np.arange(pack.M, dtype=np.int32) * pack.K
                           + pack.root_code)
    vec_id = jnp.asarray(pack.vec_id)
    n = pack.n

    @functools.partial(jax.jit, static_argnames=("sizes",))
    def run_impl(table, levels, root_idx, vec_id, sizes):
        B = table.shape[0]
        tf = table.reshape(B, -1)
        dist = jnp.zeros((B, n), jnp.float32)
        root_d = jnp.sum(jnp.take(tf, root_idx, axis=1), axis=1)
        dist = dist.at[:, 0].set(root_d)
        for (node, parent, seg, midx_to, midx_from), n_lvl in zip(
                levels, sizes):
            dist = _level_step(dist, tf, node, parent, seg,
                               midx_to, midx_from, n_lvl)
        # permute DFS-position distances back to database id order
        inv = jnp.zeros(n, jnp.int32).at[vec_id].set(
            jnp.arange(n, dtype=jnp.int32))
        return jnp.take(dist, inv, axis=1)

    def run(table: jnp.ndarray) -> jnp.ndarray:
        return run_impl(table, levels_dev, root_idx, vec_id, level_sizes)

    return run


def query_compressed(pack: DeltaPack, codewords: np.ndarray,
                     queries: np.ndarray, top_k: int = 10,
                     select: str = "auto"
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """End-to-end compressed query: ADC tables + level-wise traversal +
    top-k.  Returns (dists [B, top_k], ids [B, top_k]) in database-id
    space (ascending distance)."""
    from .adc import adc_table
    from .topk import smallest_k

    codewords = jnp.asarray(codewords, jnp.float32)
    M, K, Ds = codewords.shape
    q = np.asarray(queries, np.float32)
    if q.shape[1] < M * Ds:
        q = np.pad(q, ((0, 0), (0, M * Ds - q.shape[1])))
    table = adc_table(codewords, jnp.asarray(q))
    run = make_compressed_query_fn(pack)
    dists = run(table)  # [B, N] in db order
    d, ids = smallest_k(dists, top_k, select)
    return np.asarray(d), np.asarray(ids)
