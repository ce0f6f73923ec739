"""Pallas TPU kernel for the ADC scan — the hot kernel of the system.

The distance ``dist[n, b] = sum_m T[b, m, codes[n, m]]`` is a
gather-accumulate; TPUs have no fast per-lane gather, so the kernel
re-expresses the K-way lookup as a **one-hot matmul on the MXU**:

    onehot_m[n, k] = (codes[n, m] == k)          # VPU compare vs iota
    acc[n, b]     += onehot_m @ T[m, :, :]       # [TN,K] @ [K,B] MXU

Per code byte this does K MACs instead of 1 lookup, but the MACs run on
the 128x128 systolic array while the byte stream rides HBM — for
B >= 64 queries the kernel is HBM-bound on the code bytes, which is the
speed-of-light target (BASELINE.md).  The reference's analogous design
is the query-major batch layout + #pragma simd over queries
(``deltapq_create_approx_tree.h:3223-3447``).

Each grid step also extracts its tile's local top-k per query with a
mask-and-argmin loop (k tiny vs the matmul), so only k candidates per
tile per query return to HBM instead of the full [tile, B] distance
block; a final ``lax.top_k`` merges tiles.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adc_dists_kernel(codes_ref, table_ref, out_ref):
    """One tile: codes [TN, M] int32, table [M*K, B] f32 -> out [TN, B]."""
    TN, M = codes_ref.shape
    MK, B = table_ref.shape
    K = MK // M
    codes = codes_ref[:]
    acc = jnp.zeros((TN, B), jnp.float32)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (TN, K), 1)
    for m in range(M):
        onehot = (iota_k == codes[:, m][:, None]).astype(jnp.float32)
        acc = acc + jnp.dot(onehot, table_ref[m * K:(m + 1) * K, :],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile_n",))
def adc_dists_pallas(table: jnp.ndarray, codes: jnp.ndarray,
                     tile_n: int = 512) -> jnp.ndarray:
    """Full distance matrix [B, N] via the one-hot MXU kernel.

    table: [B, M, K] f32; codes: [N, M] uint8/int32, N % tile_n == 0.
    """
    B, M, K = table.shape
    N = codes.shape[0]
    assert N % tile_n == 0
    table_t = table.transpose(1, 2, 0).reshape(M * K, B)  # [M*K, B]
    codes_i = codes.astype(jnp.int32)

    out = pl.pallas_call(
        _adc_dists_kernel,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M * K, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * K * B,
            bytes_accessed=N * M + M * K * B * 4 + N * B * 4,
            transcendentals=0),
    )(codes_i, table_t)
    return out.T  # [B, N]


def _accumulate_onehot(codes, tables, M: int, K: int, B: int,
                       precision: str) -> jnp.ndarray:
    """Shared distance accumulation: one-hot x table matmuls.

    tables: tuple of [M*K, B] arrays — (f32,) for "f32", (bf16 hi,) for
    "bf16", (bf16 hi, bf16 lo) for "bf16x2".  The one-hot matrix is
    exactly representable in bf16, so the hi/lo split reproduces the f32
    table to ~2^-18 relative (the two products are accumulated in f32).
    """
    TN = codes.shape[0]
    acc = jnp.zeros((TN, B), jnp.float32)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (TN, K), 1)
    oh_dtype = jnp.float32 if precision == "f32" else jnp.bfloat16
    for m in range(M):
        onehot = (iota_k == codes[:, m][:, None]).astype(oh_dtype)
        for t in tables:
            acc = acc + jnp.dot(onehot, t[m * K:(m + 1) * K, :],
                                preferred_element_type=jnp.float32)
    return acc


def _adc_topk_kernel(codes_ref, *refs, top_k: int, precision: str):
    """One tile: distances + tile-local top-k extraction.

    codes [TN, M] int32; n_valid (1,1) SMEM; one or two table refs
    [M*K, B]; out_d [1, top_k, B] f32; out_i [1, top_k, B] int32
    (tile-local rows).
    """
    n_valid_ref = refs[0]
    n_tab = 2 if precision == "bf16x2" else 1
    table_refs = refs[1:1 + n_tab]
    out_d_ref, out_i_ref = refs[1 + n_tab:]
    TN, M = codes_ref.shape
    MK, B = table_refs[0].shape
    K = MK // M
    acc = _accumulate_onehot(codes_ref[:], [t[:] for t in table_refs],
                             M, K, B, precision)
    # mask padding rows (beyond the true database size) so they cannot
    # crowd valid rows out of the tile-local top-k
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TN, B), 0)
    tile_base = pl.program_id(0) * TN
    acc = jnp.where(tile_base + iota_n < n_valid_ref[0, 0], acc, jnp.inf)
    # extract top_k smallest per column with mask-and-argmin
    for j in range(top_k):
        dmin = jnp.min(acc, axis=0)                      # [B]
        amin = jnp.argmin(acc, axis=0).astype(jnp.int32)  # [B]
        out_d_ref[0, j, :] = dmin
        out_i_ref[0, j, :] = amin
        acc = jnp.where(iota_n == amin[None, :], jnp.inf, acc)


def split_bf16(x: jnp.ndarray):
    """Split f32 -> (bf16 hi, bf16 lo) with hi + lo ~= x to ~2^-18 rel."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_ROW_BITS = 12  # tile-local row id packed into the low mantissa bits


def _adc_topk_packed_kernel(codes_ref, *refs, top_k: int, precision: str):
    """Fast top-k: distances bitcast to order-preserving int32 with the
    tile-local row id packed into the low 12 bits (squared-L2 >= 0, so
    the f32 bit pattern is monotone).  Every packed value is unique, so
    the j-th extraction is ONE fused sweep:

        t_j = min over rows of (packed where packed > t_{j-1})

    — no masking state, ~k+2 VPU sweeps/tile instead of ~4k, which lets
    the MXU matmul (pipelined across grid steps) become the bound.
    Selection order is exact on (value truncated to 2^-12 rel, row id);
    exact distances are recovered by the caller from the winner ids.
    """
    n_valid_ref = refs[0]
    n_tab = 2 if precision == "bf16x2" else 1
    table_refs = refs[1:1 + n_tab]
    out_ref = refs[1 + n_tab]
    TN, M = codes_ref.shape
    MK, B = table_refs[0].shape
    K = MK // M
    acc = _accumulate_onehot(codes_ref[:], [t[:] for t in table_refs],
                             M, K, B, precision)
    bits = jax.lax.bitcast_convert_type(acc, jnp.int32)
    # order-preserving int32 key for any-sign floats: flip the low 31
    # bits of negative values (squared-L2 is >= 0, but delta-accumulated
    # distances can round slightly negative)
    bits = bits ^ ((bits >> 31) & jnp.int32(0x7FFFFFFF))
    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, B), 0)
    mask = jnp.int32(~((1 << _ROW_BITS) - 1))
    packed = (bits & mask) | rows
    big = jnp.int32(0x7FFFFFFF)
    # mask padding rows (beyond the true database size)
    tile_base = pl.program_id(0) * TN
    packed = jnp.where(tile_base + rows < n_valid_ref[0, 0], packed, big)
    last = jnp.full((B,), -0x80000000, jnp.int32)
    for j in range(top_k):
        cand = jnp.where(packed > last[None, :], packed, big)
        last = jnp.min(cand, axis=0)
        out_ref[0, j, :] = last


@functools.partial(jax.jit,
                   static_argnames=("top_k", "tile_n", "precision"))
def adc_topk_pallas(table: jnp.ndarray, codes: jnp.ndarray,
                    n_valid: jnp.ndarray, top_k: int, tile_n: int = 2048,
                    precision: str = "bf16x2"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming ADC scan + top-k, fully fused: per tile only k
    candidates/query leave the kernel.  Returns (dists [B, top_k]
    ascending, ids [B, top_k] global rows; padding rows masked out).

    precision: "f32" (bit-exact tables, ~4x slower MXU passes),
    "bf16x2" (hi/lo split, ~2^-18 relative table error — default), or
    "bf16" (fastest, ~2^-9 relative).
    """
    B, M, K = table.shape
    N = codes.shape[0]
    assert N % tile_n == 0
    n_tiles = N // tile_n
    table_t = table.transpose(1, 2, 0).reshape(M * K, B)
    codes_i = codes.astype(jnp.int32)

    if precision == "f32":
        tables = (table_t,)
    elif precision == "bf16":
        tables = (table_t.astype(jnp.bfloat16),)
    elif precision == "bf16x2":
        tables = split_bf16(table_t)
    else:
        raise ValueError(f"unknown precision {precision!r}")

    table_specs = [pl.BlockSpec((M * K, B), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for _ in tables]
    d_tiles, i_tiles = pl.pallas_call(
        functools.partial(_adc_topk_kernel, top_k=top_k,
                          precision=precision),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *table_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, top_k, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, top_k, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, top_k, B), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, top_k, B), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * K * B * len(tables),
            bytes_accessed=N * M + M * K * B * 4
            + n_tiles * top_k * B * 8,
            transcendentals=0),
    )(codes_i, jnp.asarray(n_valid, jnp.int32).reshape(1, 1), *tables)

    # global ids + padding mask, then one merge top-k
    base = (jnp.arange(n_tiles, dtype=jnp.int32) * tile_n)[:, None, None]
    gids = i_tiles + base                                  # [T, k, B]
    d = jnp.where(gids < n_valid, d_tiles, jnp.inf)
    cand_d = d.transpose(2, 0, 1).reshape(B, n_tiles * top_k)
    cand_i = gids.transpose(2, 0, 1).reshape(B, n_tiles * top_k)
    neg, pos = jax.lax.top_k(-cand_d, top_k)
    return -neg, jnp.take_along_axis(cand_i, pos, axis=1)


def _exact_dists_for_ids(table: jnp.ndarray, codes: jnp.ndarray,
                         ids: jnp.ndarray) -> jnp.ndarray:
    """Recompute exact f32 distances for the final [B, k] winner ids
    (ids are clipped so sentinel/-1 entries read row 0 harmlessly)."""
    B, M, K = table.shape
    safe = jnp.clip(ids, 0, codes.shape[0] - 1)
    cw = codes[safe]  # [B, k, M] via XLA gather (tiny)
    tf = table.reshape(B, M * K)
    out = jnp.zeros(ids.shape, jnp.float32)
    for m in range(M):
        out = out + jnp.take_along_axis(
            tf, m * K + cw[:, :, m].astype(jnp.int32), axis=1)
    return out


@functools.partial(jax.jit,
                   static_argnames=("top_k", "tile_n", "precision"))
def adc_topk_packed(table: jnp.ndarray, codes: jnp.ndarray,
                    n_valid: jnp.ndarray, top_k: int, tile_n: int = 4096,
                    precision: str = "bf16x2"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast fused ADC scan + top-k via packed int32 selection.

    Selection key is (distance truncated to ~2^-12 relative, row id);
    reported distances are exact f32 recomputed for the winners.
    Returns (dists [B, top_k] ascending by the packed key, ids).
    """
    B, M, K = table.shape
    N = codes.shape[0]
    assert N % tile_n == 0 and tile_n <= (1 << _ROW_BITS)
    n_tiles = N // tile_n
    table_t = table.transpose(1, 2, 0).reshape(M * K, B)
    codes_i = codes.astype(jnp.int32)

    if precision == "f32":
        tables = (table_t,)
    elif precision == "bf16":
        tables = (table_t.astype(jnp.bfloat16),)
    elif precision == "bf16x2":
        tables = split_bf16(table_t)
    else:
        raise ValueError(f"unknown precision {precision!r}")

    table_specs = [pl.BlockSpec((M * K, B), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for _ in tables]
    packed = pl.pallas_call(
        functools.partial(_adc_topk_packed_kernel, top_k=top_k,
                          precision=precision),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *table_specs,
        ],
        out_specs=pl.BlockSpec((1, top_k, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, top_k, B), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * K * B * len(tables),
            bytes_accessed=N * M + M * K * B * 4 * len(tables)
            + n_tiles * top_k * B * 4,
            transcendentals=0),
    )(codes_i, jnp.asarray(n_valid, jnp.int32).reshape(1, 1), *tables)
    # keep XLA's memory-space assignment from pinning the full [T, k, B]
    # result in VMEM (it OOMs scoped vmem when fused with the merge)
    packed = jax.lax.optimization_barrier(packed)

    # merge across tiles on the packed keys
    rows = packed & ((1 << _ROW_BITS) - 1)                  # [T, k, B]
    base = (jnp.arange(n_tiles, dtype=jnp.int32) * tile_n)[:, None, None]
    gids = rows + base
    key = jnp.where(gids < n_valid, packed, jnp.int32(0x7FFFFFFF))
    cand_key = key.transpose(2, 0, 1).reshape(B, n_tiles * top_k)
    cand_i = gids.transpose(2, 0, 1).reshape(B, n_tiles * top_k)
    neg, pos = jax.lax.top_k(-cand_key, top_k)
    ids = jnp.take_along_axis(cand_i, pos, axis=1)
    dists = _exact_dists_for_ids(table, codes_i, ids)
    return dists, ids


# --------------------------------------------------------------------------
# TileDict engine: dictionary-compacted one-hot scan
# --------------------------------------------------------------------------
#
# DeltaPQ exploits inter-code redundancy via tree diffs — a sequential,
# gather-heavy structure.  The TPU-native equivalent exploits the same
# redundancy *columnar-wise*: rows are tiled (in DFS/cluster order, so
# neighbors share values) and each tile stores, per subspace, the small
# dictionary of distinct centroid ids plus a narrow per-row index.  The
# kernel then (a) compacts the ADC table through the dictionary with a
# [DICT, K] one-hot matmul and (b) scans rows with a [TN, DICT] one-hot
# — DICT/K times less VPU compare work and MXU FLOPs than the plain
# one-hot kernel, at full f32 exactness.

def build_tile_dict(codes: np.ndarray, tile_n: int = 2048,
                    max_dict: int = 64):
    """Host-side build.  Returns (dict_vals i32 [T, M, D], idx u8 [N, M],
    dict_width) or None if some tile exceeds ``max_dict`` distinct
    values in a subspace (caller falls back to the plain kernel)."""
    codes = np.asarray(codes)
    n, M = codes.shape
    assert n % tile_n == 0
    n_tiles = n // tile_n
    widths = 1
    dicts = np.zeros((n_tiles, M, max_dict), np.int32)
    idx = np.zeros((n, M), np.uint8)
    for t in range(n_tiles):
        rows = codes[t * tile_n:(t + 1) * tile_n]
        for m in range(M):
            u, inv = np.unique(rows[:, m], return_inverse=True)
            if len(u) > max_dict:
                return None
            widths = max(widths, len(u))
            dicts[t, m, :len(u)] = u
            dicts[t, m, len(u):] = u[0]
            idx[t * tile_n:(t + 1) * tile_n, m] = inv
    # round dict width up to a power of two >= 8 for clean tiling
    d = 8
    while d < widths:
        d *= 2
    return dicts[:, :, :d].copy(), idx, d


def _adc_topk_tiledict_kernel(idx_ref, dict_ref, n_valid_ref, table_ref,
                              out_ref, *, top_k: int):
    """One tile: dict-compacted distances + packed top-k.

    idx [TN, M] int32 (narrow per-row dict positions); dict [1, M, D]
    int32; table [M*K, B] f32; out [1, top_k, B] int32 packed keys.
    """
    TN, M = idx_ref.shape
    _, _, D = dict_ref.shape
    MK, B = table_ref.shape
    K = MK // M
    idx = idx_ref[:]
    acc = jnp.zeros((TN, B), jnp.float32)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (D, K), 1)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (TN, D), 1)
    for m in range(M):
        # stage A: compact table through the dictionary (tiny matmul)
        oh_d = (iota_k == dict_ref[0, m][:, None]).astype(jnp.float32)
        t_m = jnp.dot(oh_d, table_ref[m * K:(m + 1) * K, :],
                      preferred_element_type=jnp.float32)  # [D, B]
        # stage B: narrow one-hot over rows
        oh_r = (iota_d == idx[:, m][:, None]).astype(jnp.float32)
        acc = acc + jnp.dot(oh_r, t_m,
                            preferred_element_type=jnp.float32)
    # packed exact-f32-key top-k (same scheme as the packed kernel)
    bits = jax.lax.bitcast_convert_type(acc, jnp.int32)
    bits = bits ^ ((bits >> 31) & jnp.int32(0x7FFFFFFF))
    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, B), 0)
    packed = (bits & jnp.int32(~((1 << _ROW_BITS) - 1))) | rows
    big = jnp.int32(0x7FFFFFFF)
    tile_base = pl.program_id(0) * TN
    packed = jnp.where(tile_base + rows < n_valid_ref[0, 0], packed, big)
    last = jnp.full((B,), -0x80000000, jnp.int32)
    for j in range(top_k):
        cand = jnp.where(packed > last[None, :], packed, big)
        last = jnp.min(cand, axis=0)
        out_ref[0, j, :] = last


@functools.partial(jax.jit, static_argnames=("top_k", "tile_n"))
def adc_topk_tiledict(table: jnp.ndarray, idx: jnp.ndarray,
                      dict_vals: jnp.ndarray, codes: jnp.ndarray,
                      n_valid: jnp.ndarray, top_k: int,
                      tile_n: int = 2048
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TileDict scan + top-k.  idx [N, M] u8/int32 dict positions;
    dict_vals [T, M, D] int32; codes [N, M] (for exact distance
    readout).  Returns (dists [B, top_k] exact f32, global ids)."""
    B, M, K = table.shape
    N = idx.shape[0]
    assert N % tile_n == 0 and tile_n <= (1 << _ROW_BITS)
    n_tiles = N // tile_n
    D = dict_vals.shape[2]
    table_t = table.transpose(1, 2, 0).reshape(M * K, B)
    idx_i = idx.astype(jnp.int32)

    packed = pl.pallas_call(
        functools.partial(_adc_topk_tiledict_kernel, top_k=top_k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((M * K, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, top_k, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, top_k, B), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * B * M + 2 * n_tiles * D * K * B * M,
            bytes_accessed=N * M + M * K * B * 4,
            transcendentals=0),
    )(idx_i, dict_vals.astype(jnp.int32),
      jnp.asarray(n_valid, jnp.int32).reshape(1, 1), table_t)
    packed = jax.lax.optimization_barrier(packed)

    rows = packed & ((1 << _ROW_BITS) - 1)
    base = (jnp.arange(n_tiles, dtype=jnp.int32) * tile_n)[:, None, None]
    gids = rows + base
    key = jnp.where(gids < n_valid, packed, jnp.int32(0x7FFFFFFF))
    cand_key = key.transpose(2, 0, 1).reshape(B, n_tiles * top_k)
    cand_i = gids.transpose(2, 0, 1).reshape(B, n_tiles * top_k)
    neg, pos = jax.lax.top_k(-cand_key, top_k)
    ids = jnp.take_along_axis(cand_i, pos, axis=1)
    dists = _exact_dists_for_ids(table, codes.astype(jnp.int32), ids)
    return dists, ids


class TileDictEngine:
    """Compressed-scan engine: rows ordered by DeltaTree DFS (clustered
    codes land in the same tiles), per-tile dictionaries, f32-exact
    kernel.  Falls back to None (caller uses the plain kernel) when the
    data isn't tile-compressible."""

    def __init__(self, codewords, codes, order=None, tile_n: int = 2048,
                 max_dict: int = 64):
        from .adc import pad_codes

        codes = np.asarray(codes)
        self.n_valid = len(codes)
        if order is None:
            order = np.arange(len(codes))
        self.order = np.asarray(order, np.int64)
        reordered = codes[self.order]
        reordered = pad_codes(reordered, tile_n)
        built = build_tile_dict(reordered, tile_n=tile_n,
                                max_dict=max_dict)
        self.ok = built is not None
        if not self.ok:
            return
        dicts, idx, D = built
        self.tile_n = tile_n
        self.dict_width = D
        self.codewords = jnp.asarray(codewords, jnp.float32)
        M, K, Ds = codewords.shape
        self.D_vec = M * Ds
        self.dicts = jnp.asarray(dicts)
        self.idx = jnp.asarray(idx)
        self.codes_reordered = jnp.asarray(reordered)
        # padded rows map to order[0]; they're masked via n_valid anyway
        self.row_to_db = jnp.asarray(np.concatenate(
            [self.order,
             np.zeros(len(reordered) - len(self.order), np.int64)])
            .astype(np.int32))

    def query(self, queries, top_k: int = 10):
        from .adc import adc_table

        q = np.asarray(queries, np.float32)
        if q.shape[1] < self.D_vec:
            q = np.pad(q, ((0, 0), (0, self.D_vec - q.shape[1])))
        table = adc_table(self.codewords, jnp.asarray(q))
        d, rows = adc_topk_tiledict(table, self.idx, self.dicts,
                                    self.codes_reordered,
                                    jnp.int32(self.n_valid), top_k,
                                    self.tile_n)
        ids = jnp.take(self.row_to_db, rows)
        return np.asarray(d), np.asarray(ids)
