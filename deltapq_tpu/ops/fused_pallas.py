"""Fused Pallas scan kernels — matmul ADC + in-kernel shortlist.

The ADC distance decomposes exactly through the decoded vector
(``ops/decoded.py``):

    dist[n, b] = ||xhat_n||^2 - 2 <xhat_n, q_b> + ||q_b||^2

so the database scan is an MXU matmul contracting over D (= M*Ds), a
16x smaller contraction than the one-hot [N, M*K] formulation in
``adc_pallas.py``.  What made the round-1 decoded engine slow was not
the matmul but the **[B, N] f32 distance materialization** (512 MB at
N=1M, B=128) feeding ``approx_min_k`` — ~1 GB of avoidable HBM traffic.

These kernels never materialize distances: each grid step computes its
tile's [TILE, B] distance block in VMEM and reduces every SUB=32
consecutive rows to their **subtile minimum**, so only [N/32, B] f32
leaves the kernel (16 MB at 1M/B=128).  The caller selects the top-C
subtiles per query, gathers their rows as candidates, and reranks them
with exact f32 ADC table lookups — reported distances are identical to
the plain f32 scan, with a per-query exactness certificate (see
``select_rerank``) that drives escalation in the engines.

Three storage tiers share the epilogue:

* ``fused_decoded_mins``   — xhat bf16 resident in HBM (D*2 B/vec);
  HBM-bound: the fastest tier.
* ``fused_codes_mins``     — u8 codes resident (M B/vec); the kernel
  one-hot-decodes codes -> xhat bf16 on the MXU, then matmuls.
* ``fused_delta_mins``     — delta-compressed tiles (~3 B/vec, see
  ``delta_tiles.py``); the kernel first reconstructs the tile's codes
  with a vectorized forward-fill over sequential diffs, then proceeds
  as the codes tier.  This is the TPU realization of the reference's
  compressed-stream scan (``deltapq_create_approx_tree.h:2805-2984``):
  the DFS byte stream + decode stack become a tile-parallel fill.

Mosaic-friendliness rules used throughout: rows live on sublanes
([TILE, *] orientation everywhere, one layout for all tiers), lane
dims are static slices only, sublane shifts use ``pltpu.roll``, prefix
sums over the tiny M axis are a strictly-lower-triangular matmul, and
the subtile-min is a static loop of contiguous [SUB, B] block reduces
(lane-splitting reshapes are not lowerable).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024   # rows per grid step
SUB = 32      # rows per subtile-min


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _no_ut() -> bool:
    return bool(os.environ.get("DELTAPQ_NO_UT"))


def _stage_iso() -> str:
    # MEASUREMENT-ONLY stage isolation for the stream kernel (results
    # are wrong when set): "nodecode" stubs the stream decode,
    # "noscan" skips the scan tail's one-hot + matmuls, "nooh" skips
    # only the one-hot compare-build (matmuls run on stale scratch),
    # "novg" stubs the decode's value-gather.  Read at trace time;
    # see tools/bench_stream_knobs.py.
    return os.environ.get("DELTAPQ_STAGEISO", "")


def _no_dig() -> bool:
    # ||xhat||^2 via 3-digit int8 matmul measured SLOWER than the VPU
    # square+reduce in every kernel variant (+0.9-1.1 ms at 1M/B=512:
    # the extra 16-pass K-dim matmul outweighs the reduce) — off
    # unless explicitly enabled
    return not bool(os.environ.get("DELTAPQ_DIG"))


def _oh_cmp_dtype():
    # dtype the one-hot compare runs in.  The compare-build is the
    # stream/codes kernels' single largest stage (~1.96 of 5.37 ms at
    # 1M/B=512, VPU-bound on [TILE, K] element count); narrower
    # compare dtypes would let the VPU pack more elements per op, but
    # NEITHER narrow compare lowers on v5e (round-4 negative result):
    # Mosaic packs the operands (vector<8x128x4xi8> /
    # vector<8x128x2xbf16>) and then rejects the packed cmpi/cmpf with
    # "Target does not support this comparison".  i32 stays the only
    # lowerable dtype; the knob remains for future targets.
    return {"bf16": jnp.bfloat16, "i8": jnp.int8,
            "i32": jnp.int32}[os.environ.get("DELTAPQ_OHCMP", "i32")]


def _subtile_mins(d: jnp.ndarray, out_ref) -> None:
    """d [TILE, B] -> out_ref [TILE//SUB, B] per-SUB-row minima.

    Static slice loop of contiguous [SUB, B] blocks + axis-0 reduces.
    (A [TILE//SUB, SUB, B] reshape+reduce also lowers, but costs a full
    relayout: ~2 ms/batch slower at 1M, measured.)"""
    for g in range(TILE // SUB):
        out_ref[g:g + 1, :] = jnp.min(d[g * SUB:(g + 1) * SUB, :],
                                      axis=0, keepdims=True)


def _mask_invalid(d: jnp.ndarray, n_valid_ref) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    base = pl.program_id(0) * TILE
    return jnp.where(base + rows < n_valid_ref[0, 0], d, jnp.inf)


# --------------------------------------------------------------------------
# Tier 1: decoded bf16 cache
# --------------------------------------------------------------------------

def pack_xhat_tiles(xhat: np.ndarray, tile: int = TILE) -> np.ndarray:
    """[N, D] bf16 -> [nT, tile, D] bf16 (zero rows pad N to tile)."""
    n, d = xhat.shape
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        xhat = np.concatenate(
            [xhat, np.zeros((n_pad - n, d), xhat.dtype)], axis=0)
    return np.ascontiguousarray(xhat.reshape(n_pad // tile, tile, d))


def _decoded_mins_kernel(q_ref, n_valid_ref, xt_ref, out_ref, *,
                         tile: int):
    """q [D, B] bf16; xt [1, tile, D] bf16; out [tile//SUB, B] f32.
    precomp = ||xhat||^2 is recomputed in-kernel (bf16-rounded xhat:
    ~2^-8 relative — covered by the rerank certificate margin)."""
    xhat = xt_ref[0]
    cross = jnp.dot(xhat, q_ref[:],
                    preferred_element_type=jnp.float32)     # [tile, B]
    xf = xhat.astype(jnp.float32)
    pre = jnp.sum(xf * xf, axis=1, keepdims=True)           # [tile, 1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    base = pl.program_id(0) * tile
    d = jnp.where(base + rows < n_valid_ref[0, 0],
                  pre - 2.0 * cross, jnp.inf)
    for g in range(tile // SUB):
        out_ref[g:g + 1, :] = jnp.min(d[g * SUB:(g + 1) * SUB, :],
                                      axis=0, keepdims=True)


@jax.jit
def fused_decoded_mins(q: jnp.ndarray, xt: jnp.ndarray,
                       n_valid: jnp.ndarray) -> jnp.ndarray:
    """Subtile minima [N_pad/SUB, B] of the (q2-less) distances
    ``precomp - 2 cross`` over the whole database.

    q [D, B] bf16 (note: query-major transposed); xt [nT, tile, D]
    bf16 (any tile multiple of SUB); padding rows map to +inf.
    """
    D, B = q.shape
    nt, tile = xt.shape[0], xt.shape[1]
    ns = tile // SUB
    return pl.pallas_call(
        functools.partial(_decoded_mins_kernel, tile=tile),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((D, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * ns, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * tile * D * B,
            bytes_accessed=nt * tile * D * 2 + B * D * 2
            + nt * ns * B * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(q, jnp.asarray(n_valid, jnp.int32).reshape(1, 1), xt)


# --------------------------------------------------------------------------
# Tiers 2 & 3: in-kernel decode (u8 codes / delta tiles)
# --------------------------------------------------------------------------

def codebook_center(codewords: np.ndarray) -> np.ndarray:
    """Global centering vector mu [D]: the concatenated per-subspace
    centroid means.  Squared-L2 distances are translation-invariant,
    so the scan runs on (x-mu, q-mu) — this kills the common-mode
    magnitude that otherwise dominates bf16 rounding error on
    uncentered (e.g. bvecs 0..255) data and breaks the exactness
    certificate's margins."""
    return np.asarray(codewords, np.float32).mean(axis=1).reshape(-1)


def group_geometry(M: int, Ds: int) -> Tuple[int, int, int]:
    """Subspace grouping for the block-diagonal decode.

    The one-hot scratch is [*, Mg*K] and the codebook operand
    [G*Mg*K, Dg_pad]: grouping subspaces in bands of <= 8 keeps both
    within VMEM at the GIST shape (M=16, K=256), where an ungrouped
    [TILE, 4096] scratch + [4096, 1024] codebook would not fit.
    Returns (G groups, Mg subspaces/group, Dg_pad padded group width).
    For M <= 8 this degenerates to one group with D padded to 128 —
    bit-identical to the ungrouped layout."""
    G = (M + 7) // 8
    Mg = -(-M // G)
    Dg_pad = -(-(Mg * Ds) // 128) * 128
    return G, Mg, Dg_pad


def pack_query_grouped(qc: np.ndarray, M: int, Ds: int) -> np.ndarray:
    """Centered queries [B, D] f32 -> kernel layout [B, G*Dg_pad]:
    group g's subspace dims at columns [g*Dg_pad, g*Dg_pad + Mg*Ds),
    zeros elsewhere (matching ``build_blockdiag_codebook`` columns)."""
    qc = np.asarray(qc, np.float32)
    B, D = qc.shape
    G, Mg, Dg_pad = group_geometry(M, Ds)
    out = np.zeros((B, G * Dg_pad), np.float32)
    for g in range(G):
        lo = g * Mg * Ds
        hi = min((g + 1) * Mg * Ds, D)
        out[:, g * Dg_pad:g * Dg_pad + (hi - lo)] = qc[:, lo:hi]
    return out


def build_blockdiag_codebook(codewords: np.ndarray,
                             center: Optional[np.ndarray] = None,
                             dtype=None) -> np.ndarray:
    """[M, K, Ds] f32 -> grouped block-diagonal [G*Mg*K, Dg_pad] bf16
    decode matrix: per group g, ``onehot(codes_g) @ CWbd_g``
    reconstructs the group's decoded dims (minus ``center`` when given,
    see ``codebook_center``).  For M <= 8 (one group) this is the plain
    [M*K, pad(D, 128)] block-diagonal matrix.  ``dtype`` overrides the
    bf16 default — the int8/int16 quantizers take the f32 form so
    their certificate radii cover the FULL quantization error (a bf16
    pre-round would inject ~2^-9*|c| of unaccounted error, larger than
    the int16 step)."""
    M, K, Ds = codewords.shape
    cw = np.asarray(codewords, np.float32)
    if center is not None:
        cw = cw - center.reshape(M, 1, Ds)
    G, Mg, Dg_pad = group_geometry(M, Ds)
    out = np.zeros((G * Mg * K, Dg_pad), np.float32)
    for m in range(M):
        g, mi = divmod(m, Mg)
        out[(g * Mg + mi) * K:(g * Mg + mi + 1) * K,
            mi * Ds:(mi + 1) * Ds] = cw[m]
    return out.astype(dtype if dtype is not None else jnp.bfloat16)


def _groups_of(M: int) -> Tuple[int, int]:
    G = (M + 7) // 8
    return G, -(-M // G)


def _scan_tail(H, q_ref, cwbd_ref, n_valid_ref, out_ref, codes_out_ref,
               oh_ref, u_ref=None, dig_ref=None, int16=False):
    """Shared tail: codes H [TILE, M] i32 -> one-hot decode -> matmul ->
    subtile mins, per subspace group (``group_geometry``).

    bf16 mode: q [G*Dg, B] bf16; cwbd [G*Mg*K, Dg] bf16; oh scratch
    [TILE, Mg*K] bf16 (reused across groups).
    int8 mode (detected from cwbd dtype): quantized codebook/query,
    both matmuls run at the MXU's 2x int8 rate, distances come out in
    the scale^2 domain (the caller rescales; shortlist-only precision,
    exactness restored by the rerank as usual).
    int16 mode (static flag; operands still int8): codewords and
    queries carry TWO base-128 int8 digits (value = 128a + b, step
    scale/128) — cwbd [G*Mg*K, 2*Dg] with the a|b digit planes
    side-by-side, q [2*G*Dg, B] with all a-planes then all b-planes.
    The cross term expands exactly as 16384*(a@a') + 128*(a@b' + b@a')
    + b@b' — four int8 MXU passes, all int32-exact (per-dot magnitudes
    < 2^31), combined in f32 (rel err ~6e-8).  The quantization step
    shrinks 128x, so the exactness-certificate radius drops from
    ~scale*sqrt(D) to ~scale*sqrt(D)/128 — on nearly-all-distinct
    workloads (real-SIFT-like) that turns the certificate pass rate
    from ~0.2 into ~genuine-coverage (~1.0), which is the difference
    between every batch paying the escalation ladder and almost none
    (round-5 fix for the VERDICT r4 dense-tier gap + 100M certificate
    collapse).
    """
    M = H.shape[1]
    G, Mg = _groups_of(M)
    K = cwbd_ref.shape[0] // (G * Mg)
    Dg = cwbd_ref.shape[1] // (2 if int16 else 1)
    int8_mode = cwbd_ref.dtype == jnp.int8
    oh_dtype = jnp.int8 if int8_mode else jnp.bfloat16
    iso = _stage_iso()
    if iso == "noscan":
        d = jnp.broadcast_to(H[:, :1].astype(jnp.float32),
                             (TILE, q_ref.shape[1]))
        _subtile_mins(d, out_ref)
        codes_out_ref[:] = H.astype(jnp.uint8)
        return
    ct = _oh_cmp_dtype()
    iota_k = jax.lax.broadcasted_iota(
        jnp.int32, (TILE, K), 1).astype(ct)
    Hc = H.astype(ct)
    if (int16 and cwbd_ref.shape[0] == M * K
            and cwbd_ref.shape[1] == 128 and M % 2 == 0):
        # G2-packed int16 decode (``quantize_blockdiag_int16_g2``):
        # two [TILE, M*K/2] x [M*K/2, 128] decode matmuls (a|b planes
        # share the 128 lanes) instead of one [TILE, M*K] x [M*K,
        # 256] — half the MACs at full lane utilization; cross passes
        # reassemble plain-dim-order digit planes by lane concat
        Mg2 = M // 2
        w = cwbd_ref.shape[1] // 2               # 64
        GD = q_ref.shape[0] // 2                 # 128 a-plane rows
        pre = jnp.zeros((TILE, 1), jnp.float32)
        xa_parts, xb_parts = [], []
        for g2 in range(2):
            for mi in range(Mg2):
                m = g2 * Mg2 + mi
                oh_ref[:, mi * K:(mi + 1) * K] = (
                    (Hc[:, m:m + 1] == iota_k).astype(oh_dtype))
            cwg = cwbd_ref[g2 * Mg2 * K:(g2 + 1) * Mg2 * K, :]
            x_ab = jnp.dot(oh_ref[:, :Mg2 * K], cwg,
                           preferred_element_type=jnp.int32)
            af = x_ab[:, :w].astype(jnp.float32)
            A = 128.0 * af + x_ab[:, w:].astype(jnp.float32)
            pre = pre + jnp.sum(A * A, axis=1, keepdims=True)
            x8 = x_ab.astype(jnp.int8)           # exact: single digits
            xa_parts.append(x8[:, :w])
            xb_parts.append(x8[:, w:])
        xa8 = jnp.concatenate(xa_parts, axis=1)  # plain dim order
        xb8 = jnp.concatenate(xb_parts, axis=1)
        qa = q_ref[0:GD, :]
        qb = q_ref[GD:2 * GD, :]
        caa = jnp.dot(xa8, qa, preferred_element_type=jnp.int32)
        p2 = jnp.dot(jnp.concatenate([xa8, xb8], axis=1),
                     jnp.concatenate([qb, qa], axis=0),
                     preferred_element_type=jnp.int32)
        cbb = jnp.dot(xb8, qb, preferred_element_type=jnp.int32)
        cross = (16384.0 * caa.astype(jnp.float32)
                 + 128.0 * p2.astype(jnp.float32)
                 + cbb.astype(jnp.float32))
        if u_ref is not None:
            cross = cross * u_ref[:]
        d = _mask_invalid(pre - 2.0 * cross, n_valid_ref)
        _subtile_mins(d, out_ref)
        codes_out_ref[:] = H.astype(jnp.uint8)
        return
    pre = jnp.zeros((TILE, 1), jnp.float32)
    cross = jnp.zeros((TILE, q_ref.shape[1]), jnp.float32)
    for g in range(G):
        for mi in range(Mg):
            if iso == "nooh":
                break
            m = g * Mg + mi
            oh_ref[:, mi * K:(mi + 1) * K] = (
                (Hc[:, m:m + 1] == iota_k).astype(oh_dtype)
                if m < M else jnp.zeros((TILE, K), oh_dtype))
        cwg = cwbd_ref[g * Mg * K:(g + 1) * Mg * K, :]
        if int16:
            # two-digit path: ONE double-width decode matmul selects
            # both digit planes (a|b side by side); the narrowing casts
            # are exact (block-diagonal selection of single digits,
            # |a| <= 127, |b| <= 64)
            x_ab = jnp.dot(oh_ref[:], cwg,
                           preferred_element_type=jnp.int32)
            x8 = x_ab.astype(jnp.int8)               # [TILE, 2*Dg]
            xa8, xb8 = x8[:, :Dg], x8[:, Dg:]
            GD = G * Dg
            qa = q_ref[g * Dg:(g + 1) * Dg, :]
            qb = q_ref[GD + g * Dg:GD + (g + 1) * Dg, :]
            # ||xhat||^2 in the A = 128a + b domain on the VPU (A^2 <=
            # 2.7e8: exact in f32; the f32 row sum rounds at ~6e-8 rel)
            af = x_ab[:, :Dg].astype(jnp.float32)
            A = 128.0 * af + x_ab[:, Dg:].astype(jnp.float32)
            pre = pre + jnp.sum(A * A, axis=1, keepdims=True)
            # cross = (128a+b)@(128a'+b') expanded into int8 passes,
            # each int32-exact: |caa| <= 127^2*D, |p2| <= 2*127*64*D,
            # |cbb| <= 64^2*D for D <= 2048
            caa = jnp.dot(xa8, qa, preferred_element_type=jnp.int32)
            p2 = jnp.dot(x8, jnp.concatenate([qb, qa], axis=0),
                         preferred_element_type=jnp.int32)
            cbb = jnp.dot(xb8, qb, preferred_element_type=jnp.int32)
            cross = cross + (16384.0 * caa.astype(jnp.float32)
                             + 128.0 * p2.astype(jnp.float32)
                             + cbb.astype(jnp.float32))
            continue
        qg = q_ref[g * Dg:(g + 1) * Dg, :]
        if int8_mode:
            xq = jnp.dot(oh_ref[:], cwg,
                         preferred_element_type=jnp.int32)  # [TILE, Dg]
            # block-diagonal selection: every entry is one int8
            # codebook value, so the narrowing cast is exact
            x8 = xq.astype(jnp.int8)
            if dig_ref is not None:
                # ||xhat||^2 on the MXU: per-codeword norm^2 split
                # into 3 base-128 int8 digits (exact: max norm^2 =
                # 127^2*Dg < 128^3), selected by the same one-hot —
                # replaces a [TILE, Dg] square + cross-lane reduce on
                # the VPU with one narrow int8 matmul
                dg = dig_ref[g * Mg * K:(g + 1) * Mg * K, :]
                xd = jnp.dot(oh_ref[:], dg,
                             preferred_element_type=jnp.int32)
                pre = pre + ((xd[:, 2:3] * 128 + xd[:, 1:2]) * 128
                             + xd[:, 0:1]).astype(jnp.float32)
            else:
                pre = pre + jnp.sum(xq * xq, axis=1,
                                    keepdims=True).astype(jnp.float32)
            cross = cross + jnp.dot(
                x8, qg, preferred_element_type=jnp.int32
            ).astype(jnp.float32)                          # [TILE, B]
        else:
            xhat = jnp.dot(oh_ref[:], cwg,
                           preferred_element_type=jnp.float32)
            pre = pre + jnp.sum(xhat * xhat, axis=1, keepdims=True)
            cross = cross + jnp.dot(
                xhat.astype(jnp.bfloat16), qg,
                preferred_element_type=jnp.float32)
    if int8_mode and u_ref is not None:
        # per-query int8 headroom: queries were quantized at
        # scale*u[b] (u >= 1 so nothing clips); cross carries the
        # extra u factor back so pre and cross share the scale^2
        # domain (certificate radius grows with u, see select_rerank)
        cross = cross * u_ref[:]
    d = _mask_invalid(pre - 2.0 * cross, n_valid_ref)
    _subtile_mins(d, out_ref)
    codes_out_ref[:] = H.astype(jnp.uint8)


def _codes_mins_kernel(q_ref, u_ref, cwbd_ref, n_valid_ref, dig_ref,
                       codes_ref, out_ref, codes_out_ref, oh_ref, *,
                       int16=False):
    _scan_tail(codes_ref[:].astype(jnp.int32), q_ref, cwbd_ref,
               n_valid_ref, out_ref, codes_out_ref, oh_ref,
               u_ref=u_ref,
               dig_ref=(dig_ref if cwbd_ref.dtype == jnp.int8
                        and not int16 and not _no_dig() else None),
               int16=int16)


def _shift_right(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """Lanes j <- j-s along axis 1; first s lanes = fill."""
    rolled = pltpu.roll(x, s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(cols >= s, rolled, fill)


def _delta_mins_kernel(q_ref, u_ref, cwbd_ref, n_valid_ref, dig_ref,
                       rd_ref, ovf_ref, out_ref, codes_out_ref,
                       oh_ref, *, S: int, int16=False):
    """Delta-tile decode + scan.  rd [1, P+S, TILE] u8 (P = ceil(M/8)
    mask planes); ovf [1, M, Cap] u8.  See ``delta_tiles.py``.

    Decode runs **rows-on-lanes** ([M, TILE] / [1, TILE] registers, 8x
    fewer vregs than rows-on-sublanes) so the prefix scans and
    forward-fill rolls are cheap; one [M, TILE] transpose hands the
    codes to the shared grouped scan tail.  (A transpose-free variant —
    one-hot built [Mg*K, TILE] + dot_general contracting dim 0, codes
    echo via a nibble-values matmul — measured 3 ms/batch SLOWER at
    B=512: the narrow-output echo dot breaks the MXU pipeline, while
    the transpose hides under the matmuls.  /tmp A/B, v5e, 1M rows.)
    """
    M = ovf_ref.shape[1]
    Cap = ovf_ref.shape[2]
    P = (M + 7) // 8
    rd = rd_ref[0].astype(jnp.int32)                       # [P+S, TILE]
    planes = []
    for p in range(P):
        mp = min(8, M - 8 * p)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
        planes.append((rd[p:p + 1, :] >> iota_p) & 1)
    bitm = (jnp.concatenate(planes, axis=0) if P > 1
            else planes[0])                                # [M, TILE]
    # exclusive prefix over the M sublanes: strictly-lower-tri matmul
    # (values <= 16, exact in bf16): rank[m] = sum_{m'<m} bitm[m']
    tri = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
           ).astype(jnp.bfloat16)
    rank = jnp.dot(tri, bitm.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    nd = jnp.sum(bitm, axis=0, keepdims=True)              # [1, TILE]
    is_ovf = nd > S

    # overflow rank: exclusive prefix sum along the lanes via a
    # log2(TILE)-step Hillis-Steele roll chain ([1, TILE] registers —
    # ~10 dependent VPU ops on 8 vregs, measured free; the previous
    # [TILE, TILE] triangular-matmul formulation held 4 MB of VMEM)
    acc = is_ovf.astype(jnp.int32)
    s = 1
    while s < TILE:
        acc = acc + _shift_right(acc, s, 0)
        s *= 2
    ovf_rank = acc - is_ovf.astype(jnp.int32)              # [1, TILE]

    # scatter fixed slots into the hole matrix
    H = jnp.full((M, TILE), -1, jnp.int32)
    fixed = (bitm == 1) & jnp.logical_not(is_ovf)
    for j in range(S):
        vj = rd[P + j:P + j + 1, :]                        # [1, TILE]
        H = jnp.where(fixed & (rank == j), vj, H)

    # scatter overflow full codes via one-hot matmul (code values
    # <= 255 are exact in bf16)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (Cap, 1), 0)
    ohov = ((ovf_rank == iota_c) & is_ovf).astype(jnp.bfloat16)
    ovf_bf = ovf_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
    hov = jnp.dot(ovf_bf, ohov,
                  preferred_element_type=jnp.float32)      # [M, TILE]
    H = jnp.where(is_ovf, hov.astype(jnp.int32), H)

    # forward-fill along the lanes (log2(TILE) steps)
    s = 1
    while s < TILE:
        H = jnp.where(H >= 0, H, _shift_right(H, s, -1))
        s *= 2

    _scan_tail(H.T, q_ref, cwbd_ref, n_valid_ref, out_ref,
               codes_out_ref, oh_ref, u_ref=u_ref,
               dig_ref=(dig_ref if cwbd_ref.dtype == jnp.int8
                        and not int16 and not _no_dig() else None),
               int16=int16)


def _stream_mins_kernel(meta_ref, q_ref, u_ref, cwbd_ref, n_valid_ref,
                        rd_ref, ut_ref, dig_ref, vals_ref, out_ref,
                        codes_out_ref, oh_ref, win_ref, sem_ref, *,
                        M: int, W_A: int, nt: int, int16=False):
    """Stream-tile decode + scan (format v2, ``stream_tiles.py``).

    rd [1, P, TILE] u8 mask planes; vals [A, 8, 128] u8 stays in HBM
    (``pl.ANY``) — each tile's value window is DMA'd at a dynamic
    offset (``meta`` [2, nT] SMEM: w0 group, rem), double-buffered so
    tile i+1's fetch overlaps tile i's decode+matmul.

    Row values are reconstructed with a two-level one-hot gather over
    the chunk structure (position p -> chunk e = p//8, lane l = p%8):
    per gather plane g, an [128, TILE] chunk-column one-hot feeds W_A
    narrow [8, 128] x [128, TILE] matmuls (window-group selection is a
    [1, TILE] mask multiply), then a roll-select aligns each row's
    first value to plane 0 and a rank-select scatters values to their
    subspaces.  Decode cost is independent of the stream density —
    dense tiles only grow the DMA window.
    """
    P = (M + 7) // 8
    G = (7 + M + 7) // 8          # 8-value chunks one row can span
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(meta_ref[0, 0], W_A)],
            win_ref.at[0], sem_ref.at[0]).start()

    @pl.when(i + 1 < nt)
    def _():
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(meta_ref[0, i + 1], W_A)],
            win_ref.at[nxt_slot], sem_ref.at[nxt_slot]).start()

    pltpu.make_async_copy(
        vals_ref.at[pl.ds(meta_ref[0, i], W_A)],
        win_ref.at[slot], sem_ref.at[slot]).wait()

    hi = _stream_decode(rd_ref[0].astype(jnp.int32),
                        win_ref[slot], meta_ref[1, i], M,
                        ut=None if _no_ut() else ut_ref[:])

    _scan_tail(hi.T, q_ref, cwbd_ref, n_valid_ref,
               out_ref, codes_out_ref, oh_ref, u_ref=u_ref,
               dig_ref=(dig_ref if cwbd_ref.dtype == jnp.int8
                        and not int16 and not _no_dig() else None),
               int16=int16)


def _stream_decode(rd, win, rem_i, M: int, ut=None):
    """Decode one stream tile: mask planes + value window -> codes
    H [M, TILE] i32.  rd [P, TILE] i32; win [W_A, 8, 128] u8 (the
    tile's DMA'd value window); rem_i scalar i32 (in-window start);
    ut optional [TILE, TILE] strict-upper-tri int8 — when given, the
    per-lane offset prefix sum runs as ONE int8 MXU matmul instead of
    the 10-step Hillis roll chain (measured -0.3 ms/batch at 1M)."""
    P = (M + 7) // 8
    G = (7 + M + 7) // 8
    W_A = win.shape[0]
    if _stage_iso() == "nodecode":
        return jnp.broadcast_to(rd[:1] & 127, (M, rd.shape[1]))
    planes = []
    for p in range(P):
        mp = min(8, M - 8 * p)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
        planes.append((rd[p:p + 1, :] >> iota_p) & 1)
    bitm = (jnp.concatenate(planes, axis=0) if P > 1
            else planes[0])                                # [M, TILE]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
           ).astype(jnp.bfloat16)
    rank = jnp.dot(tri, bitm.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    nd = jnp.sum(bitm, axis=0, keepdims=True)              # [1, TILE]

    if ut is not None:
        p0 = jnp.dot(nd.astype(jnp.int8), ut,
                     preferred_element_type=jnp.int32) + rem_i
    else:
        acc = nd
        s = 1
        while s < TILE:
            acc = acc + _shift_right(acc, s, 0)
            s *= 2
        p0 = (acc - nd) + rem_i                            # [1, TILE]
    e0 = p0 // 8
    a0 = p0 % 8

    if _stage_iso() == "novg":
        # stub the two-level value gather, keep p0/rank/forward-fill
        v = jnp.broadcast_to((p0 & 127).astype(jnp.float32),
                             (M, TILE))
        h = jnp.zeros((M, TILE), jnp.float32)
        for u in range(M):
            h = h + v[u:u + 1] * (rank == u).astype(jnp.float32)
        hi = jnp.where(bitm == 1, h.astype(jnp.int32), -1)
        s = 1
        while s < TILE:
            hi = jnp.where(hi >= 0, hi, _shift_right(hi, s, -1))
            s *= 2
        return hi
    winb = win.astype(jnp.int32).astype(jnp.bfloat16)  # [W_A, 8, 128]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, TILE), 0)
    ys = []
    for g in range(G):
        e_g = e0 + g
        w_g = e_g // 128
        # NOTE: deriving ohc for g>0 by a sublane roll of g=0's
        # one-hot fails to lower (Mosaic: "Rotate with non-32-bit
        # data" on bf16 vectors); each g keeps its own compare
        ohc = (iota_c == e_g % 128).astype(jnp.bfloat16)
        yg = jnp.zeros((8, TILE), jnp.float32)
        for w in range(W_A):
            tw = jnp.dot(winb[w], ohc,
                         preferred_element_type=jnp.float32)
            yg = yg + tw * (w_g == w).astype(jnp.float32)
        ys.append(yg)
    yc = jnp.concatenate(ys, axis=0)                       # [G*8, TILE]

    gt = G * 8
    v = jnp.zeros((M, TILE), jnp.float32)
    for s_ in range(8):
        r = pltpu.roll(yc, (gt - s_) % gt, axis=0) if s_ else yc
        v = v + r[:M] * (a0 == s_).astype(jnp.float32)

    h = jnp.zeros((M, TILE), jnp.float32)
    for u in range(M):
        h = h + v[u:u + 1] * (rank == u).astype(jnp.float32)
    hi = jnp.where(bitm == 1, h.astype(jnp.int32), -1)     # [M, TILE]

    s = 1
    while s < TILE:
        hi = jnp.where(hi >= 0, hi, _shift_right(hi, s, -1))
        s *= 2
    return hi


def _stream_mins_pipelined_kernel(meta_ref, q_ref, u_ref, cwbd_ref,
                                  n_valid_ref, rd_ref, ut_ref,
                                  dig_ref, vals_ref, out_ref,
                                  codes_out_ref, oh_ref, win_ref,
                                  sem_ref, *, M: int, W_A: int,
                                  nt: int):
    """Software-pipelined stream kernel (G == 1 subspace groups).

    Grid has nt+1 steps.  Step i DECODES tile i (stream gather,
    forward fill, one-hot build into ``oh_ref[i % 2]`` — VPU-dominated)
    and SCANS tile i-1 (decode/cross matmuls + subtile mins over
    ``oh_ref[(i-1) % 2]`` — MXU-dominated).  The two phases touch
    disjoint buffers and run STRAIGHT-LINE (no pl.when around compute:
    conditional regions fence Mosaic's scheduler — a pl.when-phased
    variant measured 6.4 ms vs 5.6 serial), so the VPU decode chain
    interleaves with the MXU matmuls.  The boundary steps decode/scan
    sacrificial padding blocks instead of branching: the caller pads
    ``row_data``/``meta`` with a dummy tile and slices one garbage
    block off each output (see ``fused_stream_mins``).  This is the
    TPU analog of the reference overlapping its O_DIRECT refill with
    the scan loop (``deltapq_create_approx_tree.h:2805-2984``).
    """
    K = cwbd_ref.shape[0] // M
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nxt_slot = jax.lax.rem(i + 1, 2)
    int8_mode = cwbd_ref.dtype == jnp.int8
    oh_dtype = jnp.int8 if int8_mode else jnp.bfloat16

    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(meta_ref[0, 0], W_A)],
            win_ref.at[0], sem_ref.at[0]).start()

    @pl.when(i < nt)
    def _():
        # tile nt is the caller's dummy (meta pad = 0 -> a valid
        # window at the stream head); started at step nt-1, waited at
        # step nt, decoded into the sacrificial output block
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(meta_ref[0, i + 1], W_A)],
            win_ref.at[nxt_slot], sem_ref.at[nxt_slot]).start()

    pltpu.make_async_copy(
        vals_ref.at[pl.ds(meta_ref[0, i], W_A)],
        win_ref.at[slot], sem_ref.at[slot]).wait()

    # Interleave the two phases for MXU/VPU overlap: ISSUE the scan's
    # decode matmul on tile i-1's one-hot first, run the decode chain
    # for tile i (a long VPU dependency chain independent of the
    # matmul), and only then CONSUME the matmul results.  A
    # phase-sequential body measured as the exact sum of the two
    # phases (6.15 ms = 3.32 scan + 2.8 decode at 1M/B=512): Mosaic
    # issues in program order and the scan's VPU tail stalls on its
    # matmuls, so the ordering below is what buys the overlap.

    # -- scan(i-1) part 1: issue the decode matmul ---------------------
    # (step 0 scans uninitialized scratch into the sliced-off block)
    oh = oh_ref[nxt_slot]
    if int8_mode:
        xq = jnp.dot(oh, cwbd_ref[:],
                     preferred_element_type=jnp.int32)
    else:
        xq = jnp.dot(oh, cwbd_ref[:],
                     preferred_element_type=jnp.float32)

    # -- decode(i): VPU chain, independent of xq ----------------------
    hi = _stream_decode(rd_ref[0].astype(jnp.int32),
                        win_ref[slot], meta_ref[1, i], M,
                        ut=None if _no_ut() else ut_ref[:])
    H = hi.T                                               # [TILE, M]
    codes_out_ref[:] = H.astype(jnp.uint8)

    # -- scan(i-1) part 2: consume xq, issue the cross matmul ---------
    if int8_mode:
        x8 = xq.astype(jnp.int8)
        if _no_dig():
            pre = jnp.sum(xq * xq, axis=1,
                          keepdims=True).astype(jnp.float32)
        else:
            # ||xhat||^2 via the 3-digit int8 norm matmul
            # (see _scan_tail)
            xd = jnp.dot(oh, dig_ref[:],
                         preferred_element_type=jnp.int32)
            pre = ((xd[:, 2:3] * 128 + xd[:, 1:2]) * 128
                   + xd[:, 0:1]).astype(jnp.float32)
        cross = jnp.dot(x8, q_ref[:],
                        preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * u_ref[:]
    else:
        pre = jnp.sum(xq * xq, axis=1, keepdims=True)
        cross = jnp.dot(xq.astype(jnp.bfloat16), q_ref[:],
                        preferred_element_type=jnp.float32)

    # -- decode(i): one-hot build (independent of cross) --------------
    ct = _oh_cmp_dtype()
    iota_k = jax.lax.broadcasted_iota(
        jnp.int32, (TILE, K), 1).astype(ct)
    Hc = H.astype(ct)
    for m in range(M):
        oh_ref[slot, :, m * K:(m + 1) * K] = (
            Hc[:, m:m + 1] == iota_k).astype(oh_dtype)

    # -- scan(i-1) tail: subtile mins ----------------------------------
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    base = (i - 1) * TILE
    d = jnp.where(base + rows < n_valid_ref[0, 0],
                  pre - 2.0 * cross, jnp.inf)
    _subtile_mins(d, out_ref)


def _upper_tri_i8() -> jnp.ndarray:
    """[TILE, TILE] strict upper triangle, int8: ``nd @ ut`` is the
    exclusive prefix sum of nd over lanes as one MXU matmul."""
    r = jnp.arange(TILE, dtype=jnp.int32)
    return (r[:, None] < r[None, :]).astype(jnp.int8)


def _norm_digits(cwbd: jnp.ndarray) -> jnp.ndarray:
    """Per-codeword ||.||^2 as 3 base-128 int8 digits, [MKs, 8]
    (lanes 3-7 zero).  Exact: max norm^2 = 127^2 * Dg <= 128^3 - 1
    for Dg <= 128.  In bf16 mode the kernel ignores this operand."""
    if cwbd.dtype == jnp.int8:
        n = jnp.sum(jnp.square(cwbd.astype(jnp.int32)), axis=1)
    else:
        n = jnp.zeros((cwbd.shape[0],), jnp.int32)
    d0 = n % 128
    d1 = (n // 128) % 128
    d2 = n // (128 * 128)
    z = jnp.zeros_like(d0)
    return jnp.stack([d0, d1, d2, z, z, z, z, z],
                     axis=1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("e_max", "M", "int16"))
def fused_stream_mins(q: jnp.ndarray, cwbd: jnp.ndarray,
                      row_data: jnp.ndarray, vals: jnp.ndarray,
                      meta: jnp.ndarray, n_valid: jnp.ndarray,
                      e_max: int, M: int,
                      u: Optional[jnp.ndarray] = None,
                      int16: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stream tier: row_data [nT, P, TILE] u8 mask planes; vals
    [A, 8, 128] u8 packed value stream (HBM-resident, windowed by
    DMA); meta [2, nT] i32.  Returns (mins [NS, B] f32, decoded codes
    [N_pad, M] u8)."""
    from .stream_tiles import window_groups

    D, B = q.shape
    if u is None:
        u = jnp.ones((1, B), jnp.float32)
    nt, P, _ = row_data.shape
    MKs = cwbd.shape[0]
    G_, Mg = _groups_of(M)
    W_A = window_groups(M, e_max)
    ns = TILE // SUB
    MgK = MKs // G_
    oh_dtype = jnp.int8 if cwbd.dtype == jnp.int8 else jnp.bfloat16
    # G == 1 (M <= 8, the headline config): software-pipelined variant —
    # grid nt+1, step i decodes tile i while scanning tile i-1 from the
    # double-buffered one-hot scratch, all straight-line (pl.when
    # around compute fences the Mosaic scheduler — measured slower
    # than serial).  Inputs gain a dummy tile (row_data zeros, meta 0)
    # and each output one sacrificial block, sliced off below.
    # measured on-chip (tools/bench_stream_knobs.py, 1M/B=512 int8):
    # serial+prefix-matmul 5.49 ms vs pipelined 5.70/6.19 — the
    # hand-interleaved pipeline loses once the offset prefix sum runs
    # on the MXU (it serializes against the scan matmuls), so serial
    # is the default and the pipeline stays behind an env knob
    pipelined = (G_ == 1 and not _interpret() and not int16
                 and bool(os.environ.get("DELTAPQ_STREAM_PIPELINED")))
    nsteps = nt + 1 if pipelined else nt
    if pipelined:
        kernel = functools.partial(_stream_mins_pipelined_kernel,
                                   M=M, W_A=W_A, nt=nt)
        row_data = jnp.concatenate(
            [row_data, jnp.zeros((1, P, TILE), row_data.dtype)],
            axis=0)
        meta = jnp.concatenate(
            [meta, jnp.zeros((2, 1), meta.dtype)], axis=1)
        oh_scratch = pltpu.VMEM((2, TILE, MgK), oh_dtype)
    else:
        kernel = functools.partial(_stream_mins_kernel,
                                   M=M, W_A=W_A, nt=nt, int16=int16)
        oh_scratch = pltpu.VMEM((TILE, MgK), oh_dtype)
    mins, codes = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((2, meta.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((D, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MKs, cwbd.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MKs, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ns, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps * ns, B), jnp.float32),
            jax.ShapeDtypeStruct((nsteps * TILE, M), jnp.uint8),
        ],
        scratch_shapes=[
            oh_scratch,
            pltpu.VMEM((2, W_A, 8, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * TILE * (MKs * cwbd.shape[1] + D * B),
            bytes_accessed=nt * (P * TILE + W_A * 1024)
            + MKs * cwbd.shape[1] * 2 + D * B * 2
            + nt * ns * B * 4 + nt * TILE * M,
            transcendentals=0),
        # the M=16 (2-group) shape carries ~17 MB of operands+scratch,
        # just past the default 16 MB scoped-vmem budget — raise it
        # (v5e has 128 MB of VMEM; measured necessary for GIST shape)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(meta, q, u, cwbd, jnp.asarray(n_valid, jnp.int32).reshape(1, 1),
      row_data, _upper_tri_i8(), _norm_digits(cwbd), vals)
    if pipelined:
        # mins block i = scan of tile i-1 (block 0 is the step-0
        # garbage scan); codes block i = decode of tile i (block nt is
        # the dummy tile)
        return mins[ns:], codes[:nt * TILE]
    return mins, codes


def quantize_blockdiag_int8(cwbd_bf16_or_cw, center=None):
    """Codebook -> (int8 block-diagonal decode matrix, scale).  Values
    quantize symmetrically at scale = max|c|/127; the int8 tiers use
    it for 2x-rate MXU decode+distance with shortlist-only precision."""
    if cwbd_bf16_or_cw.ndim == 3:
        cwbd = build_blockdiag_codebook(cwbd_bf16_or_cw,
                                        center=center,
                                        dtype=np.float32)
    else:
        cwbd = np.asarray(cwbd_bf16_or_cw, np.float32)
    scale = max(float(np.abs(cwbd).max()) / 127.0, 1e-12)
    q = np.clip(np.rint(cwbd / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_blockdiag_int16(cwbd_bf16_or_cw, center=None):
    """Codebook -> ([MKs, 2*Dg] int8 dual-digit decode matrix, scale).

    Each value quantizes at step scale/128 (scale = max|c|/127, as
    int8): A = round(c*128/scale) in [-16256, 16256], split into
    base-128 digits a = round(A/128) in [-127, 127] and b = A - 128a
    in [-64, 64] — both int8-exact.  The kernel reconstructs
    cross/pre terms exactly in the A domain (see ``_scan_tail``
    int16 mode); the 128x finer step is what makes the exactness
    certificate tight on nearly-all-distinct workloads."""
    if cwbd_bf16_or_cw.ndim == 3:
        cwbd = build_blockdiag_codebook(cwbd_bf16_or_cw,
                                        center=center,
                                        dtype=np.float32)
    else:
        cwbd = np.asarray(cwbd_bf16_or_cw, np.float32)
    scale = max(float(np.abs(cwbd).max()) / 127.0, 1e-12)
    A = np.clip(np.rint(cwbd * (128.0 / scale)), -16256, 16256)
    a = np.clip(np.rint(A / 128.0), -127, 127)
    b = A - 128.0 * a
    out = np.concatenate([a, b], axis=1).astype(np.int8)
    return out, scale


def _int16_g2() -> bool:
    """Trace-time knob: G2-packed int16 decode for M*Ds == 128.

    The standard int16 decode is ONE [TILE, M*K] x [M*K, 2*Dg=256]
    matmul (537 MMAC/tile).  When the true dims fit half the lane
    width (M*Ds == 128 -> two groups of 64), the digit planes of each
    4-subspace group pack side-by-side into exactly 128 lanes
    ([a(64)|b(64)]), so decode becomes TWO [TILE, M*K/2] x [M*K/2,
    128] matmuls = 268 MMAC/tile with full lane utilization — the
    col-sliced alternative keeps the MAC count at 537 because a
    [TILE, 64] output lane-pads to 128 anyway."""
    import os
    return os.environ.get("DELTAPQ_INT16_G2", "0") == "1"


def quantize_blockdiag_int16_g2(cw, center=None):
    """G2-packed variant of ``quantize_blockdiag_int16`` for
    M*Ds == 128: returns ([M*K, 128] int8, scale) where group
    g = m // (M/2) rows carry [a-digits(64) | b-digits(64)] of the
    group's dims, block-diagonal within the group.  Same digit values
    and scale as the standard packing (certificate math unchanged)."""
    cw = np.asarray(cw, np.float32)
    M, K, Ds = cw.shape
    assert M * Ds == 128 and M % 2 == 0, "G2 packing needs M*Ds == 128"
    Mg = M // 2
    w = Mg * Ds                                    # 64
    if center is not None:
        cwc = cw - np.asarray(center, np.float32).reshape(M, 1, Ds)
    else:
        cwc = cw
    scale = max(float(np.abs(cwc).max()) / 127.0, 1e-12)
    A = np.clip(np.rint(cwc * (128.0 / scale)), -16256, 16256)
    a = np.clip(np.rint(A / 128.0), -127, 127)
    b = A - 128.0 * a
    out = np.zeros((M * K, 2 * w), np.float32)
    for m in range(M):
        mi = m % Mg
        out[m * K:(m + 1) * K, mi * Ds:(mi + 1) * Ds] = a[m]
        out[m * K:(m + 1) * K, w + mi * Ds:w + (mi + 1) * Ds] = b[m]
    return out.astype(np.int8), scale


def int16_digits_to_values(q16: np.ndarray, scale: float) -> np.ndarray:
    """Inverse of ``quantize_blockdiag_int16`` digit packing: [R, 2*Dg]
    int8 -> [R, Dg] f32 reconstructed values (step scale/128)."""
    q16 = np.asarray(q16, np.float32)
    Dg = q16.shape[1] // 2
    return (128.0 * q16[:, :Dg] + q16[:, Dg:]) * (scale / 128.0)


def _mins_call(kernel, data_specs, data_args, q, cwbd, n_valid, nt, M,
               extra_flops=0, u=None):
    """Shared pallas_call plumbing for the codes/delta tiers.  The
    one-hot scratch is per subspace group ([TILE, Mg*K], reused across
    the G groups — see ``group_geometry``).  ``u`` [1, B] f32 is the
    per-query int8 quantization headroom (ones when absent)."""
    D, B = q.shape
    if u is None:
        u = jnp.ones((1, B), jnp.float32)
    MKs = cwbd.shape[0]                  # G * Mg * K slot rows
    G, Mg = _groups_of(M)
    MgK = MKs // G
    ns = TILE // SUB
    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((D, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MKs, cwbd.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((MKs, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *data_specs,
        ],
        out_specs=[
            pl.BlockSpec((ns, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt * ns, B), jnp.float32),
            jax.ShapeDtypeStruct((nt * TILE, M), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM(
            (TILE, MgK),
            jnp.int8 if cwbd.dtype == jnp.int8 else jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * TILE * (MKs * cwbd.shape[1] + D * B)
            + extra_flops,
            bytes_accessed=nt * TILE * M + MKs * cwbd.shape[1] * 2
            + D * B * 2 + nt * ns * B * 4 + nt * TILE * M,
            transcendentals=0),
        interpret=_interpret(),
    )(q, u, cwbd, jnp.asarray(n_valid, jnp.int32).reshape(1, 1),
      _norm_digits(cwbd), *data_args)


@functools.partial(jax.jit, static_argnames=("int16",))
def fused_codes_mins(q: jnp.ndarray, cwbd: jnp.ndarray,
                     codes: jnp.ndarray, n_valid: jnp.ndarray,
                     u: Optional[jnp.ndarray] = None,
                     int16: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codes tier: q [D, B] bf16; cwbd [M*K, D] bf16; codes [N_pad, M]
    u8.  Returns (mins [NS, B] f32, codes_echo [N_pad, M] u8)."""
    n_pad, M = codes.shape
    nt = n_pad // TILE
    return _mins_call(
        functools.partial(_codes_mins_kernel, int16=int16),
        [pl.BlockSpec((TILE, M), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)],
        [codes], q, cwbd, n_valid, nt, M, u=u)


@functools.partial(jax.jit, static_argnames=("S", "int16"))
def fused_delta_mins(q: jnp.ndarray, cwbd: jnp.ndarray,
                     row_data: jnp.ndarray, ovf: jnp.ndarray,
                     n_valid: jnp.ndarray, S: int,
                     u: Optional[jnp.ndarray] = None,
                     int16: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Delta tier: row_data [nT, P+S, TILE] u8; ovf [nT, M, Cap] u8.
    Returns (mins [NS, B] f32, decoded codes [N_pad, M] u8)."""
    nt = row_data.shape[0]
    M, Cap = ovf.shape[1], ovf.shape[2]
    P = (M + 7) // 8
    return _mins_call(
        functools.partial(_delta_mins_kernel, S=S, int16=int16),
        [pl.BlockSpec((1, P + S, TILE), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, M, Cap), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)],
        [row_data, ovf], q, cwbd, n_valid, nt, M,
        extra_flops=2 * nt * TILE * Cap * M, u=u)


# --------------------------------------------------------------------------
# Shared epilogue: subtile select + exact rerank
# --------------------------------------------------------------------------

_RERANK_BQ = 8   # queries per rerank grid step


def _rerank_kernel(tabT_ref, codes_ref, out_ref, *, st: int, M: int,
                   K: int, bq: int):
    """Exact per-candidate ADC table sums: one (bq queries x st rows)
    strip per step.  codes [bq, st, M] u8; tab [bq, M*K] f32; out
    [bq, st, 1] f32 = sum_m T[q, m, code(q, row, m)] accumulated in
    ascending-m order — BIT-EXACT the plain scan's f32 sums (each
    one-hot select sums K-1 zeros + 1 exact f32 value).

    Why a kernel: XLA lowers the per-query einsum rerank to batched
    [S, K] @ [K, 1] matvecs — output width 1, so the MXU runs ~1/128
    utilized and S=4096 costs ~12 ms/batch.  The lookup is 1 table
    read per (row, m): a VPU compare+select+reduce over [st, K] strips
    (table row [1, K] broadcast down the sublanes, reduced across the
    lanes) is the minimal-work formulation; candidates differ per
    query, so no shared-operand matmul form exists — the contrast with
    ``exact_all_topk`` where they are shared.  Fixed strip size keeps
    compile time per rung shape constant (a single-block variant at
    S=8192 blew up Mosaic scheduling)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (K, st), 0)
    for j in range(bq):
        hj = codes_ref[j].astype(jnp.int32)              # [M, st]
        acc = jnp.zeros((1, st), jnp.float32)
        for m in range(M):
            oh = hj[m:m + 1, :] == iota                  # [K, st]
            t = tabT_ref[0, m * K:(m + 1) * K, j:j + 1]  # [K, 1]
            acc = acc + jnp.sum(
                jnp.where(oh, t, 0.0), axis=0, keepdims=True)
        out_ref[j:j + 1, :] = acc


@jax.jit
def rerank_table_sums(tab_flat: jnp.ndarray, cand_codes: jnp.ndarray
                      ) -> jnp.ndarray:
    """tab_flat [B, M*K] f32; cand_codes [B, M, S] u8 (candidate rows
    on the TRAILING axis) -> exact f32 distances [B, S] (ascending-m
    f32 table sums, identical values to the plain scan's).

    Layout note: every array keeps a >=128 (or whole-dim) trailing
    axis — a [B, S, M] candidate layout or [B, S, 1] output would get
    lane-padded 16-128x by the TPU tiling (a 128 MB cap-rung output
    materialized 16 GB and OOM'd HBM)."""
    B, MK = tab_flat.shape
    _, M, S = cand_codes.shape
    K = MK // M
    if S <= 1024:
        st, Sp = S, S
    else:
        # strip size must divide S; pad S up rather than run a
        # whole-S block (a 28640-candidate cap rung as one block
        # needed 42 MB of scoped VMEM and failed to compile)
        st = next((d for d in (1024, 512, 256, 128) if S % d == 0),
                  None)
        if st is None:
            st, Sp = 1024, -(-S // 1024) * 1024
            cand_codes = jnp.concatenate(
                [cand_codes,
                 jnp.zeros((B, M, Sp - S), cand_codes.dtype)],
                axis=2)
        else:
            Sp = S
    bq = _RERANK_BQ
    pad = (-B) % bq
    if pad:
        tab_flat = jnp.concatenate(
            [tab_flat, jnp.zeros((pad, MK), tab_flat.dtype)], axis=0)
        cand_codes = jnp.concatenate(
            [cand_codes,
             jnp.zeros((pad, M, Sp), cand_codes.dtype)], axis=0)
    Bp = B + pad
    # [Bp/bq, MK, bq]: trailing dims whole -> no tile padding, and the
    # kernel reads [K, 1] table columns with static slices
    tabT = tab_flat.reshape(Bp // bq, bq, MK).transpose(0, 2, 1)
    out = pl.pallas_call(
        functools.partial(_rerank_kernel, st=st, M=M, K=K, bq=bq),
        grid=(Bp // bq, Sp // st),
        in_specs=[
            pl.BlockSpec((1, MK, bq), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, M, st), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, st), lambda i, s: (i, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * S * M * K,
            bytes_accessed=B * MK * 4 + B * S * M + B * S * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(tabT, cand_codes)
    return out[:B, :S]

def _fence_margin(fence: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """bf16-matmul-domain error allowance for the exactness
    certificate.  The subtile mins come from bf16 operands (~2^-8
    relative on ``precomp`` and ``cross``, which are O(distance + q2)
    before cancellation), so the allowance scales with the full
    pre-cancellation magnitude, not the small final distance."""
    return 0.02 * (jnp.abs(fence) + q2 + 1.0)


@functools.partial(jax.jit, static_argnames=("pool",))
def pool_mins_nb(mins_nb: jnp.ndarray, pool: int) -> jnp.ndarray:
    """Min-pool kernel-layout mins [NS, B] by ``pool`` along NS, then
    transpose -> [B, NS/pool].

    Pooling BEFORE the transpose reads the kernel's native layout with
    a contiguous-row reduce and shrinks the relayout ``pool``x — the
    [B, NS] transpose is otherwise the selection epilogue's largest
    memory move (64 MB at N=1M/B=512)."""
    NS, B = mins_nb.shape
    pad = (-NS) % pool
    if pad:
        mins_nb = jnp.concatenate(
            [mins_nb, jnp.full((pad, B), jnp.inf, mins_nb.dtype)],
            axis=0)
    return jnp.min(mins_nb.reshape(-1, pool, B), axis=1).T


def _select_units(mins: jnp.ndarray, n_sub: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the ``n_sub`` candidate units and the exactness fence from
    pooled mins [B, NU].  Returns (sub_ids [B, n_sub], fence [B]) with
    the invariant: every unit NOT in ``sub_ids`` has min >= fence.

    Large NU runs a two-level exact selection (VERDICT r3 weak #4: the
    flat [B, NU] top_k went super-linear at 20M+ rows, NU ~ 78K):
    coarse-pool by C, top-(nc+1) coarse groups (coarse fence bounds
    every unit outside them), then top-(n_sub+1) among the selected
    groups' units (fine fence bounds the unselected units inside).
    fence = min(coarse, fine) keeps the certificate exact even though
    the candidate set may miss a globally-top unit: any such miss is
    caught by the fence check and escalates, never mis-reports."""
    B, NU = mins.shape
    C = 16
    nc = min(max(4 * n_sub, 64), NU // C - 1)
    if NU <= 16384 or nc < 1 or nc * C <= n_sub:
        neg, sub_ids = jax.lax.top_k(-mins, n_sub + 1)
        return sub_ids[:, :n_sub], -neg[:, n_sub]
    pad = (-NU) % C
    if pad:
        mins = jnp.concatenate(
            [mins, jnp.full((B, pad), jnp.inf, mins.dtype)], axis=1)
    mc = mins.reshape(B, -1, C)                      # [B, NC, C]
    cmins = jnp.min(mc, axis=2)                      # [B, NC]
    negc, cids = jax.lax.top_k(-cmins, nc + 1)
    cfence = -negc[:, nc]
    cids = cids[:, :nc]
    fine = jnp.take_along_axis(
        mc, cids[:, :, None], axis=1)                # [B, nc, C]
    negf, fpos = jax.lax.top_k(-fine.reshape(B, nc * C), n_sub + 1)
    ffence = -negf[:, n_sub]
    fpos = fpos[:, :n_sub]
    sub_ids = (jnp.take_along_axis(cids, fpos // C, axis=1) * C
               + fpos % C)
    return sub_ids, jnp.minimum(cfence, ffence)


@functools.partial(jax.jit,
                   static_argnames=("top_k", "n_sub", "pool",
                                    "prepooled"))
def select_rerank(mins: jnp.ndarray, q2: jnp.ndarray, table: jnp.ndarray,
                  codes: jnp.ndarray, n_valid: jnp.ndarray, top_k: int,
                  n_sub: int, pool: int = 1, prepooled: bool = False,
                  err_r: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Candidate selection + exact rerank.

    mins [B, NS] subtile minima in the q2-less matmul domain
    (``precomp - 2 cross``, +inf on padding); q2 [B] = ||q||^2; table
    [B, M, K] exact f32 ADC tables; codes [N_pad, M] u8 in scan order.
    Returns (dists [B, top_k] exact f32 ascending, rows [B, top_k]
    scan-order row ids, ok [B] exactness certificate).

    ``pool`` min-pools the subtile mins by that factor first, making
    the candidate unit ``SUB*pool`` rows — the [B, NS] exact top_k is
    the epilogue's dominant cost at large N, and pooling divides it
    while keeping the fence bound valid (a pooled min lower-bounds all
    its rows).

    Candidates = the union of the ``n_sub`` smallest units' rows.
    Certificate: every row of an unselected unit has approximate
    distance >= the (n_sub+1)-th unit min (the fence); the result is
    certified exact only when the reranked k-th distance clears the
    fence with the bf16 error margin *subtracted* (conservative: a
    false "not exact" triggers the caller's escalation, a false "exact"
    would be an error).  Engines escalate n_sub on failure and fall
    back to a full exact scan, so reported results are always exact
    (modulo equal-distance ties, as in the reference).
    """
    B, NS = mins.shape
    M, K = table.shape[1], table.shape[2]
    unit = SUB * pool
    if pool > 1 and not prepooled:
        pad = (-NS) % pool
        if pad:
            mins = jnp.concatenate(
                [mins, jnp.full((B, pad), jnp.inf, mins.dtype)], axis=1)
        mins = jnp.min(mins.reshape(B, -1, pool), axis=2)
    S = n_sub * unit
    sub_ids, fence = _select_units(mins, n_sub)
    rows = (sub_ids[:, :, None] * unit
            + jnp.arange(unit, dtype=jnp.int32)[None, None, :]
            ).reshape(B, S)
    # gather candidate codes at BLOCK granularity: B*n_sub contiguous
    # unit-row slices instead of B*S scattered rows (~8x fewer gather
    # descriptors — the row gather dominates the epilogue otherwise).
    # The gather view keeps a 128+-lane trailing axis (unit*M) — a
    # [..., unit, M] shape would be lane-padded 16x by the TPU tiling
    # (4 GB at the cap rung, measured OOM)
    n_pad_rows = codes.shape[0]
    n_units_total = n_pad_rows // unit
    safe_units = jnp.clip(sub_ids, 0, n_units_total - 1)
    cw = codes.reshape(n_units_total, unit * M)[safe_units]
    tf = table.reshape(B, M * K)
    # exact f32 table sums via the Pallas one-hot select-reduce kernel
    # (``rerank_table_sums``): bit-exact the plain scan's values,
    # much faster than the XLA einsum form (which lowers to width-1
    # batched matvecs).  Alternatives measured SLOWER still: int8
    # bit-plane matmul (and not bit-faithful); jnp.take_along_axis
    # (184 ms vs 12 ms at S=4096 — XLA TPU serializes the batched
    # gather); the 3-digit bf16 table split that wins in
    # ``exact_all_topk`` (the BATCHED per-query one-hot rebuild
    # dominates and triples).
    cand = cw.reshape(B, S, M).transpose(0, 2, 1)    # [B, M, S]
    exact = rerank_table_sums(tf, cand)
    exact = jnp.where(rows < n_valid, exact, jnp.inf)
    # top_k can exceed the candidate pool when it approaches N (tiny
    # databases): select what exists and pad with (+inf, -1)
    k_eff = min(top_k, S)
    negd, pos = jax.lax.top_k(-exact, k_eff)
    d = -negd
    out_rows = jnp.take_along_axis(rows, pos, axis=1)
    if k_eff < top_k:
        pad = top_k - k_eff
        d = jnp.concatenate(
            [d, jnp.full((B, pad), jnp.inf, d.dtype)], axis=1)
        out_rows = jnp.concatenate(
            [out_rows, jnp.full((B, pad), -1, out_rows.dtype)], axis=1)
    if err_r is not None:
        # int8 certificate via the quantization radius: mins live in
        # the (scale^2-rescaled) quantized domain, where the int8
        # matmuls are EXACT integer arithmetic — the only error is the
        # per-dim <= scale/2 rounding of codewords and query, so
        # ||x-q|| >= ||x_q-q_q|| - r with r = err_r = scale*sqrt(D).
        # Every row of an unselected unit therefore has true distance
        # >= (sqrt(fence_true) - r)^2.  This is ~4-6x tighter than the
        # bf16 magnitude formula at large ||q||^2 (which made whole
        # batches escalate to the full exact scan on 2M+ workloads).
        ft = jnp.maximum(fence + q2, 0.0)
        bound = jnp.maximum(jnp.sqrt(ft) - err_r, 0.0) ** 2
        ok = d[:, k_eff - 1] <= bound
    else:
        ok = (d[:, k_eff - 1] - q2) <= fence - _fence_margin(fence, q2)
    return d, out_rows, ok
