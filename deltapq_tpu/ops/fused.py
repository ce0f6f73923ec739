"""Fused-scan engines: the production query tiers.

Three engines over the shared fused Pallas kernels
(``fused_pallas.py``) + exact-rerank epilogue.  All report **exact f32
ADC distances** (identical to the reference plain scan's values) and
carry a per-query exactness certificate:

======================  ============  =================================
engine                  HBM B/vec     kernel input
======================  ============  =================================
FusedDecodedEngine      D*2 + 4       bf16 decoded cache (fastest)
FusedCodesEngine        M             u8 codes, one-hot decode on MXU
FusedCompressedEngine   1+diffs/row   stream tiles (mask planes + one
                        (data-dep.)   packed value stream), decoded
                                      fully in-kernel; fmt="slots"
                                      keeps the fixed-slot v1 tiles
======================  ============  =================================

The compressed engine is the TPU realization of the reference's
compressed-stream query
(``query_processing_scan_compressed_codes_opt_o_direct``,
``deltapq_create_approx_tree.h:2805-2984``): same information content
(DFS-ordered diffs), decoded tile-parallel instead of stack-serial.
Its rerank reads the kernel's own decoded-codes output, so no plain
code array needs to stay resident.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .adc import adc_table
from .decoded import build_decoded_cache
from .delta_tiles import TILE, DeltaTiles, build_delta_tiles
from .stream_tiles import StreamTiles, build_stream_tiles
from . import fused_pallas as fp


def _pad_queries(queries: np.ndarray, d_pad: int, b_mult: int = 128
                 ) -> Tuple[np.ndarray, int]:
    q = np.asarray(queries, np.float32)
    b = q.shape[0]
    b_pad = -(-b // b_mult) * b_mult
    out = np.zeros((b_pad, d_pad), np.float32)
    out[:b, :q.shape[1]] = q
    return out, b


def _pool_for(ns_total: int) -> int:
    """Min-pool factor for the selection epilogue: coarsen the
    candidate unit so the [B, NS/pool] top_k + relayout stay small.
    On-chip sweep at 1M/B=512 (stream tier): pool 1/2/4/8 = 6.91 /
    6.92 / 6.58 / 7.16 ms — 4 balances the top_k+transpose saving
    against the larger rerank unit, so 4 is the mid-range default;
    tiny databases keep exact unit granularity and huge ones coarsen
    8x.  The fence bound stays valid at any pool (a pooled min
    lower-bounds all its rows); a coarser fence only costs escalation
    frequency, never exactness."""
    import os
    if os.environ.get("DELTAPQ_POOL"):       # epilogue experiments
        return int(os.environ["DELTAPQ_POOL"])
    if ns_total <= 4096:
        return 1
    return 8 if ns_total > 131072 else 4


def _default_n_sub(top_k: int, n_units: int, unit: int) -> int:
    """Candidate unit count: 16x over-provision of top_k rows, at
    least 2 units, bounded to the database."""
    want = -(-16 * top_k // unit)
    return int(max(2, min(max(want, 256 // unit), max(n_units - 1, 1))))


def _select_with_escalation(mins_nb, q2, table, codes_dev, n_valid,
                            top_k, n_sub=None, invalid=None,
                            err_r=None, scale2=None):
    """Run select_rerank, escalating the candidate pool 4x whenever a
    query's exactness certificate fails (equal-distance pileups at the
    fence), with a terminal full exact scan.  ``mins_nb`` arrives in
    the scan kernel's native [NS, B] layout; pooling happens BEFORE
    the [B, NS] relayout (``fp.pool_mins_nb``) so the transpose moves
    ``pool``x fewer bytes.  ``invalid`` marks queries whose mins are
    untrustworthy (e.g. int8 quantization clipped the query) — their
    certificate is forced false so the terminal exact scan covers
    them.  Returns (d, rows, exact_frac_before_escalation)."""
    ns_total = mins_nb.shape[0]
    pool = _pool_for(ns_total)
    n_units = -(-ns_total // pool)
    unit = fp.SUB * pool
    ns = n_sub or _default_n_sub(top_k, n_units, unit)
    ns = min(ns, max(n_units - 1, 1))
    mins_bn = fp.pool_mins_nb(mins_nb, pool)
    if scale2 is not None:
        # int8 scale^2 rescale AFTER pooling: min-pool commutes with a
        # positive scale, and the pooled [B, NS/pool] is ``pool``x
        # smaller than the kernel-layout [NS, B] it replaces
        mins_bn = mins_bn * scale2
    # escalation ceiling: the rerank gathers ns*unit rows per query —
    # cap the candidate pool at 64k rows and fall through to the full
    # exact scan beyond that (rare: tie-saturated data)
    ns_cap = min(max(n_units - 1, 1), max(ns, 65536 // unit))
    d, rows, ok = fp.select_rerank(mins_bn, q2, table, codes_dev,
                                   n_valid, top_k, ns, pool,
                                   prepooled=True, err_r=err_r)
    if invalid is not None:
        ok = jnp.logical_and(ok, jnp.logical_not(invalid))
    first_frac = float(jnp.mean(ok))
    okh = bool(jnp.all(ok))
    while not okh and ns < ns_cap:
        # 16x rungs: realistic clustered data fails the first shot for
        # ~half the queries (quantized near-ties at the fence); a 4x
        # ladder meant 4-5 device round-trips per batch
        ns = min(ns * 16, ns_cap)
        d, rows, ok = fp.select_rerank(mins_bn, q2, table, codes_dev,
                                       n_valid, top_k, ns, pool,
                                       prepooled=True, err_r=err_r)
        if invalid is not None:
            ok = jnp.logical_and(ok, jnp.logical_not(invalid))
        okh = bool(jnp.all(ok))
    if not okh:
        from .adc import adc_query_topk

        d, rows = adc_query_topk(table, codes_dev, n_valid, top_k,
                                 TILE)
    return d, rows, first_frac


class FusedDecodedEngine:
    """Decoded-cache tier with fused subtile-min scan.

    HBM per vector: D*2 (bf16 xhat, tiled column-major) + 4 (precomp)
    + M (codes, rerank only).
    """

    def __init__(self, codewords: np.ndarray, codes: np.ndarray,
                 tile: int = 8192):
        # tile=8192 runs the mins kernel at ~87-107% of nominal v5e
        # HBM peak (0.33 ms for 256 MB at 1M rows); 1024 measures ~58%
        codewords = np.asarray(codewords, np.float32)
        M, K, Ds = codewords.shape
        self.codewords = jnp.asarray(codewords)
        self.M, self.K = M, K
        self.D = M * Ds
        self.d_pad = -(-self.D // 128) * 128
        self.n_valid = codes.shape[0]
        self.mu = np.zeros(self.d_pad, np.float32)
        self.mu[:self.D] = fp.codebook_center(codewords)
        hi, _lo, _pre = build_decoded_cache(codewords, np.asarray(codes),
                                            center=self.mu[:self.D])
        if self.d_pad != self.D:
            hi = np.concatenate(
                [hi, np.zeros((len(hi), self.d_pad - self.D),
                              hi.dtype)], axis=1)
        xt = fp.pack_xhat_tiles(np.asarray(hi), tile=tile)
        self.xt = jnp.asarray(xt)
        n_pad = xt.shape[0] * tile
        codes_p = np.zeros((n_pad, M), np.asarray(codes).dtype)
        codes_p[:self.n_valid] = codes
        self.codes = jnp.asarray(codes_p)

    def query(self, queries: np.ndarray, top_k: int = 10,
              n_sub: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        q, b = _pad_queries(queries, self.d_pad)
        qj = jnp.asarray(q)
        table = adc_table(self.codewords, qj[:, :self.D])
        qc = jnp.asarray(q - self.mu[None, :])  # centered scan domain
        q2 = jnp.sum(qc * qc, axis=1)
        mins = fp.fused_decoded_mins(qc.astype(jnp.bfloat16).T, self.xt,
                                     jnp.int32(self.n_valid))
        d, rows, frac = _select_with_escalation(
            mins, q2, table, self.codes, jnp.int32(self.n_valid),
            top_k, n_sub)
        self.last_exact_frac = frac
        return np.asarray(d[:b]), np.asarray(rows[:b])


def _int8_codeword_radius(codewords: np.ndarray, mu: np.ndarray,
                          scale: float) -> float:
    """Max over codes of the exact L2 norm of the codeword
    quantization error: sqrt(sum_m max_k ||c_mk - scale*round||^2).
    Any decoded row's quantized vector sits within this radius of its
    true decoded vector — the codeword side of the int8 exactness
    certificate."""
    cw = np.asarray(codewords, np.float32)
    M, K, Ds = cw.shape
    cwc = cw - mu[:M * Ds].reshape(M, 1, Ds)
    err = cwc - scale * np.rint(cwc / scale)
    per_mk = np.sum(err * err, axis=2)             # [M, K]
    return float(np.sqrt(per_mk.max(axis=1).sum()))


def _mins_query_args(qc: np.ndarray, precision: str, scale):
    """Centered grouped-layout queries [B, G*Dg_pad] -> (kernel q
    operand [G*Dg_pad, B] bf16/int8, invalid mask or None, headroom
    u [1, B] f32 or None).

    int8: each query is quantized at ``scale * u_b`` with
    ``u_b = max(1, max|qc_b| / (127 scale))`` — NOTHING clips (a
    codebook-only scale made 96% of realistic big-N queries clip into
    the exact-fallback path).  The kernel multiplies ``cross`` by u so
    pre/cross share the scale^2 domain.  Also returns the EXACT
    query-side rounding radius ``e_q[b] = ||qc_b - scale u_b qq_b||``
    — with the engine's precomputed codeword radius this gives a
    certificate allowance ~2-3x tighter than the worst-case
    scale*sqrt(D) bound (more first-shot passes, fewer escalations)."""
    if precision == "int8":
        amax = np.abs(qc).max(axis=1)
        u = np.maximum(1.0, amax / (127.0 * scale)).astype(np.float32)
        qq = np.clip(np.rint(qc / (scale * u[:, None])),
                     -127, 127).astype(np.int8)
        e_q = np.linalg.norm(
            qc - (scale * u[:, None]) * qq.astype(np.float32),
            axis=1).astype(np.float32)
        return (jnp.asarray(qq.T), None,
                jnp.asarray(u.reshape(1, -1)), jnp.asarray(e_q))
    return jnp.asarray(qc.astype(jnp.bfloat16).T), None, None, None


class FusedCodesEngine:
    """u8-codes tier: M bytes/vec resident; one-hot decode + matmul in
    the kernel."""

    def __init__(self, codewords: np.ndarray, codes: np.ndarray,
                 order: Optional[np.ndarray] = None,
                 precision: str = "bf16"):
        codewords = np.asarray(codewords, np.float32)
        M, K, Ds = codewords.shape
        if K > 256:
            # u16 codes need a [TILE, M*K>2048] one-hot scratch that
            # busts VMEM; K>256 runs on the decoded tier or the legacy
            # engines (the reference's DTC formats are K<=256 too)
            raise NotImplementedError(
                "fused codes/delta tiers require K <= 256; use "
                "FusedDecodedEngine or the legacy engines for u16")
        self.codewords = jnp.asarray(codewords)
        self.M, self.K, self.Ds = M, K, Ds
        self.D = M * Ds
        self.d_pad = -(-self.D // 128) * 128
        codes = np.asarray(codes)
        self.n_valid = codes.shape[0]
        if order is not None:
            codes = codes[np.asarray(order, np.int64)]
            self.row_to_db = jnp.asarray(
                np.asarray(order).astype(np.int32))
        else:
            self.row_to_db = None
        n_pad = -(-self.n_valid // TILE) * TILE
        codes_p = np.zeros((n_pad, M), np.uint8)
        codes_p[:self.n_valid] = codes
        self.codes = jnp.asarray(codes_p)
        self.mu = np.zeros(self.d_pad, np.float32)
        self.mu[:self.D] = fp.codebook_center(codewords)
        self.precision = precision
        if precision == "int8":
            cwq, self.scale = fp.quantize_blockdiag_int8(
                codewords, center=self.mu[:self.D])
            self.cwbd = jnp.asarray(cwq)
            self.err_c = _int8_codeword_radius(codewords, self.mu,
                                               self.scale)
        else:
            self.scale = None
            self.cwbd = jnp.asarray(fp.build_blockdiag_codebook(
                codewords, center=self.mu[:self.D]))

    def query(self, queries: np.ndarray, top_k: int = 10,
              n_sub: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        q, b = _pad_queries(queries, self.d_pad)
        qj = jnp.asarray(q)
        table = adc_table(self.codewords, qj[:, :self.D])
        qc_np = q - self.mu[None, :]            # centered scan domain
        qc = jnp.asarray(qc_np)
        q2 = jnp.sum(qc * qc, axis=1)
        qk = fp.pack_query_grouped(qc_np[:, :self.D], self.M, self.Ds)
        qop, invalid, uq, eq = _mins_query_args(qk, self.precision,
                                                self.scale)
        mins, codes_echo = fp.fused_codes_mins(
            qop, self.cwbd, self.codes, jnp.int32(self.n_valid),
            u=uq)
        if self.precision == "int8":
            scale2 = jnp.float32(self.scale * self.scale)
            # certificate geometry lives in the quantized domain:
            # fence + q2 must equal ||x_qs - q_qs||^2 exactly (with
            # q_qs = scale*u*qq), so q2 here is the QUANTIZED query
            # norm; the true-vs-quantized gap is the per-query radius
            # err_r = ||e_q||_exact + max-codeword radius (both exact
            # norms, ~2-3x tighter than the scale*sqrt(D) worst case)
            uqv = uq[0]
            q2 = (jnp.float32(self.scale * self.scale) * uqv * uqv
                  * jnp.sum(qop.astype(jnp.float32) ** 2, axis=0))
            err_r = eq + jnp.float32(self.err_c)
        else:
            err_r = None
            scale2 = None
        d, rows, frac = _select_with_escalation(
            mins, q2, table, codes_echo, jnp.int32(self.n_valid),
            top_k, n_sub, invalid=invalid, err_r=err_r,
            scale2=scale2)
        self.last_exact_frac = frac
        if self.row_to_db is not None:
            mapped = jnp.take(self.row_to_db,
                              jnp.clip(rows, 0, self.n_valid - 1))
            rows = jnp.where(rows >= 0, mapped, -1)  # keep padding
        return np.asarray(d[:b]), np.asarray(rows[:b])


class FusedCompressedEngine:
    """Compressed tier: delta-compressed tiles resident; full decode
    happens inside the scan kernel.

    fmt="stream" (default): packed value stream at ~(1 + diffs/row)
    B/vec — the information content of the reference's DTC stream
    (``deltapq_create_approx_tree.h:1765``).  fmt="slots": the v1
    fixed-slot tiles (S inline slots + overflow bank).

    Build from a DeltaTree (DFS order = tile order) or from raw codes
    plus an explicit scan order.
    """

    def __init__(self, codewords: np.ndarray, codes_scan: np.ndarray,
                 row_to_db: Optional[np.ndarray] = None,
                 S: Optional[int] = None, precision: str = "bf16",
                 fmt: str = "stream"):
        codewords = np.asarray(codewords, np.float32)
        M, K, Ds = codewords.shape
        if K > 256:
            raise NotImplementedError(
                "fused codes/delta tiers require K <= 256; use "
                "FusedDecodedEngine or the legacy engines for u16")
        self.codewords = jnp.asarray(codewords)
        self.M, self.K, self.Ds = M, K, Ds
        self.D = M * Ds
        self.d_pad = -(-self.D // 128) * 128
        self.fmt = fmt
        if fmt == "stream":
            self.tiles: StreamTiles = build_stream_tiles(
                np.asarray(codes_scan))
            self.vals = jnp.asarray(self.tiles.vals)
            self.meta = jnp.asarray(self.tiles.meta)
        elif fmt == "slots":
            self.tiles = build_delta_tiles(np.asarray(codes_scan), S=S)
            self.ovf = jnp.asarray(self.tiles.ovf)
        else:
            raise ValueError(f"unknown delta-tile format {fmt!r}")
        self.n_valid = self.tiles.n_valid
        self.row_data = jnp.asarray(self.tiles.row_data)
        self.mu = np.zeros(self.d_pad, np.float32)
        self.mu[:self.D] = fp.codebook_center(codewords)
        self.precision = precision
        if precision == "int8":
            cwq, self.scale = fp.quantize_blockdiag_int8(
                codewords, center=self.mu[:self.D])
            self.cwbd = jnp.asarray(cwq)
            self.err_c = _int8_codeword_radius(codewords, self.mu,
                                               self.scale)
        else:
            self.scale = None
            self.cwbd = jnp.asarray(fp.build_blockdiag_codebook(
                codewords, center=self.mu[:self.D]))
        self.row_to_db = (jnp.asarray(
            np.asarray(row_to_db).astype(np.int32))
            if row_to_db is not None else None)

    @classmethod
    def from_tree(cls, codewords: np.ndarray, tree,
                  S: Optional[int] = None, precision: str = "bf16",
                  fmt: str = "stream") -> "FusedCompressedEngine":
        codes_db = tree.decode_codes()
        codes_scan = codes_db[tree.vec_id.astype(np.int64)]
        return cls(codewords, codes_scan,
                   row_to_db=tree.vec_id.astype(np.int64), S=S,
                   precision=precision, fmt=fmt)

    @classmethod
    def from_tiles(cls, codewords: np.ndarray, tiles: "StreamTiles",
                   row_to_db: Optional[np.ndarray] = None,
                   precision: str = "bf16"
                   ) -> "FusedCompressedEngine":
        """Engine over pre-built stream tiles.  Construction cost is
        the device upload only — the out-of-core path
        (``bigscale.ChunkedCompressedEngine``) uses this to stream
        host-resident chunks through the chip per query batch (the
        reference's O_DIRECT refill, ``deltapq_create_approx_tree.h:
        2816-2822``)."""
        codewords = np.asarray(codewords, np.float32)
        M, K, Ds = codewords.shape
        self = cls.__new__(cls)
        self.codewords = jnp.asarray(codewords)
        self.M, self.K, self.Ds = M, K, Ds
        self.D = M * Ds
        self.d_pad = -(-self.D // 128) * 128
        self.fmt = "stream"
        self.tiles = tiles
        self.vals = jnp.asarray(tiles.vals)
        self.meta = jnp.asarray(tiles.meta)
        self.n_valid = tiles.n_valid
        self.row_data = jnp.asarray(tiles.row_data)
        self.mu = np.zeros(self.d_pad, np.float32)
        self.mu[:self.D] = fp.codebook_center(codewords)
        self.precision = precision
        if precision == "int8":
            cwq, self.scale = fp.quantize_blockdiag_int8(
                codewords, center=self.mu[:self.D])
            self.cwbd = jnp.asarray(cwq)
            self.err_c = _int8_codeword_radius(codewords, self.mu,
                                               self.scale)
        else:
            self.scale = None
            self.cwbd = jnp.asarray(fp.build_blockdiag_codebook(
                codewords, center=self.mu[:self.D]))
        self.row_to_db = (jnp.asarray(
            np.asarray(row_to_db).astype(np.int32))
            if row_to_db is not None else None)
        return self

    def bytes_per_vec(self) -> float:
        return self.tiles.bytes_per_vec()

    def query(self, queries: np.ndarray, top_k: int = 10,
              n_sub: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        q, b = _pad_queries(queries, self.d_pad)
        qj = jnp.asarray(q)
        table = adc_table(self.codewords, qj[:, :self.D])
        qc_np = q - self.mu[None, :]            # centered scan domain
        qc = jnp.asarray(qc_np)
        q2 = jnp.sum(qc * qc, axis=1)
        qk = fp.pack_query_grouped(qc_np[:, :self.D], self.M, self.Ds)
        qop, invalid, uq, eq = _mins_query_args(qk, self.precision,
                                                self.scale)
        if self.fmt == "stream":
            mins, codes_echo = fp.fused_stream_mins(
                qop, self.cwbd, self.row_data, self.vals, self.meta,
                jnp.int32(self.n_valid), self.tiles.e_max, self.M,
                u=uq)
        else:
            mins, codes_echo = fp.fused_delta_mins(
                qop, self.cwbd, self.row_data, self.ovf,
                jnp.int32(self.n_valid), self.tiles.S, u=uq)
        if self.precision == "int8":
            scale2 = jnp.float32(self.scale * self.scale)
            # certificate geometry lives in the quantized domain:
            # fence + q2 must equal ||x_qs - q_qs||^2 exactly (with
            # q_qs = scale*u*qq), so q2 here is the QUANTIZED query
            # norm; the true-vs-quantized gap is the per-query radius
            # err_r = ||e_q||_exact + max-codeword radius (both exact
            # norms, ~2-3x tighter than the scale*sqrt(D) worst case)
            uqv = uq[0]
            q2 = (jnp.float32(self.scale * self.scale) * uqv * uqv
                  * jnp.sum(qop.astype(jnp.float32) ** 2, axis=0))
            err_r = eq + jnp.float32(self.err_c)
        else:
            err_r = None
            scale2 = None
        d, rows, frac = _select_with_escalation(
            mins, q2, table, codes_echo, jnp.int32(self.n_valid),
            top_k, n_sub, invalid=invalid, err_r=err_r,
            scale2=scale2)
        self.last_exact_frac = frac
        if self.row_to_db is not None:
            mapped = jnp.take(self.row_to_db,
                              jnp.clip(rows, 0, self.n_valid - 1))
            rows = jnp.where(rows >= 0, mapped, -1)  # keep padding
        return np.asarray(d[:b]), np.asarray(rows[:b])

    def save(self, path: str) -> None:
        """Persist the delta tiles + mapping (staged-artifact model,
        SURVEY §5): ~compressed size on disk, load is upload-only."""
        common = dict(row_data=self.tiles.row_data,
                      n_valid=self.n_valid, M=self.M, fmt=self.fmt,
                      codewords=np.asarray(self.codewords),
                      row_to_db=(np.asarray(self.row_to_db)
                                 if self.row_to_db is not None
                                 else np.zeros(0, np.int32)))
        if self.fmt == "stream":
            np.savez(path, vals=self.tiles.vals, meta=self.tiles.meta,
                     e_max=self.tiles.e_max, **common)
        else:
            np.savez(path, ovf=self.tiles.ovf, S=self.tiles.S,
                     Cap=self.tiles.Cap, **common)

    @classmethod
    def load(cls, path: str) -> "FusedCompressedEngine":
        import os
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"  # np.savez appends the suffix
        z = np.load(path, allow_pickle=False)
        self = cls.__new__(cls)
        codewords = np.asarray(z["codewords"], np.float32)
        M, K, Ds = codewords.shape
        self.codewords = jnp.asarray(codewords)
        self.M, self.K, self.Ds = M, K, Ds
        self.D = M * Ds
        self.d_pad = -(-self.D // 128) * 128
        self.fmt = str(z["fmt"]) if "fmt" in z else "slots"
        if self.fmt == "stream":
            self.tiles = StreamTiles(
                row_data=z["row_data"], vals=z["vals"], meta=z["meta"],
                n_valid=int(z["n_valid"]), M=int(z["M"]),
                e_max=int(z["e_max"]))
            self.vals = jnp.asarray(self.tiles.vals)
            self.meta = jnp.asarray(self.tiles.meta)
        else:
            self.tiles = DeltaTiles(
                row_data=z["row_data"], ovf=z["ovf"],
                n_valid=int(z["n_valid"]), M=int(z["M"]),
                S=int(z["S"]), Cap=int(z["Cap"]))
            self.ovf = jnp.asarray(self.tiles.ovf)
        self.n_valid = self.tiles.n_valid
        self.row_data = jnp.asarray(self.tiles.row_data)
        self.mu = np.zeros(self.d_pad, np.float32)
        self.mu[:self.D] = fp.codebook_center(codewords)
        self.precision = "bf16"
        self.scale = None
        self.cwbd = jnp.asarray(fp.build_blockdiag_codebook(
            codewords, center=self.mu[:self.D]))
        rtd = z["row_to_db"]
        self.row_to_db = jnp.asarray(rtd) if len(rtd) else None
        return self


class DedupCompressedEngine:
    """Duplicate-code-collapsed compressed tier.

    Clustered datasets produce heavy PQ-code duplication, and identical
    codes have identical ADC distances.  The scan kernel's cost is per
    ROW, so this tier scans each DISTINCT code once and expands row ids
    at result time: top-k distinct codes by exact distance always cover
    >= top_k rows (every distinct code has at least one row), so the
    expanded (distance, id) lists equal the full scan's up to the order
    among equal-distance duplicates — the same tie semantics as the
    reference's heap.  Reference counterpart: none; its DTC stream
    stores a duplicate in ~1.5 bytes but still walks it during every
    query (``deltapq_create_approx_tree.h:2876-2975``).

    Device-resident bytes = stream tiles over the distinct codes only;
    the row expansion (sorted permutation + CSR counts) lives on the
    host.
    """

    def __init__(self, codewords: np.ndarray, codes_db: np.ndarray,
                 precision: str = "int8", fmt: str = "stream"):
        codes_db = np.asarray(codes_db)
        order = np.lexsort(codes_db.T[::-1])
        sc = codes_db[order]
        new = np.ones(len(sc), bool)
        if len(sc) > 1:
            new[1:] = np.any(sc[1:] != sc[:-1], axis=1)
        self.starts = np.flatnonzero(new)
        self.counts = np.diff(np.append(self.starts, len(sc)))
        self.order = order
        self.n_rows = len(codes_db)
        self.engine = FusedCompressedEngine(
            codewords, sc[new], precision=precision, fmt=fmt)

    @property
    def n_unique(self) -> int:
        return len(self.starts)

    def bytes_per_vec(self) -> float:
        """Device-resident bytes amortized over ALL rows."""
        return (self.engine.bytes_per_vec() * self.engine.n_valid
                / max(self.n_rows, 1))

    def query(self, queries: np.ndarray, top_k: int = 10
              ) -> Tuple[np.ndarray, np.ndarray]:
        ku = min(top_k, self.n_unique)
        d_u, i_u = self.engine.query(queries, top_k=ku)
        B = len(d_u)
        out_d = np.full((B, top_k), np.inf, np.float32)
        out_i = np.full((B, top_k), -1, np.int64)
        for b in range(B):
            f = 0
            for j in range(ku):
                u = int(i_u[b, j])
                if u < 0 or f >= top_k:
                    break
                s = int(self.starts[u])
                take = min(int(self.counts[u]), top_k - f)
                out_i[b, f:f + take] = self.order[s:s + take]
                out_d[b, f:f + take] = d_u[b, j]
                f += take
        return out_d, out_i
