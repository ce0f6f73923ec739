"""Pallas ADC kernel vs the XLA gather path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltapq_tpu.ops.adc import adc_table, adc_tile_dists


def _np_dists(table, codes):
    B, M, K = table.shape
    out = np.zeros((B, codes.shape[0]), np.float32)
    for m in range(M):
        out += table[:, m, :][:, codes[:, m]]
    return out


@pytest.fixture(scope="module")
def problem(rng=None):
    rng = np.random.default_rng(11)
    B, M, K, N = 8, 4, 16, 256
    table = rng.normal(size=(B, M, K)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    return table, codes


def test_pallas_dists_interpret(problem, monkeypatch):
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap

    table, codes = problem
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    d = np.asarray(ap.adc_dists_pallas.__wrapped__(
        jnp.asarray(table), jnp.asarray(codes), tile_n=64))
    np.testing.assert_allclose(d, _np_dists(table, codes), rtol=1e-5,
                               atol=1e-5)


def test_pallas_topk_interpret(problem, monkeypatch):
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap

    table, codes = problem
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    d, i = ap.adc_topk_pallas.__wrapped__(
        jnp.asarray(table), jnp.asarray(codes), jnp.int32(250),
        top_k=5, tile_n=64)
    d, i = np.asarray(d), np.asarray(i)
    full = _np_dists(table, codes)[:, :250]
    ref_i = np.argsort(full, axis=1, kind="stable")[:, :5]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)
    assert np.all(i < 250)
    for b in range(len(d)):
        assert set(i[b]) == set(ref_i[b]) or np.allclose(d[b], ref_d[b])


def test_pallas_packed_topk_interpret(problem, monkeypatch):
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap

    table, codes = problem
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    d, i = ap.adc_topk_packed.__wrapped__(
        jnp.asarray(table), jnp.asarray(codes), jnp.int32(250),
        top_k=5, tile_n=64, precision="f32")
    d, i = np.asarray(d), np.asarray(i)
    full = _np_dists(table, codes)[:, :250]
    ref_i = np.argsort(full, axis=1, kind="stable")[:, :5]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    # packed selection truncates values to ~2^-12 rel for ordering;
    # distances themselves are exact for the selected ids
    np.testing.assert_allclose(np.sort(d, axis=1), ref_d, rtol=1e-3,
                               atol=1e-3)
    assert np.all(i < 250)
    for b in range(len(d)):
        exact = full[b][i[b]]
        np.testing.assert_allclose(np.sort(exact), ref_d[b], rtol=1e-3)


def test_pallas_packed_topk_duplicate_codes(monkeypatch):
    """Duplicate codes (equal distances) must still yield k distinct ids."""
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap

    rng = np.random.default_rng(3)
    B, M, K, N = 4, 4, 16, 128
    table = np.abs(rng.normal(size=(B, M, K))).astype(np.float32)
    codes = np.tile(rng.integers(0, K, size=(1, M)), (N, 1)).astype(np.uint8)
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    d, i = ap.adc_topk_packed.__wrapped__(
        jnp.asarray(table), jnp.asarray(codes), jnp.int32(N),
        top_k=8, tile_n=32, precision="f32")
    i = np.asarray(i)
    for b in range(B):
        assert len(set(i[b].tolist())) == 8  # distinct ids despite ties


def test_decoded_engine_matches_plain(rng=None):
    import numpy as np
    from deltapq_tpu.ops.decoded import DecodedEngine
    from deltapq_tpu.ops import query_plain

    rng = np.random.default_rng(21)
    M, K, Ds, N, B = 4, 16, 8, 3000, 6
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    q = rng.normal(size=(B, M * Ds)).astype(np.float32)
    eng = DecodedEngine(cw, codes)
    d_e, i_e = eng.query(q, top_k=10)
    d_p, i_p = query_plain(cw, q, codes, top_k=10, engine="xla")
    np.testing.assert_allclose(d_e, d_p, rtol=1e-5, atol=1e-5)
    for b in range(B):
        assert set(i_e[b]) == set(i_p[b]) or np.allclose(d_e[b], d_p[b],
                                                         rtol=1e-5)


def test_decoded_engine_save_load(tmp_path):
    import numpy as np
    from deltapq_tpu.ops.decoded import DecodedEngine

    rng = np.random.default_rng(5)
    M, K, Ds, N = 4, 16, 8, 500
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    q = rng.normal(size=(3, M * Ds)).astype(np.float32)
    eng = DecodedEngine(cw, codes)
    p = str(tmp_path / "cache.npz")
    eng.save(p)
    eng2 = DecodedEngine.load(p)
    d1, i1 = eng.query(q, top_k=5)
    d2, i2 = eng2.query(q, top_k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_tiledict_build_and_kernel_interpret(monkeypatch):
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap

    rng = np.random.default_rng(13)
    B, M, K, N, TN = 4, 4, 64, 512, 64
    # clustered codes: few distinct values per tile
    pool = rng.integers(0, K, size=(10, M))
    codes = pool[rng.integers(0, 10, N)].astype(np.uint8)
    table = np.abs(rng.normal(size=(B, M, K))).astype(np.float32)
    out = ap.build_tile_dict(codes, tile_n=TN, max_dict=16)
    assert out is not None
    dicts, idx, D = out
    assert D <= 16
    # dict reconstruction: dict[tile, m, idx] == codes
    for t in range(N // TN):
        rows = slice(t * TN, (t + 1) * TN)
        for m in range(M):
            np.testing.assert_array_equal(
                dicts[t, m][idx[rows, m]], codes[rows, m])
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    d, i = ap.adc_topk_tiledict.__wrapped__(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(dicts),
        jnp.asarray(codes), jnp.int32(500), top_k=5, tile_n=TN)
    d, i = np.asarray(d), np.asarray(i)
    full = _np_dists(table, codes)[:, :500]
    ref_i = np.argsort(full, axis=1, kind="stable")[:, :5]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(np.sort(d, axis=1), ref_d, rtol=1e-5,
                               atol=1e-5)
    assert np.all(i < 500)


def test_tiledict_overflow_returns_none():
    from deltapq_tpu.ops.adc_pallas import build_tile_dict
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 256, size=(256, 4)).astype(np.uint8)
    assert build_tile_dict(codes, tile_n=256, max_dict=16) is None


def test_tiledict_engine_dfs_order(monkeypatch, small_dataset):
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap
    from deltapq_tpu.ops import pq_learn, pq_encode, query_plain
    from deltapq_tpu.tree import find_edges_by_diff, build_layout
    import jax as _jax

    cw = pq_learn(_jax.random.PRNGKey(0), small_dataset, M=4, K=16,
                  max_iters=15)
    codes = pq_encode(cw, small_dataset)
    res = find_edges_by_diff(codes, K=16)
    tree = build_layout(codes, res.edges, res.root_id, K=16, codewords=cw)
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    eng = ap.TileDictEngine(cw, codes, order=tree.vec_id.astype(np.int64),
                            tile_n=256, max_dict=16)
    assert eng.ok  # DFS-ordered clustered codes fit a 16-wide dict
    rng = np.random.default_rng(3)
    q = rng.normal(size=(4, small_dataset.shape[1])).astype(np.float32)
    d, i = eng.query(q, top_k=5)
    d_ref, i_ref = query_plain(cw, q, codes, top_k=5, engine="xla")
    np.testing.assert_allclose(np.sort(d, 1), np.sort(d_ref, 1),
                               rtol=1e-5, atol=1e-5)


def test_pallas_argmin_padding_regression(monkeypatch):
    """Regression (code-review finding): padding rows must be masked
    INSIDE the argmin kernel or they crowd valid rows out of the last
    tile's local top-k."""
    from jax.experimental import pallas as pl
    import deltapq_tpu.ops.adc_pallas as ap

    M, K, B = 1, 8, 2
    # table[*, 0, 0] = 0 so padding rows (code 0) would score best
    table = np.arange(1, B * M * K + 1, dtype=np.float32).reshape(B, M, K)
    table[:, 0, 0] = 0.0
    # 10 valid rows with codes 1..7 (never 0), padded to 16
    codes = np.array([[1], [2], [3], [4], [5], [6], [7], [1], [2], [3]],
                     np.uint8)
    codes_p = np.concatenate([codes, np.zeros((6, 1), np.uint8)])
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    d, i = ap.adc_topk_pallas.__wrapped__(
        jnp.asarray(table), jnp.asarray(codes_p), jnp.int32(10),
        top_k=6, tile_n=8, precision="f32")
    i = np.asarray(i)
    assert np.all(i < 10), i  # no padding ids may appear
    full = _np_dists(table, codes)
    ref = np.argsort(full, axis=1, kind="stable")[:, :6]
    for b in range(B):
        assert set(i[b]) == set(ref[b])
