import jax
import numpy as np
import pytest

from deltapq_tpu.ops import (kmeans, pq_learn, pq_encode, pq_decode,
                             adc_table, query_plain)


def _np_adc_table(codewords, queries):
    M, K, Ds = codewords.shape
    B, D = queries.shape
    qs = queries.reshape(B, M, Ds)
    diff = qs[:, :, None, :] - codewords[None]  # [B, M, K, Ds]
    return np.sum(diff * diff, axis=-1)


def test_kmeans_recovers_separated_clusters(rng):
    # 4 well-separated clusters must be recovered near-exactly
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    x = np.repeat(centers, 50, axis=0) + \
        rng.normal(size=(200, 2)).astype(np.float32) * 0.05
    c, labels, dist = kmeans(jax.random.PRNGKey(0), x, 4, max_iters=50,
                             tol=1e-4)
    c = np.asarray(c)
    # each true center has a learned center within 0.1
    for t in centers:
        assert np.min(np.linalg.norm(c - t, axis=1)) < 0.1
    assert float(dist) < 200 * 0.05 ** 2 * 2 * 4


def test_kmeans_distortion_decreases_vs_random(rng, small_dataset):
    x = small_dataset
    _, _, dist = kmeans(jax.random.PRNGKey(1), x, 16, max_iters=30)
    # compare against distortion of random assignment to 16 random rows
    ridx = rng.integers(0, len(x), 16)
    d2 = ((x[:, None, :] - x[ridx][None]) ** 2).sum(-1).min(1).sum()
    assert float(dist) < d2


def test_pq_learn_shapes(small_dataset):
    cw = pq_learn(jax.random.PRNGKey(0), small_dataset, M=4, K=16,
                  max_iters=25)
    assert cw.shape == (4, 16, 8)
    assert cw.dtype == np.float32


def test_pq_learn_padding(rng):
    x = rng.normal(size=(300, 10)).astype(np.float32)  # 10 % 4 != 0 -> pad 2
    cw = pq_learn(jax.random.PRNGKey(0), x, M=4, K=8, max_iters=10)
    assert cw.shape == (4, 8, 3)


def test_encode_matches_numpy(rng, small_dataset):
    cw = pq_learn(jax.random.PRNGKey(0), small_dataset, M=4, K=16,
                  max_iters=25)
    codes = pq_encode(cw, small_dataset)
    assert codes.shape == (len(small_dataset), 4)
    assert codes.dtype == np.uint8
    # numpy reference argmin
    M, K, Ds = cw.shape
    xs = small_dataset.reshape(len(small_dataset), M, Ds)
    d2 = np.sum((xs[:, :, None, :] - cw[None]) ** 2, axis=-1)
    np.testing.assert_array_equal(codes, np.argmin(d2, axis=2))


def test_encode_u16_for_large_K(rng):
    x = rng.normal(size=(600, 8)).astype(np.float32)
    cw = pq_learn(jax.random.PRNGKey(0), x, M=2, K=512, max_iters=5)
    codes = pq_encode(cw, x)
    assert codes.dtype == np.uint16


def test_decode_roundtrip_small_distortion(rng, small_dataset):
    cw = pq_learn(jax.random.PRNGKey(0), small_dataset, M=4, K=32,
                  max_iters=30)
    codes = pq_encode(cw, small_dataset)
    rec = pq_decode(cw, codes)
    mse = np.mean((rec - small_dataset) ** 2)
    var = np.mean(small_dataset ** 2)
    assert mse < var * 0.5  # quantization must capture most energy


def test_adc_table_matches_numpy(rng):
    cw = rng.normal(size=(4, 16, 8)).astype(np.float32)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    t = np.asarray(adc_table(cw, q))
    t_np = _np_adc_table(cw, q)
    np.testing.assert_allclose(t, t_np, rtol=1e-4, atol=1e-4)


def test_query_plain_matches_bruteforce_adc(rng):
    n, M, K, Ds = 700, 4, 16, 8
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = rng.integers(0, K, size=(n, M)).astype(np.uint8)
    q = rng.normal(size=(3, M * Ds)).astype(np.float32)
    d, ids = query_plain(cw, q, codes, top_k=10, tile_n=256)
    # exact numpy ADC
    t = _np_adc_table(cw, q)
    full = np.zeros((3, n), np.float32)
    for m in range(M):
        full += t[:, m, :][:, codes[:, m]]
    ref_ids = np.argsort(full, axis=1, kind="stable")[:, :10]
    ref_d = np.take_along_axis(full, ref_ids, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-4)
    # id sets must match (ties may permute)
    for b in range(3):
        assert set(ids[b]) == set(ref_ids[b])


def test_query_plain_self_query_top1(rng, small_dataset):
    """Each database vector's own code must be its top-1 by ADC."""
    cw = pq_learn(jax.random.PRNGKey(0), small_dataset, M=4, K=32,
                  max_iters=30)
    codes = pq_encode(cw, small_dataset)
    q = small_dataset[:16]
    d, ids = query_plain(cw, q, codes, top_k=5, tile_n=512)
    # the reconstructed code distance of the query's own row is minimal
    # unless another row shares the same code; accept either
    for b in range(16):
        top_code = codes[ids[b, 0]]
        np.testing.assert_array_equal(top_code, codes[b])


def test_k1024_u16_end_to_end(rng):
    """K>256 path: u16 codes through learn/encode/query (reference
    stores two bytes per sub-code, pq_tree.cpp:232-236)."""
    x = rng.normal(size=(3000, 16)).astype(np.float32)
    cw = pq_learn(jax.random.PRNGKey(2), x, M=2, K=512, max_iters=10)
    codes = pq_encode(cw, x)
    assert codes.dtype == np.uint16
    d, i = query_plain(cw, x[:5], codes, top_k=5, tile_n=512)
    # self-query: own code must rank first
    for b in range(5):
        np.testing.assert_array_equal(codes[i[b, 0]], codes[b])


def test_gist_config_m16_end_to_end(rng):
    """GIST1M-style config (BASELINE config 3): M=16, 960-dim-like data
    (scaled down), plain ADC path (DTC byte format is M<=8 by design,
    as in the reference)."""
    from deltapq_tpu.eval import exact_topk, recall_at_k
    ncl = 32
    centers = rng.normal(size=(ncl, 96)).astype(np.float32) * 4
    a = rng.integers(0, ncl, 4000)
    base = centers[a] + rng.normal(size=(4000, 96)).astype(np.float32)
    q = centers[rng.integers(0, ncl, 20)] + \
        rng.normal(size=(20, 96)).astype(np.float32)
    cw = pq_learn(jax.random.PRNGKey(3), base, M=16, K=32, max_iters=15)
    assert cw.shape == (16, 32, 6)
    codes = pq_encode(cw, base)
    assert codes.shape == (4000, 16)
    d, i = query_plain(cw, q, codes, top_k=10, tile_n=512)
    gt_d, gt_i = exact_topk(q, base, top_k=10)
    r = recall_at_k(i, gt_i)
    # NN ranking here is intra-cluster (unit noise) while PQ distortion
    # is of the same scale, so absolute recall is modest; assert far
    # above chance (10/4000 = 0.0025) rather than an arbitrary bar
    assert r > 0.05, r
    # M=16 tree build works (u128 keys); serialization correctly refuses
    from deltapq_tpu.tree import find_edges_by_diff, build_layout, serialize_dtc
    res = find_edges_by_diff(codes, K=32)
    assert len(res.edges) == 3999
    tree = build_layout(codes, res.edges, res.root_id, K=32, codewords=cw)
    np.testing.assert_array_equal(tree.decode_codes(), codes)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        serialize_dtc(tree)
