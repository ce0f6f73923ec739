import numpy as np
import pytest

from deltapq_tpu.io import (read_vecs, write_vecs, iter_vec_batches,
                            num_vectors, read_codewords, write_codewords,
                            read_codes, write_codes, read_groundtruth,
                            write_groundtruth, ArtifactCache, config_key)


def test_fvecs_roundtrip(tmp_path, rng):
    x = rng.normal(size=(100, 16)).astype(np.float32)
    p = str(tmp_path / "base.fvecs")
    write_vecs(p, x)
    y = read_vecs(p)
    np.testing.assert_array_equal(x, y)
    assert num_vectors(p) == 100


def test_bvecs_roundtrip(tmp_path, rng):
    x = rng.integers(0, 256, size=(50, 8)).astype(np.uint8)
    p = str(tmp_path / "base.bvecs")
    write_vecs(p, x)
    y = read_vecs(p, as_float=True)
    assert y.dtype == np.float32
    np.testing.assert_array_equal(x.astype(np.float32), y)
    y8 = read_vecs(p, as_float=False)
    assert y8.dtype == np.uint8


def test_read_topn_offset(tmp_path, rng):
    x = rng.normal(size=(30, 4)).astype(np.float32)
    p = str(tmp_path / "q.fvecs")
    write_vecs(p, x)
    np.testing.assert_array_equal(read_vecs(p, top_n=10), x[:10])
    np.testing.assert_array_equal(read_vecs(p, top_n=5, offset=20), x[20:25])


def test_iter_batches(tmp_path, rng):
    x = rng.normal(size=(25, 4)).astype(np.float32)
    p = str(tmp_path / "b.fvecs")
    write_vecs(p, x)
    batches = list(iter_vec_batches(p, batch_size=10))
    assert [len(b) for b in batches] == [10, 10, 5]
    np.testing.assert_array_equal(np.concatenate(batches), x)


def test_codewords_roundtrip(tmp_path, rng):
    cw = rng.normal(size=(4, 8, 3)).astype(np.float32)
    p = str(tmp_path / "M4K8codewords.txt")
    write_codewords(p, cw)
    back = read_codewords(p)
    np.testing.assert_array_equal(cw, back)


def test_codes_roundtrip_u8(tmp_path, rng):
    codes = rng.integers(0, 256, size=(100, 8)).astype(np.uint8)
    p = str(tmp_path / "codes.bin")
    write_codes(p, codes)
    back, ids = read_codes(p, M=8)
    np.testing.assert_array_equal(codes, back)
    assert ids is None


def test_codes_roundtrip_u16(tmp_path, rng):
    codes = rng.integers(0, 1024, size=(40, 8)).astype(np.uint16)
    p = str(tmp_path / "codes16.bin")
    write_codes(p, codes)
    back, _ = read_codes(p, M=8, K=1024)
    np.testing.assert_array_equal(codes, back)


def test_codes_with_id(tmp_path, rng):
    codes = rng.integers(0, 256, size=(10, 8)).astype(np.uint8)
    ids = np.arange(10, dtype=np.int32) * 7
    p = str(tmp_path / "codes_id.bin")
    write_codes(p, codes, ids=ids)
    back, bids = read_codes(p, M=8, with_id=True)
    np.testing.assert_array_equal(codes, back)
    np.testing.assert_array_equal(ids, bids)


def test_groundtruth_roundtrip(tmp_path, rng):
    dists = rng.random(size=(5, 10)).astype(np.float32)
    ids = rng.integers(0, 1000, size=(5, 10))
    p = str(tmp_path / "gt.txt")
    write_groundtruth(p, ids, dists)
    bids, bdists = read_groundtruth(p)
    # written sorted ascending by dist
    order = np.argsort(dists, axis=1, kind="stable")
    np.testing.assert_array_equal(np.take_along_axis(ids, order, 1), bids)
    np.testing.assert_allclose(np.take_along_axis(dists, order, 1), bdists,
                               rtol=1e-6)


def test_artifact_cache(tmp_path):
    cache = ArtifactCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"a": np.arange(5)}

    k = config_key(M=8, K=256, N=100)
    r1 = cache.get_or_compute("stage", k, compute)
    r2 = cache.get_or_compute("stage", k, compute)
    assert len(calls) == 1
    np.testing.assert_array_equal(r1["a"], r2["a"])
