"""Native C++ codec vs the NumPy/Python implementations."""

import numpy as np
import pytest

from deltapq_tpu.native import (have_native, dtc_decode_native,
                                dtc_parse_native, dfs_layout_native,
                                scan_query_native, diff_index_decode_native)
from deltapq_tpu.tree import (find_edges_by_diff, build_layout,
                              serialize_dtc, decode_dtc_to_codes,
                              deserialize_dtc, serialize_diff_index)
from deltapq_tpu.tree.traverse import scan_compressed

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def tree_fixture():
    rng = np.random.default_rng(9)
    n, M, K = 1200, 8, 16
    base = rng.integers(0, K, size=(30, M))
    codes = base[rng.integers(0, 30, n)]
    mut = rng.random((n, M)) < 0.1
    codes = np.where(mut, rng.integers(0, K, size=(n, M)), codes)
    codes = codes.astype(np.uint8)
    cw = rng.normal(size=(M, K, 4)).astype(np.float32)
    res = find_edges_by_diff(codes, K=K)
    tree = build_layout(codes, res.edges, res.root_id, K=K, codewords=cw)
    stream = np.frombuffer(serialize_dtc(tree), np.uint8)
    return codes, cw, tree, stream


def test_native_decode_matches_python(tree_fixture):
    codes, cw, tree, stream = tree_fixture
    py = decode_dtc_to_codes(stream, tree.n, tree.M)
    nat = dtc_decode_native(stream, tree.n, tree.M)
    np.testing.assert_array_equal(py, nat)
    back = np.empty_like(codes)
    back[tree.vec_id.astype(np.int64)] = nat
    np.testing.assert_array_equal(back, codes)


def test_native_parse_matches_python(tree_fixture):
    codes, cw, tree, stream = tree_fixture
    pd, pb, pt, po = deserialize_dtc(stream, tree.n, tree.M,
                                     use_native=False)
    nd, nb, nt, no = dtc_parse_native(stream, tree.n, tree.M)
    np.testing.assert_array_equal(pd, nd)
    np.testing.assert_array_equal(pb, nb)
    np.testing.assert_array_equal(pt, nt)
    np.testing.assert_array_equal(po, no)


def test_native_scan_matches_python_oracle(tree_fixture):
    codes, cw, tree, stream = tree_fixture
    rng = np.random.default_rng(1)
    q = rng.normal(size=(tree.M * 4,)).astype(np.float32)
    # ADC table [M, K]
    M, K, Ds = cw.shape
    qs = q.reshape(M, Ds)
    table = ((qs[:, None, :] - cw) ** 2).sum(-1).astype(np.float32)
    d_py, i_py = scan_compressed(stream, tree.n, tree.M, table, 10)
    d_nat, i_nat = scan_query_native(stream, tree.n, tree.M, K, table, 10)
    np.testing.assert_allclose(d_py, d_nat, rtol=1e-5, atol=1e-5)
    assert set(i_py) == set(i_nat)


def test_native_dfs_layout_matches(tree_fixture):
    codes, cw, tree, stream = tree_fixture
    # rebuild CSR from the tree's own parent/child info and re-run DFS
    n = tree.n
    parents = np.full(len(codes), -1, np.int64)
    pos = tree.parent_pos[1:].astype(np.int64)
    parents[tree.vec_id[1:].astype(np.int64)] = tree.vec_id[pos]
    child = np.flatnonzero(parents >= 0)
    par = parents[child]
    # preserve the tree's DFS child order: order children by their DFS pos
    pos_of = np.empty(n, np.int64)
    pos_of[tree.vec_id.astype(np.int64)] = np.arange(n)
    order = np.lexsort((pos_of[child], par))
    child_sorted = child[order].astype(np.uint32)
    counts = np.bincount(par, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    out = dfs_layout_native(n, child_sorted, offsets, tree.root_id)
    dfs_vec, dfs_parent, dfs_depth, _ = out
    np.testing.assert_array_equal(dfs_vec, tree.vec_id)
    np.testing.assert_array_equal(dfs_parent, tree.parent_pos)
    np.testing.assert_array_equal(dfs_depth, tree.depth)


def test_native_diff_index_decode():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 256, size=(500, 8)).astype(np.uint8)
    stream = np.frombuffer(serialize_diff_index(codes), np.uint8)
    out = diff_index_decode_native(stream, 500, 8)
    np.testing.assert_array_equal(out, codes)
