import numpy as np
import pytest

import jax

from deltapq_tpu.ops import pq_learn, pq_encode, adc_table, query_plain
from deltapq_tpu.ops.delta import (build_delta_pack, make_compressed_query_fn,
                                   query_compressed)
from deltapq_tpu.tree import (find_edges_by_diff, build_layout,
                              serialize_dtc)
from deltapq_tpu.tree.traverse import scan_compressed


@pytest.fixture(scope="module")
def pipeline(small_dataset):
    M, K = 4, 16
    cw = pq_learn(jax.random.PRNGKey(0), small_dataset, M=M, K=K,
                  max_iters=20)
    codes = pq_encode(cw, small_dataset)
    res = find_edges_by_diff(codes, K=K)
    tree = build_layout(codes, res.edges, res.root_id, K=K, codewords=cw)
    pack = build_delta_pack(tree)
    return small_dataset, cw, codes, tree, pack


def test_levelwise_dists_match_plain_adc(pipeline, rng):
    data, cw, codes, tree, pack = pipeline
    q = rng.normal(size=(8, data.shape[1])).astype(np.float32) * 3
    table = np.asarray(adc_table(cw, q))
    run = make_compressed_query_fn(pack)
    dists = np.asarray(run(table))  # [B, N] db order
    # plain ADC full distances
    full = np.zeros_like(dists)
    for m in range(tree.M):
        full += table[:, m, :][:, codes[:, m]]
    np.testing.assert_allclose(dists, full, rtol=2e-4, atol=1e-3)


def test_query_compressed_topk_matches_plain(pipeline, rng):
    data, cw, codes, tree, pack = pipeline
    q = rng.normal(size=(6, data.shape[1])).astype(np.float32) * 3
    d_c, i_c = query_compressed(pack, cw, q, top_k=10)
    d_p, i_p = query_plain(cw, q, codes, top_k=10, tile_n=512)
    np.testing.assert_allclose(d_c, d_p, rtol=2e-4, atol=1e-3)
    for b in range(len(q)):
        # allow tie permutations: compare id sets on distance-rounded sets
        assert set(i_c[b]) == set(i_p[b]) or \
            np.allclose(np.sort(d_c[b]), np.sort(d_p[b]), rtol=2e-4)


def test_sequential_scan_oracle_matches_levelwise(pipeline, rng):
    data, cw, codes, tree, pack = pipeline
    q = rng.normal(size=(2, data.shape[1])).astype(np.float32) * 3
    table = np.asarray(adc_table(cw, q)).astype(np.float64)
    stream = np.frombuffer(serialize_dtc(tree), np.uint8)
    run = make_compressed_query_fn(pack)
    lv = np.asarray(run(np.asarray(table, np.float32)))
    for b in range(2):
        d_seq, ids_seq = scan_compressed(stream, tree.n, tree.M,
                                         table[b], top_k=10,
                                         vec_id=tree.vec_id)
        order = np.argsort(lv[b], kind="stable")[:10]
        np.testing.assert_allclose(np.sort(d_seq),
                                   np.sort(lv[b][order]),
                                   rtol=2e-4, atol=1e-3)
        assert set(ids_seq) == set(order) or \
            np.allclose(np.sort(d_seq), np.sort(lv[b][ids_seq]), rtol=1e-3)


def test_self_queries_hit_own_code(pipeline):
    data, cw, codes, tree, pack = pipeline
    q = data[:8]
    d_c, i_c = query_compressed(pack, cw, q, top_k=3)
    for b in range(8):
        np.testing.assert_array_equal(codes[i_c[b, 0]], codes[b])
