import numpy as np

from deltapq_tpu.eval import (exact_topk, recall_at_k, top1_accuracy,
                              mean_average_precision, epsilon_recall,
                              true_distances)


def test_exact_topk_matches_numpy(rng):
    base = rng.normal(size=(500, 16)).astype(np.float32)
    q = rng.normal(size=(7, 16)).astype(np.float32)
    d, i = exact_topk(q, base, top_k=10, tile_n=128)
    full = ((q[:, None, :] - base[None]) ** 2).sum(-1)
    ref_i = np.argsort(full, axis=1, kind="stable")[:, :10]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-3, atol=1e-3)
    for b in range(7):
        assert set(i[b]) == set(ref_i[b])


def test_exact_topk_streaming_equals_inmemory(rng):
    base = rng.normal(size=(300, 8)).astype(np.float32)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    d1, i1 = exact_topk(q, base, top_k=5, tile_n=64)
    it = (base[j:j + 77] for j in range(0, 300, 77))
    d2, i2 = exact_topk(q, it, top_k=5, tile_n=999)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    np.testing.assert_array_equal(i1, i2)


def test_recall_at_k():
    ret = np.array([[1, 2, 3], [4, 5, 6]])
    gt = np.array([[1, 9, 3], [6, 5, 4]])
    assert recall_at_k(ret, gt) == (2 + 3) / 6
    assert recall_at_k(ret, gt, k=1) == 0.5  # q0: 1 in {1}; q1: 4 not in {6}


def test_top1_accuracy():
    ret = np.array([[1, 2], [3, 4], [5, 6]])
    gt = np.array([[1, 0], [9, 0], [5, 0]])
    assert top1_accuracy(ret, gt) == 2 / 3


def test_map_perfect_is_one():
    ids = np.array([[0, 1, 2, 3]])
    out = mean_average_precision(ids, ids)
    assert abs(out["mAP"] - 1.0) < 1e-12


def test_map_with_ratios():
    ret = np.array([[0, 1]])
    gt = np.array([[0, 2]])
    rd = np.array([[1.0, 4.0]])
    gd = np.array([[1.0, 4.0]])
    out = mean_average_precision(ret, gt, rd, gd)
    # k=1: inter=1 -> 1/1 ; k=2: inter=1 -> 1/2 ; AP = (1 + .5)/2
    assert abs(out["mAP"] - 0.75) < 1e-12
    assert abs(out["avg_ratio"] - 1.0) < 1e-12
    assert abs(out["max_ratio"] - 1.0) < 1e-12


def test_epsilon_recall_exact_retrieval(rng):
    base = rng.normal(size=(200, 8)).astype(np.float32)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    d, i = exact_topk(q, base, top_k=5)
    td = true_distances(base, q, i)
    np.testing.assert_allclose(td, d, rtol=1e-3, atol=1e-4)
    # distances computed identically -> exact
    out = epsilon_recall(d, d)
    assert out["recall_true"] == 1.0
    assert out["eps_recall"] == 1.0
    assert abs(out["k_app_ratio"] - 1.0) < 1e-5
    # recomputed true distances differ by fp rounding at the kth boundary;
    # the 1.1 epsilon margin must absorb that
    out2 = epsilon_recall(td, d)
    assert out2["eps_recall"] == 1.0
    assert out2["recall_true"] >= 0.9
    assert abs(out2["k_app_ratio"] - 1.0) < 1e-3


def test_code_hamming_hist():
    from deltapq_tpu.eval.metrics import code_hamming_hist
    q = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.uint8)
    nn = np.array([[1, 2, 3], [4, 0, 0], [0, 0, 0]], np.uint8)
    h = code_hamming_hist(q, nn)
    np.testing.assert_array_equal(h, [1, 0, 1, 1])


def test_evaluate_bundle(rng):
    from deltapq_tpu.eval import evaluate
    base = rng.normal(size=(300, 8)).astype(np.float32)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    d, i = exact_topk(q, base, top_k=5)
    out = evaluate(i, d, i, d, base=base, queries=q)
    assert out["recall_at_k"] == 1.0
    assert out["top1_accuracy"] == 1.0
    assert abs(out["mAP"] - 1.0) < 1e-9
    assert out["eps_recall"] == 1.0
