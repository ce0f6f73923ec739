"""End-to-end CLI pipeline test on a synthetic dataset directory:
learn -> encode -> groundtruth -> query/recall -> approx_tree ->
query_compressed -> diff_index -> update."""

import os

import numpy as np
import pytest

from deltapq_tpu.cli import main
from deltapq_tpu.io import write_vecs, read_codes, read_groundtruth


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("sift_tiny")
    ncl, d = 24, 16
    centers = rng.normal(size=(ncl, d)).astype(np.float32) * 4
    def mk(n):
        a = rng.integers(0, ncl, n)
        # enough intra-cluster spread that ADC can rank neighbors
        return (centers[a] +
                rng.normal(size=(n, d)).astype(np.float32) * 1.0)
    write_vecs(str(root / "base.fvecs"), mk(3000))
    write_vecs(str(root / "learn.fvecs"), mk(1000))
    write_vecs(str(root / "query.fvecs"), mk(20))
    return str(root)


COMMON = ["-ext", "fvecs", "-m", "8", "-k", "32"]


def run(dataset, *extra):
    rc = main(["-dataset", dataset, *COMMON, *extra])
    assert rc == 0 or rc is None


def test_full_pipeline(dataset_dir, capsys):
    run(dataset_dir, "-task", "learn", "-train_size", "800")
    assert os.path.exists(os.path.join(dataset_dir, "M8K32codewords.txt"))

    run(dataset_dir, "-task", "encode")
    codes, _ = read_codes(os.path.join(dataset_dir,
                                       "codes.bin.plain.M8K32N3000"), M=8)
    assert codes.shape == (3000, 8)

    run(dataset_dir, "-task", "groundtruth", "-topk", "10")
    gt_ids, gt_d = read_groundtruth(
        os.path.join(dataset_dir, "groundtruth", "N3000Top10.txt"))
    assert gt_ids.shape == (20, 10)

    run(dataset_dir, "-task", "recall", "-topk", "10")
    out = capsys.readouterr().out
    import json
    metrics = json.loads(out.strip().splitlines()[-1])
    # 8x32 PQ on 16-dim data quantizes hard; recall well above chance
    # (10/3000) but below 1.0 is expected
    assert metrics["recall"] > 0.3, out

    run(dataset_dir, "-task", "approx_tree")
    dtc = os.path.join(dataset_dir,
                       "M8K32_Approx_compressed_codes_opt_N3000")
    assert os.path.exists(dtc)
    assert os.path.getsize(dtc) - 16 < 3000 * 8  # compresses

    run(dataset_dir, "-task", "query_compressed", "-topk", "10")
    run(dataset_dir, "-task", "diff_index")
    assert os.path.exists(os.path.join(dataset_dir,
                                       "M8K32_diff_index_N3000"))
    run(dataset_dir, "-task", "update", "-query_size", "100")
    run(dataset_dir, "-task", "mAP", "-topk", "10")


def test_sharded_query_cli(dataset_dir):
    run(dataset_dir, "-task", "query", "-topk", "5", "-shards", "4")


def test_synth_and_combine_and_rand_sample(dataset_dir, tmp_path):
    # synthetic chain dataset written as a code file
    run(dataset_dir, "-task", "encode", "-synth", "1", "-N", "500")
    import numpy as np
    from deltapq_tpu.io import read_codes
    codes, _ = read_codes(os.path.join(dataset_dir,
                                       "codes.bin.plain.M8K32N500"), M=8)
    # chain property: consecutive codes differ in exactly one subspace
    diffs = (codes[1:] != codes[:-1]).sum(axis=1)
    assert (diffs == 1).all()

    # combine two code files
    a = os.path.join(dataset_dir, "codes.bin.plain.M8K32N3000")
    run(dataset_dir, "-task", "combine", "-src_a", a, "-src_b",
        os.path.join(dataset_dir, "codes.bin.plain.M8K32N500"))
    comb, _ = read_codes(os.path.join(dataset_dir,
                                      "codes.bin.plain.M8K32N3500"), M=8)
    assert comb.shape == (3500, 8)
    os.remove(os.path.join(dataset_dir, "codes.bin.plain.M8K32N3500"))
    os.remove(os.path.join(dataset_dir, "codes.bin.plain.M8K32N500"))

    # rand_sample self-query histogram
    run(dataset_dir, "-task", "rand_sample", "-rand_sample", "50")


def test_approx_with_id_cli(dataset_dir):
    run(dataset_dir, "-task", "approx_with_id")
    assert os.path.exists(os.path.join(
        dataset_dir,
        "M8K32_Approx_compressed_codes_opt_with_id_N3000.soa.npz"))


def test_diff_scan_and_accuracy_cli(dataset_dir):
    run(dataset_dir, "-task", "diff_scan", "-topk", "5")
    run(dataset_dir, "-task", "accuracy", "-topk", "10")


def test_query_compressed_engine_fallbacks(dataset_dir):
    run(dataset_dir, "-task", "query_compressed", "-topk", "5",
        "-engine", "xla")


def test_artifact_caching_skips_rebuild(dataset_dir, capsys):
    # second invocation of cached stages must skip (reference
    # exists_test3 semantics)
    run(dataset_dir, "-task", "learn", "-train_size", "500")
    out = capsys.readouterr().out
    assert "skipping" in out or "REMINDER" in out
    run(dataset_dir, "-task", "approx_tree")
    out = capsys.readouterr().out
    assert "No need to rebuild" in out


def test_query_continuous_batching(dataset_dir):
    run(dataset_dir, "-task", "query", "-topk", "5", "-batch", "8",
        "-engine", "xla")
