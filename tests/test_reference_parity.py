"""Cross-validation against the compiled reference C++ binaries.

Builds the reference (tools/build_reference.sh), runs its pipeline on a
synthetic SIFT-like dataset, then verifies:

1. our reader parses its codewords file and our encoder reproduces its
   codes (byte-identical up to fp-tie flips, which must be provably
   ties);
2. our DTC decoder losslessly decodes its compressed_codes_opt file
   (code multiset identical to its code file);
3. ADC distance parity: our sequential-scan oracle on ITS compressed
   stream reproduces the top-k distances of our plain scan on ITS codes;
4. reference `deltapq -task query -debug` top-1 distances match ours.

Skipped when the toolchain/OpenCV is unavailable.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from deltapq_tpu.io import (read_codewords, read_codes, write_vecs)
from deltapq_tpu.ops import pq_encode, query_plain, adc_table
from deltapq_tpu.tree.serialize import read_dtc_raw, decode_dtc_to_codes
from deltapq_tpu.tree.traverse import scan_compressed

REF_BUILD = "/tmp/refbuild"
M, K = 8, 256
N, NLEARN, NQ, DIM = 10000, 3000, 50, 32


def _build_reference():
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "build_reference.sh")
    try:
        subprocess.run(["bash", script, "/root/reference", REF_BUILD],
                       check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


have_ref = (os.path.exists(os.path.join(REF_BUILD, "pqtree"))
            and os.path.exists(os.path.join(REF_BUILD, "deltapq"))) \
    or _build_reference()

pytestmark = pytest.mark.skipif(not have_ref,
                                reason="reference binaries unavailable")


@pytest.fixture(scope="module")
def ref_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refds"))
    rng = np.random.default_rng(42)
    ncl = 64
    centers = rng.normal(size=(ncl, DIM)).astype(np.float32) * 4

    def mk(n):
        a = rng.integers(0, ncl, n)
        return (centers[a]
                + rng.normal(size=(n, DIM)).astype(np.float32))

    write_vecs(os.path.join(root, "base.fvecs"), mk(N))
    write_vecs(os.path.join(root, "learn.fvecs"), mk(NLEARN))
    write_vecs(os.path.join(root, "query.fvecs"), mk(NQ))

    def run(binary, *args):
        return subprocess.run(
            [os.path.join(REF_BUILD, binary), "-dataset", root,
             "-ext", "fvecs", *args],
            check=True, capture_output=True, text=True, timeout=600)

    run("pqtree", "-task", "learn", "-m", str(M), "-k", str(K),
        "-train_size", str(NLEARN))
    run("pqtree", "-task", "encode", "-m", str(M), "-k", str(K))
    run("deltapq", "-task", "approx_tree", "-m", str(M), "-k", str(K),
        "-h", "1", "-diff", str(M), "-N", str(N))
    return root, run


def test_codewords_file_cross_loads(ref_dataset):
    root, _ = ref_dataset
    cw = read_codewords(os.path.join(root, f"M{M}K{K}codewords.txt"))
    assert cw.shape == (M, K, DIM // M)
    assert np.isfinite(cw).all()


def test_our_encoder_reproduces_reference_codes(ref_dataset):
    root, _ = ref_dataset
    cw = read_codewords(os.path.join(root, f"M{M}K{K}codewords.txt"))
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{M}K{K}N{N}"), M=M, K=K)
    from deltapq_tpu.io import read_vecs
    base = read_vecs(os.path.join(root, "base.fvecs"))
    ours = pq_encode(cw, base)
    mism = np.flatnonzero((ours != ref_codes).any(axis=1))
    # allow only fp-tie flips; verify every mismatch is a near-tie
    assert len(mism) <= N * 0.001, f"{len(mism)} code mismatches"
    for i in mism[:20]:
        for m in range(M):
            if ours[i, m] != ref_codes[i, m]:
                sub = base[i, m * (DIM // M):(m + 1) * (DIM // M)]
                d_ours = np.sum((sub - cw[m, ours[i, m]]) ** 2)
                d_ref = np.sum((sub - cw[m, ref_codes[i, m]]) ** 2)
                assert abs(d_ours - d_ref) < 1e-3 * max(d_ours, 1.0)


def test_our_decoder_reads_reference_dtc(ref_dataset):
    root, _ = ref_dataset
    path = os.path.join(
        root, f"M{M}K{K}_Approx_compressed_codes_opt_N{N}")
    n_codes, stream = read_dtc_raw(path)
    assert n_codes == N
    decoded = decode_dtc_to_codes(stream, n_codes, M)
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{M}K{K}N{N}"), M=M, K=K)
    # decoded rows are in the reference's DFS order -> compare multisets
    a = np.sort(decoded.view([("", decoded.dtype)] * M).ravel())
    b = np.sort(ref_codes.view([("", ref_codes.dtype)] * M).ravel())
    np.testing.assert_array_equal(a, b)


def test_adc_distance_parity_on_reference_stream(ref_dataset):
    root, _ = ref_dataset
    from deltapq_tpu.io import read_vecs
    cw = read_codewords(os.path.join(root, f"M{M}K{K}codewords.txt"))
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{M}K{K}N{N}"), M=M, K=K)
    n_codes, stream = read_dtc_raw(os.path.join(
        root, f"M{M}K{K}_Approx_compressed_codes_opt_N{N}"))
    queries = read_vecs(os.path.join(root, "query.fvecs"))[:10]
    d_plain, _ = query_plain(cw, queries, ref_codes, top_k=10,
                             engine="xla")
    table = np.asarray(adc_table(cw, queries)).astype(np.float64)
    for b in range(len(queries)):
        d_seq, _ = scan_compressed(stream, n_codes, M, table[b], 10)
        np.testing.assert_allclose(np.sort(d_seq),
                                   np.sort(d_plain[b]),
                                   rtol=5e-4, atol=1e-2)


def test_reference_query_top1_distance_matches(ref_dataset):
    root, run = ref_dataset
    out = run("deltapq", "-task", "query", "-m", str(M), "-k", str(K),
              "-N", str(N), "-topk", "10", "-query_size", "10",
              "-debug", "1")
    # -debug prints "<pos> <dist>" per query
    pairs = re.findall(r"^(\d+) ([0-9.e+-]+)$", out.stdout, re.M)
    assert len(pairs) >= 10
    ref_top1 = np.array([float(d) for _, d in pairs[:10]])
    cw = read_codewords(os.path.join(root, f"M{M}K{K}codewords.txt"))
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{M}K{K}N{N}"), M=M, K=K)
    from deltapq_tpu.io import read_vecs
    queries = read_vecs(os.path.join(root, "query.fvecs"))[:10]
    d_plain, _ = query_plain(cw, queries, ref_codes, top_k=1,
                             engine="xla")
    np.testing.assert_allclose(ref_top1, d_plain[:, 0], rtol=5e-4,
                               atol=1e-2)


def _ref_stream_nbytes(path):
    with open(path, "rb") as f:
        n_codes = int(np.fromfile(f, np.int64, 1)[0])
        n_bytes = int(np.fromfile(f, np.int64, 1)[0])
    return n_codes, n_bytes


def _our_dtc_bytes(codes, K):
    """Our full build on the given codes -> DTC stream length."""
    from deltapq_tpu.tree.build import find_edges_by_diff
    from deltapq_tpu.tree.layout import build_layout
    from deltapq_tpu.tree.serialize import serialize_dtc

    res = find_edges_by_diff(codes, K=K, method=1)
    tree = build_layout(codes, res.edges, res.root_id, K=K,
                        tables="skip")
    return len(serialize_dtc(tree)), res.n_diffs


def test_compression_ratio_parity(ref_dataset):
    """Build-QUALITY parity (not just losslessness): our approx star
    forest built on the reference's OWN code file must serialize to a
    DTC stream within 5% of the size the reference binary produced.
    Both sides emit the identical byte format whose size is
    ``M + n_diffs + ceil(1.5 (N-1))`` (``deltapq_create_approx_tree.h:
    1765``), so this bounds total-diff-count parity too."""
    root, _ = ref_dataset
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{M}K{K}N{N}"), M=M, K=K)
    n_codes, ref_nbytes = _ref_stream_nbytes(os.path.join(
        root, f"M{M}K{K}_Approx_compressed_codes_opt_N{N}"))
    assert n_codes == N
    ours, n_diffs = _our_dtc_bytes(ref_codes, K)
    ref_ndiffs = ref_nbytes - M - (3 * (N - 1) + 1) // 2
    assert ours <= ref_nbytes * 1.05, (
        f"our stream {ours} B vs reference {ref_nbytes} B "
        f"(our diffs {n_diffs} vs ref {ref_ndiffs})")


# ---------------------------------------------------------------------------
# Scaled parity (N >= 100K) + GIST-shaped config — marked slow; run with
# DELTAPQ_RUN_SLOW=1 (each builds a fresh reference pipeline, minutes).
# ---------------------------------------------------------------------------

run_slow = os.environ.get("DELTAPQ_RUN_SLOW") == "1"
slow = pytest.mark.skipif(not run_slow,
                          reason="set DELTAPQ_RUN_SLOW=1 for large-N "
                                 "reference-parity runs")


def _make_ref_pipeline(root, n, dim, m, nlearn, nq, ncl, seed=7):
    """Generate data, run the reference learn/encode/approx_tree (+
    groundtruth/recall when asked) in ``root``."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(ncl, dim)).astype(np.float32) * 4

    def mk(k):
        a = rng.integers(0, ncl, k)
        return (centers[a]
                + rng.normal(size=(k, dim)).astype(np.float32))

    write_vecs(os.path.join(root, "base.fvecs"), mk(n))
    write_vecs(os.path.join(root, "learn.fvecs"), mk(nlearn))
    write_vecs(os.path.join(root, "query.fvecs"), mk(nq))

    def run(binary, *args):
        return subprocess.run(
            [os.path.join(REF_BUILD, binary), "-dataset", root,
             "-ext", "fvecs", *args],
            check=True, capture_output=True, text=True, timeout=3600)

    run("pqtree", "-task", "learn", "-m", str(m), "-k", str(K),
        "-train_size", str(nlearn))
    run("pqtree", "-task", "encode", "-m", str(m), "-k", str(K))
    return run


def _ref_recall_at10(run, root, n, m, nq):
    """Reference groundtruth + recall tasks; returns its printed
    recall@10 (main.cpp:727-803; the groundtruth filename it reads is
    hardcoded to Top10000, so the Top10 file is aliased)."""
    os.makedirs(os.path.join(root, "groundtruth"), exist_ok=True)
    run("pqtree", "-task", "groundtruth", "-m", str(m), "-k", str(K),
        "-N", str(n), "-topk", "10", "-query_size", str(nq))
    src = os.path.join(root, "groundtruth", f"N{n}Top10.txt")
    dst = os.path.join(root, "groundtruth", f"N{n}Top10000.txt")
    if not os.path.exists(dst):
        os.link(src, dst)
    out = run("pqtree", "-task", "recall", "-m", str(m), "-k", str(K),
              "-N", str(n), "-topk", "10", "-query_size", str(nq))
    nums = re.findall(r"^([01](?:\.\d+)?(?:e-?\d+)?)$", out.stdout, re.M)
    assert nums, f"no recall line in: {out.stdout[-500:]}"
    return float(nums[-1])


def _our_recall_at10(root, n, m, nq):
    """Our plain-path recall@10 on the REFERENCE's codes + groundtruth
    (isolates ranking parity from training noise)."""
    from deltapq_tpu.io import read_groundtruth, read_vecs
    from deltapq_tpu.eval.metrics import recall_at_k

    cw = read_codewords(os.path.join(root, f"M{m}K{K}codewords.txt"))
    codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{m}K{K}N{n}"), M=m, K=K)
    queries = read_vecs(os.path.join(root, "query.fvecs"))[:nq]
    _, ids = query_plain(cw, queries, codes, top_k=10, engine="xla")
    gt_ids, _ = read_groundtruth(
        os.path.join(root, "groundtruth", f"N{n}Top10.txt"))
    return float(recall_at_k(ids, gt_ids[:, :10], k=10))


@slow
def test_parity_100k_compression_and_recall(tmp_path):
    """VERDICT r2 #3/#8: 100K-row reference parity — DTC size within
    5% on identical codes, and plain-path recall@10 equal to the
    reference binary's own printed recall."""
    n, dim, m, nq = 100_000, 32, 8, 100
    root = str(tmp_path)
    run = _make_ref_pipeline(root, n, dim, m, nlearn=10_000, nq=nq,
                             ncl=2000)
    run("deltapq", "-task", "approx_tree", "-m", str(m), "-k", str(K),
        "-h", "1", "-diff", str(m), "-N", str(n))
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{m}K{K}N{n}"), M=m, K=K)
    n_codes, ref_nbytes = _ref_stream_nbytes(os.path.join(
        root, f"M{m}K{K}_Approx_compressed_codes_opt_N{n}"))
    assert n_codes == n
    ours, n_diffs = _our_dtc_bytes(ref_codes, K)
    assert ours <= ref_nbytes * 1.05, (ours, ref_nbytes)

    rec_ref = _ref_recall_at10(run, root, n, m, nq)
    rec_ours = _our_recall_at10(root, n, m, nq)
    assert abs(rec_ours - rec_ref) <= 0.002, (rec_ours, rec_ref)


@slow
def test_parity_1m_compression_and_recall(tmp_path):
    """1M-row reference parity (VERDICT r3 #5): the environment has
    no network egress (DNS resolution fails for every host — probed
    round 4, documented in docs/STATUS.md), so corpus-texmex
    SIFT1M/GIST1M cannot be fetched; this scales the synthetic parity
    pipeline to SIFT1M's row count against the compiled reference
    binary instead: DTC stream within 5% on identical codes, and
    plain-path recall@10 equal to the reference's own printed
    recall."""
    n, dim, m, nq = 1_000_000, 32, 8, 200
    root = str(tmp_path)
    run = _make_ref_pipeline(root, n, dim, m, nlearn=20_000, nq=nq,
                             ncl=20_000)
    run("deltapq", "-task", "approx_tree", "-m", str(m), "-k", str(K),
        "-h", "1", "-diff", str(m), "-N", str(n))
    ref_codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{m}K{K}N{n}"), M=m, K=K)
    n_codes, ref_nbytes = _ref_stream_nbytes(os.path.join(
        root, f"M{m}K{K}_Approx_compressed_codes_opt_N{n}"))
    assert n_codes == n
    ours, n_diffs = _our_dtc_bytes(ref_codes, K)
    assert ours <= ref_nbytes * 1.05, (ours, ref_nbytes)

    rec_ref = _ref_recall_at10(run, root, n, m, nq)
    rec_ours = _our_recall_at10(root, n, m, nq)
    assert abs(rec_ours - rec_ref) <= 0.005, (rec_ours, rec_ref)


@slow
def test_parity_gist_shape_plain_recall(tmp_path):
    """GIST1M-shaped config (960-dim, M=16) plain-path parity vs the
    compiled reference: recall@10 on its codes/groundtruth (BASELINE
    config 3 shape; DTC serialization is M<=8-only in the reference
    format, so the compressed leg does not apply).

    nq=200 so one tie flip (0.0005) is far below the 0.005 tolerance
    (VERDICT r3 weak #3: at nq=20 a single flipped neighbor equalled
    the tolerance and the test failed deterministically).  Every
    per-query overlap discrepancy is additionally audited to be a
    provable f64 near-tie at the ADC top-10 boundary — the round-4
    diagnosis (tools/diag_gist_parity.py) measured 90/200 queries with
    boundary ties explaining the entire residual, 0 real divergences."""
    n, dim, m, nq = 100_000, 960, 16, 200
    root = str(tmp_path)
    run = _make_ref_pipeline(root, n, dim, m, nlearn=5_000, nq=nq,
                             ncl=2000)
    os.makedirs(os.path.join(root, "groundtruth"), exist_ok=True)
    run("pqtree", "-task", "groundtruth", "-m", str(m), "-k", str(K),
        "-N", str(n), "-topk", "10", "-query_size", str(nq))
    src = os.path.join(root, "groundtruth", f"N{n}Top10.txt")
    dst = os.path.join(root, "groundtruth", f"N{n}Top10000.txt")
    if not os.path.exists(dst):
        os.link(src, dst)
    out = run("pqtree", "-task", "recall", "-m", str(m), "-k", str(K),
              "-N", str(n), "-topk", "10", "-query_size", str(nq),
              "-debug", "1")
    # -debug prints the cumulative score after each query: recover
    # per-query overlap as the difference of consecutive cumulatives
    cums = np.array([float(x) for x in re.findall(
        r"^([01](?:\.\d+)?(?:e-?\d+)?)$", out.stdout, re.M)][:nq])
    assert len(cums) == nq
    per_q_ref = np.round(np.diff(np.concatenate(
        [[0.0], cums * np.arange(1, nq + 1)])) * 10) / 10
    rec_ref = float(cums[-1])

    from deltapq_tpu.io import read_groundtruth, read_vecs
    cw = read_codewords(os.path.join(root, f"M{m}K{K}codewords.txt"))
    codes, _ = read_codes(
        os.path.join(root, f"codes.bin.plain.M{m}K{K}N{n}"), M=m, K=K)
    queries = read_vecs(os.path.join(root, "query.fvecs"))[:nq]
    gt_ids, _ = read_groundtruth(src)
    _, ids = query_plain(cw, queries, codes, top_k=10, engine="xla")
    per_q_ours = np.array([
        len(set(ids[q].tolist()) & set(gt_ids[q, :10].tolist())) / 10
        for q in range(nq)])
    rec_ours = float(per_q_ours.mean())
    assert abs(rec_ours - rec_ref) <= 0.005, (rec_ours, rec_ref)

    # tie audit: an overlap discrepancy requires the two sides' ADC
    # top-10 SETS to differ, which (same codes, same table) can only
    # happen via fp rounding at the boundary — prove it in f64
    table = np.asarray(adc_table(cw, queries)).astype(np.float64)
    ci = codes.astype(np.int64)
    for q in np.flatnonzero(np.abs(per_q_ours - per_q_ref) > 1e-6):
        d64 = table[q, np.arange(m)[None, :], ci].sum(axis=1)
        srt = np.sort(d64)
        gap = (srt[10] - srt[9]) / max(srt[9], 1e-12)
        assert gap < 1e-5, (q, gap)
