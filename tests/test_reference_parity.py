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
