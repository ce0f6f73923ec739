"""Diagnose the GIST-shaped (M=16, 960-dim) plain-recall parity gap
(VERDICT r3 weak #3): build the reference pipeline at nq=200, compare
per-query overlap scores (reference -debug 1 prints the cumulative
score after each query), and audit every discrepancy for provable fp
ties at the top-10 boundary (ADC side and groundtruth side).

Usage: JAX_PLATFORMS=cpu python tools/diag_gist_parity.py [workdir]
"""

import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))

from deltapq_tpu.io import (read_codewords, read_codes, read_groundtruth,
                            read_vecs, write_vecs)
from deltapq_tpu.ops import adc_table, query_plain

REF_BUILD = "/tmp/refbuild"
K = 256


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gistdiag"
    n, dim, m, nq, nlearn, ncl = 100_000, 960, 16, 200, 5_000, 2000
    os.makedirs(root, exist_ok=True)

    def run(binary, *args):
        return subprocess.run(
            [os.path.join(REF_BUILD, binary), "-dataset", root,
             "-ext", "fvecs", *args],
            check=True, capture_output=True, text=True, timeout=7200)

    if not os.path.exists(os.path.join(root, "base.fvecs")):
        rng = np.random.default_rng(7)
        centers = rng.normal(size=(ncl, dim)).astype(np.float32) * 4

        def mk(k):
            a = rng.integers(0, ncl, k)
            return (centers[a]
                    + rng.normal(size=(k, dim)).astype(np.float32))

        write_vecs(os.path.join(root, "base.fvecs"), mk(n))
        write_vecs(os.path.join(root, "learn.fvecs"), mk(nlearn))
        write_vecs(os.path.join(root, "query.fvecs"), mk(nq))

    cw_path = os.path.join(root, f"M{m}K{K}codewords.txt")
    if not os.path.exists(cw_path):
        print("learn..."); run("pqtree", "-task", "learn", "-m", str(m),
                               "-k", str(K), "-train_size", str(nlearn))
    codes_path = os.path.join(root, f"codes.bin.plain.M{m}K{K}N{n}")
    if not os.path.exists(codes_path):
        print("encode..."); run("pqtree", "-task", "encode", "-m",
                                str(m), "-k", str(K))
    gt_path = os.path.join(root, "groundtruth", f"N{n}Top10.txt")
    if not os.path.exists(gt_path):
        print("groundtruth...")
        os.makedirs(os.path.join(root, "groundtruth"), exist_ok=True)
        run("pqtree", "-task", "groundtruth", "-m", str(m), "-k",
            str(K), "-N", str(n), "-topk", "10", "-query_size",
            str(nq))
    dst = os.path.join(root, "groundtruth", f"N{n}Top10000.txt")
    if not os.path.exists(dst):
        os.link(gt_path, dst)

    print("reference recall (-debug 1)...")
    out = run("pqtree", "-task", "recall", "-m", str(m), "-k", str(K),
              "-N", str(n), "-topk", "10", "-query_size", str(nq),
              "-debug", "1")
    # debug prints, per query: "<id> <dist>" (top-1), then
    # "<q0> <id> <dist>", then the cumulative score line
    cums = [float(x) for x in re.findall(
        r"^([01](?:\.\d+)?(?:e-?\d+)?)$", out.stdout, re.M)]
    assert len(cums) >= nq + 1, len(cums)
    cums = np.array(cums[:nq])
    per_q_ref = np.round(np.diff(np.concatenate([[0.0],
                         cums * np.arange(1, nq + 1)])) * 10) / 10
    rec_ref = cums[-1]

    cw = read_codewords(cw_path)
    codes, _ = read_codes(codes_path, M=m, K=K)
    queries = read_vecs(os.path.join(root, "query.fvecs"))[:nq]
    gt_ids, gt_d = read_groundtruth(gt_path)
    d_ours, ids_ours = query_plain(cw, queries, codes, top_k=10,
                                   engine="xla")
    per_q_ours = np.array([
        len(set(ids_ours[q].tolist()) & set(gt_ids[q, :10].tolist()))
        / 10 for q in range(nq)])
    rec_ours = float(per_q_ours.mean())
    print(f"recall ref={rec_ref:.4f} ours={rec_ours:.4f} "
          f"diff={rec_ours - rec_ref:+.4f}")

    # f64 audit of every per-query discrepancy
    bad = np.flatnonzero(np.abs(per_q_ours - per_q_ref) > 1e-6)
    print(f"{len(bad)} queries with differing overlap: {bad[:20]}")
    table = np.asarray(adc_table(cw, queries)).astype(np.float64)
    ci = codes.astype(np.int64)
    n_tie_adc = n_tie_gt = n_real = 0
    for q in bad:
        d64 = table[q, np.arange(m)[None, :], ci].sum(axis=1)
        srt = np.sort(d64)
        d10, d11 = srt[9], srt[10]
        # boundary gaps, relative: ADC side and groundtruth side
        gap_adc = (d11 - d10) / max(d10, 1e-12)
        ggap = (gt_d[q, 10] - gt_d[q, 9]) / max(gt_d[q, 9], 1e-12) \
            if gt_d.shape[1] > 10 else np.inf
        tie_adc = gap_adc < 1e-5
        tie_gt = ggap < 1e-5
        n_tie_adc += tie_adc
        n_tie_gt += tie_gt
        if not (tie_adc or tie_gt):
            n_real += 1
            print(f"  q={q}: REAL divergence? overlap ours="
                  f"{per_q_ours[q]:.1f} ref={per_q_ref[q]:.1f} "
                  f"gap_adc={gap_adc:.2e} gap_gt={ggap:.2e}")
    print(f"audit: adc-boundary ties {n_tie_adc}, gt-boundary ties "
          f"{n_tie_gt}, unexplained {n_real}")


if __name__ == "__main__":
    main()
