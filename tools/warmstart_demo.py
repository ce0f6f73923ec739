"""Cold-start budget demo (VERDICT r3 #6): a FRESH process serving its
first query wave at near-steady latency via engine.warmup + the
persistent XLA compile cache.

Phase 1 (build): make a 2M-row stream-tile engine from the bigrun
workload distribution, save it, run warmup once (populates the
persistent compile cache), report in-process timings.

Phase 2 (measure, run in a NEW process): load the saved engine
(device upload only), warmup() — which now hits the compile cache —
then time the first real query wave and the steady state.

Usage:
    python tools/warmstart_demo.py build   [N] [B]
    python tools/warmstart_demo.py measure [N] [B]
Writes /tmp/warmstart_demo/ artifacts and prints one JSON line each.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DIR = "/tmp/warmstart_demo"
D, M, K = 128, 8, 256


def make_workload(n, b, seed=7):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bigrun import chunk_vectors, n_clusters_for

    rng = np.random.default_rng(seed)
    centers = rng.normal(
        size=(n_clusters_for(n), D)).astype(np.float32) * 40.0
    queries = chunk_vectors(999_999, b, centers).astype(np.float32)
    return centers, queries


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    top_k = 10

    import jax

    from deltapq_tpu.ops.fused import FusedCompressedEngine

    if mode == "build":
        from deltapq_tpu.bigscale import encode_stream
        from deltapq_tpu.ops.kmeans import pq_learn

        centers, queries = make_workload(n, b)
        sys.path.insert(0, os.path.join(ROOT, "tools"))
        from bigrun import chunk_vectors

        cw = pq_learn(jax.random.PRNGKey(0),
                      chunk_vectors(0, min(100_000, n), centers),
                      M=M, K=K, max_iters=60)
        chunks = (chunk_vectors(c, min(1_000_000, n - c * 1_000_000),
                                centers)
                  for c in range(-(-n // 1_000_000)))
        codes = encode_stream(cw, chunks)
        order = np.lexsort(codes.T[::-1])
        eng = FusedCompressedEngine(cw, codes[order], row_to_db=order,
                                    precision="int8")
        os.makedirs(DIR, exist_ok=True)
        eng.save(os.path.join(DIR, "engine"))
        np.save(os.path.join(DIR, "queries.npy"), queries)
        t0 = time.time()
        eng.warmup(batch_sizes=(b,), top_k=top_k)
        t_warm = time.time() - t0
        t0 = time.time()
        eng.query(queries, top_k=top_k)
        t_first = time.time() - t0
        print(json.dumps({"phase": "build", "n": n,
                          "t_warmup_s": round(t_warm, 2),
                          "t_first_after_warmup_s": round(t_first, 3)}))
        return

    # measure: FRESH process — engine load is device upload only;
    # warmup compiles via the persistent cache
    eng = FusedCompressedEngine.load(os.path.join(DIR, "engine"))
    # load() restores bf16 mode; re-quantize for the int8 product path
    eng2 = FusedCompressedEngine.from_tiles(
        np.asarray(eng.codewords), eng.tiles,
        row_to_db=(np.asarray(eng.row_to_db)
                   if eng.row_to_db is not None else None),
        precision="int8")
    queries = np.load(os.path.join(DIR, "queries.npy"))
    t0 = time.time()
    eng2.warmup(batch_sizes=(b,), top_k=top_k)
    t_warm = time.time() - t0
    t0 = time.time()
    eng2.query(queries, top_k=top_k)
    t_first = time.time() - t0
    ts = []
    for i in range(3):
        q = queries * (1.0 + (i + 1) * 0.01)
        t0 = time.time()
        eng2.query(q.astype(np.float32), top_k=top_k)
        ts.append(time.time() - t0)
    t_steady = min(ts)
    print(json.dumps({
        "phase": "measure", "n": n,
        "t_warmup_s": round(t_warm, 2),
        "t_first_query_s": round(t_first, 3),
        "t_steady_s": round(t_steady, 3),
        "first_over_steady": round(t_first / max(t_steady, 1e-9), 2)}))


if __name__ == "__main__":
    main()
