"""QPS-under-load for the dedup product tier behind CoalescingServer
(VERDICT r4 #8): concurrent client threads submit 512-row waves; the
server coalesces to ``wave_rows`` dispatches; the host-side dedup
``expand`` runs on the dispatcher thread — this measures whether it
serializes waves at B=2048.

Usage: python tools/bench_serving.py [wave_rows] [n_waves] [workload]
"""

import os
import sys
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from bench import WORKLOADS, make_clustered_codes
    from deltapq_tpu.ops.fused import DedupCompressedEngine
    from deltapq_tpu.serving import CoalescingServer

    wave_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    name = sys.argv[3] if len(sys.argv) > 3 else "dup_heavy"
    N, M, K, B = 1_048_576, 8, 256, 512
    D = M * 16
    cw, codes = make_clustered_codes(N, M, K, **WORKLOADS[name])
    eng = DedupCompressedEngine(cw, codes, precision="int16")
    print(f"[serving] n_unique={eng.n_unique} wave_rows={wave_rows}",
          flush=True)

    rng = np.random.default_rng(0)
    waves = [rng.normal(size=(B, D)).astype(np.float32) * 2
             for _ in range(n_waves)]

    srv = CoalescingServer(eng, wave_rows=wave_rows, max_wait_ms=5,
                           top_k=10, warmup=True)
    # saturate once so every shape is compiled before timing
    for f in [srv.submit(w) for w in waves[:8]]:
        f.result(timeout=300)

    t0 = time.time()
    futs = []

    def client(lo, hi):
        for w in waves[lo:hi]:
            futs.append(srv.submit(w))

    threads = [threading.Thread(target=client,
                                args=(i * n_waves // 8,
                                      (i + 1) * n_waves // 8))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for f in list(futs):
        f.result(timeout=600)
    dt = time.time() - t0
    total = n_waves * B
    print(f"[serving] {total} queries in {dt:.3f}s = "
          f"{total / dt:,.0f} QPS under load "
          f"({srv.dispatches} dispatches, "
          f"{srv.rows_served} rows served)", flush=True)
    srv.close()


if __name__ == "__main__":
    main()
