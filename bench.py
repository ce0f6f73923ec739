"""Benchmark: batched plain-ADC top-k query throughput on one chip.

Prints ONE JSON line:
  {"metric": "adc_qps_per_chip", "value": N, "unit": "queries/s",
   "vs_baseline": R}

Workload: SIFT1M-scale synthetic index (N=1M codes, M=8, K=256), query
batches of 128, top-10 — the reference's headline query configuration
(BASELINE.md).  The timed region is the full per-batch pipeline: ADC
table build + streaming scan + top-k, steady-state on device.

vs_baseline: the reference repo records no numbers (BASELINE.md §1).
The denominator is 125 QPS — a single-core C++ plain ADC scan at 8
ms/query over 1M codes, which is what the reference's `-task query`
loop does per query (``pq_tree.cpp:434-503``, serial per-query scan;
the reference prints [msec/query] at ``main.cpp:563``).
"""

import json
import sys
import time

import numpy as np

BASELINE_QPS = 125.0


def main():
    import jax
    import jax.numpy as jnp

    from deltapq_tpu.ops.adc import adc_table, adc_query_topk, pad_codes

    M, K, Ds = 8, 256, 16
    N, B, top_k, tile_n = 1_000_000, 128, 10, 65536

    rng = np.random.default_rng(0)
    codewords = jnp.asarray(rng.normal(size=(M, K, Ds)).astype(np.float32))
    codes_np = rng.integers(0, K, size=(N, M)).astype(np.uint8)
    codes = jnp.asarray(pad_codes(codes_np, tile_n))
    queries = jnp.asarray(rng.normal(size=(B, M * Ds)).astype(np.float32))

    def batch_query(queries):
        table = adc_table(codewords, queries)
        return adc_query_topk(table, codes, jnp.int32(N), top_k, tile_n)

    fn = jax.jit(batch_query)
    # warmup / compile
    d, i = fn(queries)
    d.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        d, i = fn(queries)
    d.block_until_ready()
    dt = time.perf_counter() - t0

    qps = iters * B / dt
    print(json.dumps({
        "metric": "adc_qps_per_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }))
    print(f"# {dt/iters*1000:.2f} ms/batch of {B} (N={N}, M={M}, K={K}, "
          f"top_k={top_k})", file=sys.stderr)


if __name__ == "__main__":
    main()
