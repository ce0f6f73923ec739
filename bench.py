"""Benchmark: batched plain-ADC top-k query throughput on one chip.

Prints ONE JSON line:
  {"metric": "adc_qps_per_chip", "value": N, "unit": "queries/s",
   "vs_baseline": R}

Workload: SIFT1M-scale synthetic index (N=1M codes, M=8, K=256), query
batches of 128, top-10 — the reference's headline query configuration
(BASELINE.md).  The timed region is the full per-batch pipeline: ADC
table build + scan + top-k, steady-state on device.

Measurement methodology: the axon relay caches identical dispatches, so
naive repeated timing over-reports by ~10x.  Each timed dispatch gets a
fresh scalar salt feeding the computation, the workload loops `iters`
times inside one jit (`lax.fori_loop`, per-iteration salted queries),
only a scalar returns to the host, and the per-batch time is the
difference quotient between two loop lengths.

vs_baseline: the reference repo records no numbers (BASELINE.md §1).
The denominator is 125 QPS — a single-core C++ plain ADC scan at 8
ms/query over 1M codes, which is what the reference's `-task query`
loop does per query (``pq_tree.cpp:434-503``; serial per-query scan,
[msec/query] printed at ``main.cpp:563``).
"""

import functools
import json
import sys
import time

import numpy as np

BASELINE_QPS = 125.0


def measure(bench_fn, args, iters=(1, 11), repeats=2):
    """Difference-quotient timing with salted dispatches."""
    for it in iters:
        float(bench_fn(*args, np.float32(0), it))  # compile + warm
    res = {}
    for it in iters:
        ts = []
        for k in range(repeats):
            t = time.perf_counter()
            float(bench_fn(*args, np.float32(k + 7 * it + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])


def main():
    import jax
    import jax.numpy as jnp

    from deltapq_tpu.ops.adc import adc_table, adc_query_topk
    from deltapq_tpu.ops.adc_pallas import adc_topk_pallas

    M, K, Ds = 8, 256, 16
    N, B, top_k = 1_048_576, 128, 10

    rng = np.random.default_rng(0)
    cw = jnp.asarray(rng.normal(size=(M, K, Ds)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, K, size=(N, M)).astype(np.uint8))
    qb = jnp.asarray(rng.normal(size=(B, M * Ds)).astype(np.float32))

    on_tpu = jax.default_backend() in ("tpu", "axon")

    @functools.partial(jax.jit, static_argnames=("iters", "engine"))
    def bench(cw, codes, qb, salt, iters, engine):
        def body(i, acc):
            q = qb + (salt + i.astype(jnp.float32)) * 1e-6
            tab = adc_table(cw, q)
            if engine == "pallas":
                d, idx = adc_topk_pallas(tab, codes, jnp.int32(N), top_k,
                                         4096, "f32")
            else:
                d, idx = adc_query_topk(tab, codes, jnp.int32(N), top_k,
                                        65536)
            return acc + jnp.sum(d) + jnp.sum(idx).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    engine = "pallas" if on_tpu else "xla"
    run = lambda cw_, codes_, qb_, salt, it: bench(  # noqa: E731
        cw_, codes_, qb_, jnp.float32(salt), it, engine)
    per_batch = measure(run, (cw, codes, qb))
    qps = B / per_batch

    print(json.dumps({
        "metric": "adc_qps_per_chip",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
    }))
    print(f"# engine={engine} {per_batch*1000:.2f} ms/batch of {B} "
          f"(N={N}, M={M}, K={K}, top_k={top_k})", file=sys.stderr)


if __name__ == "__main__":
    main()
