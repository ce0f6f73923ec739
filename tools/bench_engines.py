"""Consolidated engine benchmark (all scan engines, honest timing).

Usage:  python tools/bench_engines.py [N] [B]
Runs on whatever backend JAX selects (TPU via axon, or CPU).  Uses the
salted fori_loop difference-quotient methodology (the axon relay caches
identical dispatches; see bench.py).
"""

import functools
import sys
import time

import numpy as np


def measure(fn, args, iters=(1, 6), repeats=2):
    import jax.numpy as jnp

    for it in iters:
        float(fn(*args, jnp.float32(0), it))
    res = {}
    for it in iters:
        ts = []
        for k in range(repeats):
            t = time.perf_counter()
            float(fn(*args, jnp.float32(k + 7 * it + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])


def main():
    import jax
    import jax.numpy as jnp

    from deltapq_tpu.ops.adc import adc_table, adc_query_topk, pad_codes
    from deltapq_tpu.ops.adc_pallas import (adc_topk_pallas,
                                            adc_topk_packed,
                                            adc_topk_tiledict,
                                            build_tile_dict,
                                            TileDictEngine)
    from deltapq_tpu.ops.decoded import DecodedEngine, decoded_topk

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    M, K, Ds, top_k = 8, 256, 16, 10
    on_tpu = jax.default_backend() in ("tpu", "axon")

    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    # clustered codes so TileDict is applicable
    pool = rng.integers(0, K, size=(max(N // 200, 16), M))
    codes_np = pool[rng.integers(0, len(pool), N)]
    mut = rng.random((N, M)) < 0.15
    codes_np = np.where(mut, rng.integers(0, K, size=(N, M)),
                        codes_np).astype(np.uint8)
    qb = jnp.asarray(rng.normal(size=(B, M * Ds)).astype(np.float32))
    cwd = jnp.asarray(cw)
    codes = jnp.asarray(pad_codes(codes_np, 65536))

    def bench_of(qfn):
        @functools.partial(jax.jit, static_argnames="it")
        def loop(codes, qb, salt, it):
            def body(i, acc):
                q = qb + (salt + i.astype(jnp.float32)) * 1e-6
                d, idx = qfn(q, codes)
                return acc + jnp.sum(d) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, it, body, jnp.float32(0))
        return loop

    results = {}

    def run(name, qfn, *extra_args):
        try:
            loop = bench_of(qfn)
            pb = measure(loop, (codes, qb) if not extra_args else extra_args,
                         iters=(1, 6))
            results[name] = pb
            print(f"{name}: {pb*1e3:.3f} ms/batch  QPS {B/pb:.0f}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)

    run("xla-gather", lambda q, c: adc_query_topk(
        adc_table(cwd, q), c, jnp.int32(N), top_k, 65536))
    if on_tpu:
        run("pallas-argmin-f32", lambda q, c: adc_topk_pallas(
            adc_table(cwd, q), c, jnp.int32(N), top_k, 4096, "f32"))
        run("pallas-packed-bf16x2", lambda q, c: adc_topk_packed(
            adc_table(cwd, q), c, jnp.int32(N), top_k, 4096, "bf16x2"))
        built = build_tile_dict(np.asarray(codes), tile_n=2048,
                                max_dict=64)
        if built is not None:
            dicts, idx, D = built
            idx_d, dicts_d = jnp.asarray(idx), jnp.asarray(dicts)
            print(f"tiledict width: {D}")
            run("pallas-tiledict-f32", lambda q, c: adc_topk_tiledict(
                adc_table(cwd, q), idx_d, dicts_d, c, jnp.int32(N),
                top_k, 2048))
        eng = DecodedEngine(cw, codes_np)
        for prec, rr in (("bf16x2", True), ("bf16x2", False),
                         ("bf16", False)):
            run(f"decoded-{prec}-rerank={rr}",
                lambda q, c, prec=prec, rr=rr: decoded_topk(
                    eng.xhat_hi, eng.xhat_lo, eng.precomp,
                    adc_table(cwd, q), eng.codes, q, jnp.int32(N),
                    top_k, prec, False, rr))
    return results


if __name__ == "__main__":
    main()
