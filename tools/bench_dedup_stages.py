"""Stage timing for the dedup tier's device path at 1M/B=512:
(a) table+quantize, (b) stream kernel, (c) esc-select, (d) whole.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.adc import adc_table
    from deltapq_tpu.ops.fused import (DedupCompressedEngine,
                                       _default_n_sub, _pool_for,
                                       fused_select_esc)

    M, K, Ds = 8, 256, 16
    N, B, top_k = 1_048_576, 512, 10
    D = M * Ds
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = np.load("/tmp/deltapq_knobs_codes_1m.npz")["codes"]
    qb = rng.normal(size=(B, D)).astype(np.float32)

    ded = DedupCompressedEngine(cw, codes, precision="int8")
    e = ded.engine
    n_valid = ded.n_unique
    print("n_unique", n_valid, "tiles", e.row_data.shape)

    ns_total = e.row_data.shape[0] * fp.TILE // fp.SUB
    pool = _pool_for(ns_total)
    n_units = -(-ns_total // pool)
    unit = fp.SUB * pool
    ns = min(_default_n_sub(top_k, n_units, unit),
             max(n_units - 1, 1))
    ns_cap = min(max(n_units - 1, 1), max(ns, 16384 // unit))
    rungs = tuple(dict.fromkeys([ns, min(ns * 16, ns_cap)]))
    print("pool", pool, "rungs", rungs)
    cwj = jnp.asarray(cw)
    mu = jnp.asarray(e.mu)
    inv_s = jnp.float32(1.0 / e.scale)
    s2 = jnp.float32(e.scale * e.scale)
    err_c = jnp.float32(e.err_c)
    e_max, scale = e.tiles.e_max, e.scale

    def stage_fn(stage):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def f(qb, salt, iters):
            def body(i, acc):
                q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
                tab = adc_table(cwj, q[:, :D])
                qc = q - mu[None, :]
                uq = jnp.maximum(
                    1.0, jnp.max(jnp.abs(qc), axis=1) * inv_s / 127.0)
                qq = jnp.clip(jnp.round(qc * inv_s / uq[:, None]),
                              -127, 127).astype(jnp.int8)
                q2 = s2 * uq * uq * jnp.sum(
                    qq.astype(jnp.float32) ** 2, axis=1)
                e_q = jnp.sqrt(jnp.sum(
                    (qc - (jnp.float32(scale) * uq[:, None])
                     * qq.astype(jnp.float32)) ** 2, axis=1))
                if stage == "prep":
                    return acc + jnp.sum(q2) + jnp.sum(e_q) + jnp.sum(
                        tab) + jnp.sum(qq.astype(jnp.float32))
                mins, echo = fp.fused_stream_mins(
                    qq.T, e.cwbd, e.row_data, e.vals, e.meta,
                    jnp.int32(n_valid), e_max, M, u=uq[None, :])
                if stage == "kernel":
                    return acc + jnp.sum(mins) + jnp.sum(
                        echo.astype(jnp.float32))
                d, r, ok, _ = fused_select_esc(
                    mins, q2, tab, echo, jnp.int32(n_valid), top_k,
                    rungs, pool, err_r=e_q + err_c, scale2=s2,
                    final_exact=(stage == "full"))
                return acc + jnp.sum(d) + jnp.sum(ok.astype(
                    jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return f

    qj = jnp.asarray(qb)
    for stage in ["prep", "kernel", "esc", "full"]:
        f = stage_fn(stage)
        for it in (2, 12):
            float(f(qj, jnp.float32(0), it))
        res = {}
        for it in (2, 12):
            ts = []
            for k in range(3):
                t = time.perf_counter()
                float(f(qj, jnp.float32(k + 1), it))
                ts.append(time.perf_counter() - t)
            res[it] = min(ts)
        per = (res[12] - res[2]) / 10
        print(f"{stage:7s} {per*1000:8.3f} ms/batch")

    # rung-config sweep: per-batch cost + first-shot certified frac
    def full_fn(rungs_):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def f(qb, salt, iters):
            def body(i, carry):
                acc, nok1 = carry
                q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
                tab = adc_table(cwj, q[:, :D])
                qc = q - mu[None, :]
                uq = jnp.maximum(
                    1.0, jnp.max(jnp.abs(qc), axis=1) * inv_s / 127.0)
                qq = jnp.clip(jnp.round(qc * inv_s / uq[:, None]),
                              -127, 127).astype(jnp.int8)
                q2 = s2 * uq * uq * jnp.sum(
                    qq.astype(jnp.float32) ** 2, axis=1)
                e_q = jnp.sqrt(jnp.sum(
                    (qc - (jnp.float32(scale) * uq[:, None])
                     * qq.astype(jnp.float32)) ** 2, axis=1))
                mins, echo = fp.fused_stream_mins(
                    qq.T, e.cwbd, e.row_data, e.vals, e.meta,
                    jnp.int32(n_valid), e_max, M, u=uq[None, :])
                d, r, ok, ok1 = fused_select_esc(
                    mins, q2, tab, echo, jnp.int32(n_valid), top_k,
                    rungs_, pool, err_r=e_q + err_c, scale2=s2,
                    final_exact=True)
                return (acc + jnp.sum(d),
                        nok1 + jnp.sum(ok1.astype(jnp.int32)))
            return jax.lax.fori_loop(0, iters, body,
                                     (jnp.float32(0), jnp.int32(0)))
        return f

    # variant A: exact-all — one-hot f32 matmul over ALL distinct rows
    # + top_k (no shortlist, no certificate, no gathers)
    from deltapq_tpu.ops.stream_tiles import decode_stream_tiles
    cdec = decode_stream_tiles(e.tiles)
    n_pad = e.row_data.shape[0] * 1024
    cp = np.zeros((n_pad, M), np.uint8)
    cp[:n_valid] = cdec
    cpj = jnp.asarray(cp)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def f_exact_all(qb, salt, iters):
        def body(i, acc):
            q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
            tab = adc_table(cwj, q[:, :D])           # [B, M, K]
            tf = tab.reshape(B, M * K)
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (n_pad, K), 1)
            oh = jnp.concatenate(
                [(cpj[:, m:m + 1].astype(jnp.int32) == iota
                  ).astype(jnp.float32) for m in range(M)],
                axis=1)                              # [n_pad, M*K]
            dall = jax.lax.dot_general(
                oh, tf.T, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)  # [n_pad, B]
            dall = jnp.where(
                jnp.arange(n_pad)[:, None] < n_valid, dall, jnp.inf)
            negd, ids = jax.lax.top_k(-dall.T, top_k)
            return acc + jnp.sum(-negd)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    for it in (2, 12):
        float(f_exact_all(qj, jnp.float32(0), it))
    res = {}
    for it in (2, 12):
        ts = []
        for k in range(3):
            t = time.perf_counter()
            float(f_exact_all(qj, jnp.float32(k + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    print(f"exact-all matmul {((res[12]-res[2])/10)*1000:8.3f} ms/batch")

    for rungs_ in [(8, 128), (16, 64), (32,), (32, 128), (64,),
                   (64, 256)]:
        rungs_ = tuple(r for r in rungs_ if r < n_units)
        f = full_fn(rungs_)
        for it in (2, 12):
            r = f(qj, jnp.float32(0), it)
            float(r[0])
        res, nok1 = {}, 0
        for it in (2, 12):
            ts = []
            for k in range(3):
                t = time.perf_counter()
                r = f(qj, jnp.float32(k + 1), it)
                nok1 = int(np.asarray(r[1])) / (B * it)
                ts.append(time.perf_counter() - t)
            res[it] = min(ts)
        per = (res[12] - res[2]) / 10
        print(f"rungs={rungs_!s:12s} {per*1000:8.3f} ms/batch "
              f"first-shot={nok1:.3f}")


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
