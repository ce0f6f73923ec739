"""One-shot chip sweep for the compressed-tier pipeline knobs:

- select pool factor (1/2/4/8): divides the [B, NS] exact top_k cost
- batch size B (512/1024): amortizes the per-row decode+matmul cost
- stage split: delta mins kernel alone vs select_rerank alone

Run on the real chip; prints a table.  Timing via salted
difference-quotient loops (see bench.py for methodology notes).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(fn, iters=(2, 12), repeats=3):
    for it in iters:
        float(fn(np.float32(0), it))
    res = {}
    for it in iters:
        ts = []
        for k in range(repeats):
            t = time.perf_counter()
            float(fn(np.float32(k + 7 * it + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_clustered_codes
    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.adc import adc_table
    from deltapq_tpu.ops.fused import FusedCompressedEngine, _default_n_sub

    M, K, Ds = 8, 256, 16
    N, top_k = 1_048_576, 10
    D = M * Ds
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)
    eng = FusedCompressedEngine(cw, codes, precision="int8")
    cwj = jnp.asarray(cw)
    mu = np.asarray(eng.mu)
    s2 = jnp.float32(eng.scale * eng.scale)
    # NS as the kernel produces it: padded rows / SUB (not ceil(N/SUB))
    ns_total = eng.row_data.shape[0] * fp.TILE // fp.SUB

    def quantize_queries(q_np):
        """Same layout path the engine takes: center -> grouped pack ->
        int8 quantize (bit-correct for any M, not just the M=8
        one-group degenerate case)."""
        qc = q_np - mu[None, :]
        qk = fp.pack_query_grouped(qc[:, :D], M, Ds)
        qop, invalid, uq, _eq = __import__(
            "deltapq_tpu.ops.fused", fromlist=["_mins_query_args"]
        )._mins_query_args(qk, "int8", eng.scale)
        assert invalid is None
        return jnp.asarray(qc), qop, uq

    def full(B, pool, ns):
        q_np = rng.normal(size=(B, D)).astype(np.float32)
        qb = jnp.asarray(q_np)
        inv_s = jnp.float32(1.0 / eng.scale)
        muj = jnp.asarray(mu)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def bench(qb, cwbd, rd, ovf, salt, iters):
            def body(i, acc):
                q = qb * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)
                tab = adc_table(cwj, q[:, :D])
                qc = q - muj[None, :]
                q2 = jnp.sum(qc * qc, axis=1)
                # in-graph quantize; layout == pack_query_grouped only
                # because M=8 is one group (asserted below)
                qq = jnp.clip(jnp.round(qc * inv_s), -127, 127
                              ).astype(jnp.int8)
                mins, echo = fp.fused_delta_mins(
                    qq.T, cwbd, rd, ovf, jnp.int32(N), eng.tiles.S)
                mins = mins * s2
                d, r, ok = fp.select_rerank(mins.T, q2, tab, echo,
                                            jnp.int32(N), top_k, ns,
                                            pool)
                return acc + jnp.sum(d) + jnp.sum(r).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        # the in-graph quantize above skips pack_query_grouped; that is
        # bit-correct only when M fits one group (Dg_pad == D)
        assert fp.group_geometry(M, Ds) == (1, M, D), \
            "in-graph quantize shortcut requires the one-group layout"
        # prove the config never escalates on this workload (numbers
        # below are escalation-free by construction)
        qc_chk, qop_chk, u_chk = quantize_queries(q_np)
        q2_chk = jnp.sum(qc_chk * qc_chk, axis=1)
        tab_chk = adc_table(cwj, qb)
        mins_c, echo_c = fp.fused_delta_mins(
            qop_chk, eng.cwbd, eng.row_data, eng.ovf, jnp.int32(N),
            eng.tiles.S, u=u_chk)
        _, _, ok_c = fp.select_rerank((mins_c * s2).T, q2_chk, tab_chk,
                                      echo_c, jnp.int32(N), top_k, ns,
                                      pool)
        if not bool(jnp.all(ok_c)):
            print(f"  [warn] B={B} pool={pool} ns={ns}: certificate "
                  f"fails for {int(jnp.sum(~ok_c))} queries; timed "
                  f"numbers exclude the escalation the engine would pay",
                  flush=True)

        t = measure(lambda s, it: bench(qb, eng.cwbd, eng.row_data,
                                        eng.ovf, jnp.float32(s), it))
        return t

    # stage isolation at B=512
    B = 512
    q_np0 = rng.normal(size=(B, D)).astype(np.float32)
    qb = jnp.asarray(q_np0)
    qc0j, qq0, u0 = quantize_queries(q_np0)
    tab0 = adc_table(cwj, qb)
    q20 = jnp.sum(qc0j * qc0j, axis=1)
    mins0, echo0 = fp.fused_delta_mins(qq0, eng.cwbd, eng.row_data,
                                       eng.ovf, jnp.int32(N),
                                       eng.tiles.S, u=u0)
    mins0 = (mins0 * s2).T

    @functools.partial(jax.jit, static_argnames=("iters",))
    def t_mins(qq, cwbd, rd, ovf, salt, iters):
        def body(i, acc):
            q = (qq.astype(jnp.float32)
                 * (1.0 + (salt + i.astype(jnp.float32)) * 0.004))
            q = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
            mins, echo = fp.fused_delta_mins(q, cwbd, rd, ovf,
                                             jnp.int32(N), eng.tiles.S)
            return acc + jnp.sum(mins[:4])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    print(f"delta_mins(B=512): "
          f"{measure(lambda s, it: t_mins(qq0, eng.cwbd, eng.row_data, eng.ovf, jnp.float32(s), it))*1000:.3f} ms",
          flush=True)

    for pool in (1, 2, 4, 8):
        ns = _default_n_sub(top_k, -(-ns_total // pool), fp.SUB * pool)

        @functools.partial(jax.jit, static_argnames=("iters", "p", "n"))
        def t_sel(mins, q2, tab, echo, salt, iters, p=pool, n=ns):
            def body(i, acc):
                m2 = mins * (1.0 + (salt + i.astype(jnp.float32))
                             * 1e-4)
                d, r, ok = fp.select_rerank(m2, q2, tab, echo,
                                            jnp.int32(N), top_k, n, p)
                return acc + jnp.sum(d)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        t = measure(lambda s, it: t_sel(mins0, q20, tab0, echo0,
                                        jnp.float32(s), it))
        print(f"select_rerank(B=512, pool={pool}, ns={ns}): "
              f"{t*1000:.3f} ms", flush=True)

    for B_, pool in ((512, 1), (512, 4), (1024, 4), (1024, 1)):
        ns = _default_n_sub(top_k, -(-ns_total // pool), fp.SUB * pool)
        try:
            t = full(B_, pool, ns)
            print(f"full(B={B_}, pool={pool}, ns={ns}): "
                  f"{t*1000:.3f} ms/batch = {B_/t:.0f} QPS", flush=True)
        except Exception as e:  # VMEM busts etc.
            print(f"full(B={B_}, pool={pool}): FAILED {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
