"""Stage-isolation timing for the delta-decode kernel: toggle decode
stages off (wrong results, timing only) to find the latency hogs."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_fused import make_clustered_codes
from deltapq_tpu.ops import fused_pallas as fp
from deltapq_tpu.ops.fused import FusedCompressedEngine

TILE, SUB = fp.TILE, fp.SUB


def make_kernel(stages):
    def kern(q_ref, cwbd_ref, n_valid_ref, rd_ref, ovf_ref,
             out_ref, codes_out_ref, oh_ref, *, S):
        M = ovf_ref.shape[1]
        Cap = ovf_ref.shape[2]
        rd = rd_ref[0].astype(jnp.int32)
        mask = rd[0:1, :]
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        bitm = ((mask >> iota_m) & 1)
        H = jnp.full((M, TILE), -1, jnp.int32)
        if "rank" in stages:
            tri = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
                   < jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
                   ).astype(jnp.bfloat16)
            rank = jnp.dot(tri, bitm.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            nd = jnp.sum(bitm, axis=0, keepdims=True)
            is_ovf = nd > S
        else:
            rank = bitm
            is_ovf = mask > 254
        if "slots" in stages:
            fixed = (bitm == 1) & jnp.logical_not(is_ovf)
            for j in range(S):
                vj = rd[1 + j:2 + j, :]
                H = jnp.where(fixed & (rank == j), vj, H)
        if "ovf" in stages:
            acc = is_ovf.astype(jnp.int32)
            s = 1
            while s < TILE:
                acc = acc + fp._shift_right(acc, s, 0)
                s *= 2
            ovf_rank = acc - is_ovf.astype(jnp.int32)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (Cap, 1), 0)
            ohov = ((ovf_rank == iota_c) & is_ovf).astype(jnp.bfloat16)
            ovf_bf = ovf_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
            hov = jnp.dot(ovf_bf, ohov,
                          preferred_element_type=jnp.float32)
            H = jnp.where(is_ovf, hov.astype(jnp.int32), H)
        if "fill" in stages:
            s = 1
            while s < TILE:
                H = jnp.where(H >= 0, H, fp._shift_right(H, s, -1))
                s *= 2
        H = jnp.clip(H, 0, 255)
        if "transpose" in stages:
            Ht = H.T
        else:
            Ht = jnp.broadcast_to(mask.T, (TILE, M)) & 0xFF
        fp._scan_tail(Ht, q_ref, cwbd_ref, n_valid_ref, out_ref,
                      codes_out_ref, oh_ref)
    return kern


def run_variant(name, stages, q, cwbd, rd, ovf, N, S):
    nt = rd.shape[0]
    M, Cap = ovf.shape[1], ovf.shape[2]

    @functools.partial(jax.jit, static_argnames=())
    def call(q, cwbd, rd, ovf):
        return fp._mins_call(
            functools.partial(make_kernel(stages), S=S),
            [pl.BlockSpec((1, 1 + S, TILE), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, M, Cap), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)],
            [rd, ovf], q, cwbd, jnp.int32(N), nt, M)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(qf, cwbd, rd, ovf, salt, iters):
        def body(i, acc):
            qq = (qf + (salt + i.astype(jnp.float32)) * 1e-4
                  ).astype(jnp.bfloat16)
            mins, echo = call(qq, cwbd, rd, ovf)
            return acc + jnp.sum(mins[:8]) + jnp.sum(echo[:1].astype(
                jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    qf = q.astype(jnp.float32)
    iters = (2, 12)
    for it in iters:
        float(loop(qf, cwbd, rd, ovf, jnp.float32(0), it))
    res = {}
    for it in iters:
        ts = []
        for k in range(3):
            t = time.perf_counter()
            float(loop(qf, cwbd, rd, ovf,
                       jnp.float32(k + 7 * it + 1), it))
            ts.append(time.perf_counter() - t)
        res[it] = min(ts)
    ms = (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0]) * 1000
    print(f"{name}: {ms:.3f} ms")


def main():
    N = 1_048_576
    B = 128
    M, K, Ds = 8, 256, 16
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)
    eng = FusedCompressedEngine(cw, codes)
    S = eng.tiles.S
    q = jnp.asarray(rng.normal(size=(M * Ds, B)).astype(np.float32))
    variants = [
        ("tail_only", set()),
        ("rank", {"rank"}),
        ("rank+slots", {"rank", "slots"}),
        ("rank+slots+ovf", {"rank", "slots", "ovf"}),
        ("+fill", {"rank", "slots", "ovf", "fill"}),
        ("+transpose(all)", {"rank", "slots", "ovf", "fill",
                             "transpose"}),
    ]
    for name, st in variants:
        run_variant(name, st, q, eng.cwbd, eng.row_data, eng.ovf,
                    N, S)


if __name__ == "__main__":
    main()
