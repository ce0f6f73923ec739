"""Optimization prototypes for the stream-tile kernel, measured
on-chip at N=1M, B=512, int8:

- u_matmul     : offset prefix sum as an int8 [1,TILE]x[TILE,TILE]
                 MXU matmul (replaces the 10-step Hillis roll chain)
- u_i8ohc      : + int8 one-hot compares in the value gather
- u_i8_dynfill : + forward fill with per-tile dynamic step count
                 (meta row 2 = ceil(log2(max hole distance + 1)))
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ABLATIONS = tuple(
    os.environ.get("ABLATIONS", "full,u_matmul,u_i8ohc,u_i8_dynfill"
                   ).split(","))


def make_kernel(M, W_A, nt, ablate):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from deltapq_tpu.ops import fused_pallas as fp

    TILE = fp.TILE
    u_mm = ablate != "full"
    i8ohc = ablate in ("u_i8ohc", "u_i8_dynfill")
    dynfill = ablate == "u_i8_dynfill"

    def kernel(meta_ref, q_ref, cwbd_ref, n_valid_ref, rd_ref, u_ref,
               vals_ref, out_ref, codes_out_ref, oh_ref, win_ref,
               sem_ref):
        P = (M + 7) // 8
        G = (7 + M + 7) // 8
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(meta_ref[0, 0], W_A)],
                win_ref.at[0], sem_ref.at[0]).start()

        @pl.when(i + 1 < nt)
        def _():
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(meta_ref[0, i + 1], W_A)],
                win_ref.at[nxt], sem_ref.at[nxt]).start()

        pltpu.make_async_copy(
            vals_ref.at[pl.ds(meta_ref[0, i], W_A)],
            win_ref.at[slot], sem_ref.at[slot]).wait()

        rd = rd_ref[0].astype(jnp.int32)
        planes = []
        for p in range(P):
            mp = min(8, M - 8 * p)
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
            planes.append((rd[p:p + 1, :] >> iota_p) & 1)
        bitm = (jnp.concatenate(planes, axis=0) if P > 1
                else planes[0])
        tri = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
               < jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
               ).astype(jnp.bfloat16)
        rank = jnp.dot(tri, bitm.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32
                       ).astype(jnp.int32)
        nd = jnp.sum(bitm, axis=0, keepdims=True)

        if u_mm:
            off = jnp.dot(nd.astype(jnp.int8), u_ref[:],
                          preferred_element_type=jnp.int32)
        else:
            acc = nd
            s = 1
            while s < TILE:
                acc = acc + fp._shift_right(acc, s, 0)
                s *= 2
            off = acc - nd
        p0 = off + meta_ref[1, i]
        e0 = p0 // 8
        a0 = p0 % 8

        win = win_ref[slot].astype(jnp.int32).astype(jnp.bfloat16)
        ys = []
        for g in range(G):
            e_g = e0 + g
            w_g = e_g // 128
            c_g = e_g % 128
            if i8ohc:
                iota_c8 = jax.lax.broadcasted_iota(
                    jnp.int32, (128, TILE), 0).astype(jnp.int8)
                ohc = (iota_c8 == c_g.astype(jnp.int8)
                       ).astype(jnp.bfloat16)
            else:
                iota_c = jax.lax.broadcasted_iota(jnp.int32,
                                                  (128, TILE), 0)
                ohc = (iota_c == c_g).astype(jnp.bfloat16)
            yg = jnp.zeros((8, TILE), jnp.float32)
            for w in range(W_A):
                tw = jnp.dot(win[w], ohc,
                             preferred_element_type=jnp.float32)
                yg = yg + tw * (w_g == w).astype(jnp.float32)
            ys.append(yg)
        yc = jnp.concatenate(ys, axis=0)
        gt = G * 8
        v = jnp.zeros((M, TILE), jnp.float32)
        for s_ in range(8):
            r = (pltpu.roll(yc, (gt - s_) % gt, axis=0)
                 if s_ else yc)
            v = v + r[:M] * (a0 == s_).astype(jnp.float32)

        h = jnp.zeros((M, TILE), jnp.float32)
        for u in range(M):
            h = h + v[u:u + 1] * (rank == u).astype(jnp.float32)
        hi = jnp.where(bitm == 1, h.astype(jnp.int32), -1)

        if dynfill:
            cols = jax.lax.broadcasted_iota(jnp.int32, (M, TILE), 1)

            def body(j, hh):
                sh = jnp.int32(1) << j
                rolled = pltpu.roll(hh, sh, axis=1)
                shifted = jnp.where(cols >= sh, rolled, -1)
                return jnp.where(hh >= 0, hh, shifted)
            hi = jax.lax.fori_loop(0, meta_ref[2, i], body, hi)
        else:
            s = 1
            while s < TILE:
                hi = jnp.where(hi >= 0, hi, fp._shift_right(hi, s, -1))
                s *= 2

        fp._scan_tail(hi.T, q_ref, cwbd_ref, n_valid_ref, out_ref,
                      codes_out_ref, oh_ref)

    return kernel


def build_call(M, e_max, nt, cwbd, ablate):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from deltapq_tpu.ops import fused_pallas as fp
    from deltapq_tpu.ops.stream_tiles import window_groups

    TILE, SUB = fp.TILE, fp.SUB
    W_A = window_groups(M, e_max)
    ns = TILE // SUB
    P = (M + 7) // 8
    MKs = cwbd.shape[0]
    G_, Mg = fp._groups_of(M)
    MgK = MKs // G_

    def call(q, cwbd, row_data, u, vals, meta, n_valid):
        D, B = q.shape
        return pl.pallas_call(
            make_kernel(M, W_A, nt, ablate),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((3, nt), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((D, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MKs, cwbd.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, P, TILE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, TILE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((ns, B), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, M), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt * ns, B), jnp.float32),
                jax.ShapeDtypeStruct((nt * TILE, M), jnp.uint8),
            ],
            scratch_shapes=[
                pltpu.VMEM((TILE, MgK),
                           jnp.int8 if cwbd.dtype == jnp.int8
                           else jnp.bfloat16),
                pltpu.VMEM((2, W_A, 8, 128), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(meta, q, cwbd,
          jnp.asarray(n_valid, jnp.int32).reshape(1, 1),
          row_data, u, vals)
    return call


def fill_steps(row_data, M):
    """Per-tile ceil(log2(max hole distance + 1)) from the mask
    planes."""
    nt, P, T = row_data.shape
    planes = row_data.astype(np.uint32)
    steps = np.zeros(nt, np.int32)
    for t in range(nt):
        bit = np.stack([(planes[t, m // 8] >> (m % 8)) & 1
                        for m in range(M)], 0)       # [M, T]
        maxd = 0
        for m in range(M):
            idx = np.flatnonzero(bit[m])
            gaps = np.diff(np.concatenate([idx, [T]])) - 1
            if len(gaps):
                maxd = max(maxd, int(gaps.max()))
        steps[t] = int(np.ceil(np.log2(maxd + 1))) if maxd else 0
    return steps


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
    from deltapq_tpu.ops.fused import FusedCompressedEngine
    from deltapq_tpu.ops.stream_tiles import decode_stream_tiles

    M, K, Ds = 8, 256, 16
    N, B = 1_048_576, 512
    D = M * Ds
    TILE = fp.TILE
    rng = np.random.default_rng(0)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = make_clustered_codes(N, M, K)
    eng = FusedCompressedEngine(cw, codes, precision="int8",
                                fmt="stream")
    nt = eng.row_data.shape[0]

    meta3 = np.concatenate(
        [np.asarray(eng.meta),
         fill_steps(eng.tiles.row_data, M)[None, :]], 0
    ).astype(np.int32)
    print(f"fill steps: max={meta3[2].max()} mean={meta3[2].mean():.2f}",
          flush=True)
    meta3 = jnp.asarray(meta3)
    u_np = (np.arange(TILE)[:, None] < np.arange(TILE)[None, :]
            ).astype(np.int8)
    u = jnp.asarray(u_np)

    q_np = rng.normal(size=(B, D)).astype(np.float32)
    qc = q_np - eng.mu[None, :]
    qk = fp.pack_query_grouped(qc[:, :D], M, Ds)
    qop = jnp.asarray(np.clip(np.rint(qk / eng.scale), -127, 127
                              ).astype(np.int8).T)

    codes_scan = decode_stream_tiles(eng.tiles)
    for ablate in ABLATIONS:
        call = build_call(M, eng.tiles.e_max, nt, eng.cwbd, ablate)

        # correctness: echo must reproduce the scan-order codes
        mins0, echo0 = call(qop, eng.cwbd, eng.row_data, u, eng.vals,
                            meta3, jnp.int32(N))
        ok = np.array_equal(np.asarray(echo0)[:N], codes_scan)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def t_fn(qop, cwbd, rd, u, vals, meta, salt, iters, call=call):
            def body(i, acc):
                q = (qop.astype(jnp.int32)
                     * (1 + jax.lax.rem(salt.astype(jnp.int32) + i, 2)))
                q = jnp.clip(q, -127, 127).astype(jnp.int8)
                mins, echo = call(q, cwbd, rd, u, vals, meta,
                                  jnp.int32(N))
                return (acc + jnp.sum(mins[:4])
                        + jnp.sum(echo[:2]).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        t = measure(lambda s, it: t_fn(qop, eng.cwbd, eng.row_data, u,
                                       eng.vals, meta3,
                                       jnp.float32(s), it))
        print(f"{ablate:14s}: {t*1000:7.2f} ms/batch  echo_ok={ok}",
              flush=True)


if __name__ == "__main__":
    main()
