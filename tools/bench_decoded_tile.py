"""Roofline experiment: decoded-mins kernel at different tile sizes."""
import functools, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from deltapq_tpu.ops import fused_pallas as fp

N, B, D = 1_048_576, int(os.environ.get('BB', 128)), 128
rng = np.random.default_rng(0)
xh = rng.normal(size=(N, D)).astype(jnp.bfloat16)
q = jnp.asarray(rng.normal(size=(D, B)).astype(np.float32).astype(jnp.bfloat16))

def measure(fn, iters=(2, 22), repeats=3):
    for it in iters: float(fn(np.float32(0), it))
    res = {}
    for it in iters:
        ts = []
        for k in range(repeats):
            t = time.perf_counter(); float(fn(np.float32(k+7*it+1), it)); ts.append(time.perf_counter()-t)
        res[it] = min(ts)
    return (res[iters[1]] - res[iters[0]]) / (iters[1] - iters[0])

for tile in (1024, 4096, 8192):
    xt = jnp.asarray(fp.pack_xhat_tiles(np.asarray(xh), tile=tile))
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(qf, xt, salt, iters):
        def body(i, acc):
            qq = (qf.astype(jnp.float32) * (1.0 + (salt + i.astype(jnp.float32)) * 0.01)).astype(jnp.bfloat16)
            mins = fp.fused_decoded_mins(qq, xt, jnp.int32(N))
            return acc + jnp.sum(mins[:8])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    t = measure(lambda s, it: loop(q, xt, jnp.float32(s), it))
    bw = (N * D * 2 + N // fp.SUB * B * 4) / t / 1e9
    print(f"tile={tile}: {t*1000:.3f} ms  {bw:.0f} GB/s  "
          f"{bw/819*100:.0f}% of v5e HBM peak")
