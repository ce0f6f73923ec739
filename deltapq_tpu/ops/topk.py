"""Top-k selection helpers.

On TPU an exact ``lax.top_k`` over a long row costs ~7x a memory-bound
pass; ``lax.approx_min_k`` (the PartialReduce TPU op) runs at HBM speed.
``smallest_k`` picks between them: "approx" over-provisions candidates
16x with recall_target 0.99 and then reduces exactly — the true top-k
is missed only when >16k near-ties collide in one reduction bin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smallest_k(dists: jnp.ndarray, top_k: int, select: str = "auto"):
    """(values [B, k] ascending, indices [B, k]) of the smallest entries
    per row.  select: "exact" | "approx" | "auto" (approx on TPU rows
    longer than 16k, exact otherwise)."""
    B, n = dists.shape
    if top_k > n:
        # more requested than rows exist: exact-select everything and
        # pad with (+inf, -1)
        neg, idx = jax.lax.top_k(-dists, n)
        pad_d = jnp.full((B, top_k - n), jnp.inf, dists.dtype)
        pad_i = jnp.full((B, top_k - n), -1, idx.dtype)
        return (jnp.concatenate([-neg, pad_d], axis=1),
                jnp.concatenate([idx, pad_i], axis=1))
    if select == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        select = "approx" if (on_tpu and n > 16384) else "exact"
    # the approx path's shortlist must hold at least top_k candidates;
    # beyond the 2048 bin budget fall back to exact selection
    if select == "approx" and top_k <= 2048:
        shortlist = min(max(16 * top_k, 64, top_k), 2048, n)
        vals, idx = jax.lax.approx_min_k(dists, shortlist,
                                         recall_target=0.99)
        neg, pos = jax.lax.top_k(-vals, top_k)
        return -neg, jnp.take_along_axis(idx, pos, axis=1)
    neg, idx = jax.lax.top_k(-dists, top_k)
    return -neg, idx
