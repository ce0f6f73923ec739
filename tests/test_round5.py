"""Round-5 features: per-index certificate calibration (VERDICT r4
#3), warmup routing at scale (#7), and index-space edge audits (#6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltapq_tpu.ops import query_plain
from deltapq_tpu.ops.adc import adc_table
from deltapq_tpu.ops.encode import pq_encode
from deltapq_tpu.ops.fused import (FusedCompressedEngine,
                                   _select_with_escalation)
from deltapq_tpu.ops.kmeans import pq_learn
from deltapq_tpu.ops import fused_pallas as fp


@pytest.fixture(scope="module")
def clustered(small_dataset):
    M, K = 4, 32
    cw = pq_learn(jax.random.key(0), small_dataset, M, K, max_iters=25)
    codes = pq_encode(cw, small_dataset)
    return np.asarray(cw), np.asarray(codes)


def _sabotaged_args(seed=10, n=2048, B=8, M=4, K=16, Ds=8):
    """mins from true distances (sound selection) + an enormous error
    radius (certificate always fails): drives the adaptive path."""
    rng = np.random.default_rng(seed)
    cw = rng.normal(size=(M, K, Ds)).astype(np.float32)
    codes = rng.integers(0, K, size=(n, M)).astype(np.uint8)
    q = rng.normal(size=(B, M * Ds)).astype(np.float32)
    tab = adc_table(jnp.asarray(cw), jnp.asarray(q))
    tabn = np.asarray(tab)
    d_all = np.zeros((B, n), np.float32)
    for m in range(M):
        d_all += tabn[:, m, :][:, codes[:, m].astype(np.int64)]
    q2 = np.sum(q * q, axis=1).astype(np.float32)
    mins_bn = (d_all - q2[:, None]).reshape(
        B, n // fp.SUB, fp.SUB).min(axis=2)
    mins_nb = jnp.asarray(mins_bn.T.astype(np.float32))
    huge = jnp.full((B,), 1e9, jnp.float32)
    return mins_nb, jnp.asarray(q2), tab, jnp.asarray(codes), huge


class _FakeEngine:
    ns_hint = None


def test_adaptive_ns_grows_on_certificate_collapse():
    """A failing first-shot certificate must double the engine's
    ns_hint (power-of-2 growth toward the ladder cap), so steady
    state stops paying the escalation rung every batch."""
    mins_nb, q2, tab, codes, huge = _sabotaged_args()
    eng = _FakeEngine()
    d, rows, frac = _select_with_escalation(
        mins_nb, q2, tab, codes, jnp.int32(codes.shape[0]), 5,
        err_r=huge, engine=eng)
    assert frac == 0.0
    assert eng.ns_hint is not None and eng.ns_hint >= 4
    first_hint = eng.ns_hint
    # second batch grows further from the hinted rung
    _select_with_escalation(
        mins_nb, q2, tab, codes, jnp.int32(codes.shape[0]), 5,
        err_r=huge, engine=eng)
    assert eng.ns_hint >= first_hint


def test_explicit_n_sub_disables_adaptation():
    mins_nb, q2, tab, codes, huge = _sabotaged_args()
    eng = _FakeEngine()
    _select_with_escalation(
        mins_nb, q2, tab, codes, jnp.int32(codes.shape[0]), 5,
        n_sub=2, err_r=huge, engine=eng)
    assert eng.ns_hint is None


def test_calibrate_reaches_target_and_stays_exact(clustered,
                                                 small_dataset):
    cw, codes = clustered
    eng = FusedCompressedEngine(cw, codes)
    frac = eng.calibrate(top_k=5, b=16)
    assert 0.0 <= frac <= 1.0
    q = small_dataset[:16] + 0.05
    d, i = eng.query(q, top_k=5)
    d_ref, i_ref = query_plain(cw, q, codes, top_k=5, engine="xla")
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-4)


def test_chunked_engine_warmup_seeds_all_chunks(clustered):
    from deltapq_tpu.bigscale import ChunkedCompressedEngine

    cw, codes = clustered
    eng = ChunkedCompressedEngine(cw, codes, chunk_rows=1024,
                                  precision="bf16", resident=True)
    assert len(eng.chunks) >= 2
    eng.chunks[0].ns_hint = None
    eng.warmup(batch_sizes=(8,), top_k=5)
    hint = getattr(eng.chunks[0], "ns_hint", None)
    if hint:  # calibration raised the rung: every chunk must follow
        assert all(getattr(e, "ns_hint", None) == hint
                   for e in eng.chunks[1:])
    # queries remain exact after warmup/calibration
    rng = np.random.default_rng(3)
    q = rng.normal(size=(8, cw.shape[0] * cw.shape[2])
                   ).astype(np.float32)
    d, i = eng.query(q, top_k=5)
    d_ref, i_ref = query_plain(cw, q, codes, top_k=5, engine="xla")
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-4)
