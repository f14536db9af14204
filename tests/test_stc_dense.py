"""Differential tests: STC dense-adjacency scoring tier
(GTN_STC_DENSE, routed through ops/factored.alignment_lattice_score and
its analytic custom VJP) vs the sparse arc-table oracle.

Both paths score the same compiled STC graphs; losses and input
gradients must agree to fp32 tolerance, including the traced insertion
penalty's effect across the annealing schedule (the dense form folds it
as adj0 + e^p * adj_star).  Behavioral spec: reference stc.py:84-93.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gtn_applications_tpu.criterions import stc as stc_mod
from gtn_applications_tpu.criterions.stc import STC


def _loss_both(crit, inputs, targets, lens=None):
    prep = crit.prepare(targets)
    assert "dense" in prep, "dense tier must engage at these shapes"
    out = []
    saved = stc_mod._DENSE_IMPL
    for impl in ("auto", "off"):
        stc_mod._DENSE_IMPL = impl
        try:
            val, grad = jax.value_and_grad(
                lambda x: jnp.sum(crit.loss({}, x, prep, lens))
            )(inputs)
        finally:
            stc_mod._DENSE_IMPL = saved
        out.append((np.asarray(val), np.asarray(grad)))
    return out


@pytest.mark.parametrize("seed,B,T,C,reduction", [
    (0, 3, 9, 7, "none"), (1, 4, 12, 10, "mean"), (2, 2, 6, 5, "none"),
])
def test_dense_matches_sparse(seed, B, T, C, reduction):
    rng = np.random.default_rng(seed)
    crit = STC(p0=0.4, plast=0.1, thalf=4.0, reduction=reduction,
               shift_targets=1)
    crit.nstep = seed * 3  # exercise the annealing schedule
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [
        rng.integers(0, C - 1, size=rng.integers(1, 4)).tolist()
        for _ in range(B)
    ]
    lens = jnp.asarray(rng.integers(2, T + 1, size=B), jnp.int32)
    (v_d, g_d), (v_s, g_s) = _loss_both(crit, inputs, targets, lens)
    np.testing.assert_allclose(v_d, v_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g_d, g_s, rtol=1e-4, atol=1e-5)


def test_dense_penalty_gradient_path():
    """The insertion penalty reaches the dense score through
    e^p * adj_star: losses must move with the schedule identically on
    both paths."""
    rng = np.random.default_rng(5)
    B, T, C = 2, 8, 6
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[1, 2], [3]]
    vals = {}
    for impl in ("auto", "off"):
        saved = stc_mod._DENSE_IMPL
        stc_mod._DENSE_IMPL = impl
        try:
            crit = STC(p0=1.0, plast=0.05, thalf=2.0, shift_targets=1)
            series = []
            for _ in range(4):
                prep = crit.prepare(targets)
                series.append(
                    float(jnp.sum(crit.loss({}, inputs, prep)))
                )
        finally:
            stc_mod._DENSE_IMPL = saved
        vals[impl] = series
    np.testing.assert_allclose(vals["auto"], vals["off"],
                               rtol=1e-5, atol=1e-5)
    assert len(set(np.round(vals["auto"], 6))) > 1  # schedule moves it


def test_dense_gate_off_keeps_sparse():
    saved = stc_mod._DENSE_IMPL
    stc_mod._DENSE_IMPL = "off"
    try:
        crit = STC(shift_targets=1)
        prep = crit.prepare([[0, 1]])
        assert "dense" not in prep
    finally:
        stc_mod._DENSE_IMPL = saved
