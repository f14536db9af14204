"""Numeric-vs-analytic gradient checks for every criterion.

The reference ships these as @unittest.skip pending GTN retain-graph
support (tests/gtn_ctc_test.py:82-105, gtn_asg_test.py:126-152); JAX AD
has no such limitation, so they run here.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import ASG, CTC, STC
from gtn_applications_tpu.criterions.transducer import Transducer


def _numeric_grad(f, x, eps=1e-3, samples=12, rng=None):
    """Central differences on a random subset of coordinates."""
    rng = rng or np.random.RandomState(0)
    x = np.asarray(x, dtype=np.float64)
    flat = x.reshape(-1)
    idxs = rng.choice(flat.size, size=min(samples, flat.size), replace=False)
    out = {}
    for i in idxs:
        up = flat.copy()
        up[i] += eps
        down = flat.copy()
        down[i] -= eps
        out[i] = (
            float(f(jnp.asarray(up.reshape(x.shape), jnp.float32)))
            - float(f(jnp.asarray(down.reshape(x.shape), jnp.float32)))
        ) / (2 * eps)
    return out


def _check(f, x, rtol=2e-2, atol=2e-3):
    analytic = np.asarray(jax.grad(f)(jnp.asarray(x, jnp.float32))).reshape(-1)
    numeric = _numeric_grad(f, x)
    for i, g in numeric.items():
        assert abs(analytic[i] - g) <= atol + rtol * abs(g), (
            i, analytic[i], g
        )


def test_ctc_gradcheck():
    rng = np.random.RandomState(0)
    B, T, N = 2, 10, 6
    x = rng.randn(B, T, N).astype(np.float32)
    crit = CTC(blank=N - 1)
    prep = crit.prepare([[0, 1, 2], [3, 3]])
    _check(lambda x: crit.loss({}, x, prep), x)


def test_asg_gradcheck_inputs_and_transitions():
    rng = np.random.RandomState(1)
    B, T, N = 2, 8, 5
    crit = ASG(num_classes=N, num_replabels=0, use_garbage=False)
    x = rng.randn(B, T, crit.N).astype(np.float32)
    tr = (rng.randn(crit.N + 1, crit.N) * 0.2).astype(np.float32)
    prep = crit.prepare([[0, 1, 2], [3, 3]])
    _check(lambda x: crit.loss({"transitions": jnp.asarray(tr)}, x, prep), x)
    _check(
        lambda t: crit.loss({"transitions": t}, jnp.asarray(x), prep), tr
    )


def test_stc_gradcheck():
    rng = np.random.RandomState(2)
    B, T, N = 2, 8, 5
    x = rng.randn(B, T, N).astype(np.float32)
    crit = STC(0, 1, 1, 1, "none")
    prep = crit.prepare([[1, 2], [3]])
    _check(lambda x: crit.loss({}, x, prep), x)


@pytest.mark.slow  # numeric jacobian
def test_transducer_ngram_gradcheck():
    rng = np.random.RandomState(3)
    N = 4
    tokens = [(i,) for i in range(N)]
    crit = Transducer(
        tokens, {i: i for i in range(N)}, ngram=1, reduction="none"
    )
    B, T = 1, 6
    x = rng.randn(B, T, N).astype(np.float32)
    prep = crit.prepare([[0, 1, 2]])
    p0 = (rng.randn(crit.num_transition_arcs) * 0.2).astype(np.float32)
    _check(lambda x: crit.loss({"transitions": jnp.asarray(p0)}, x, prep), x)
    _check(
        lambda p: crit.loss({"transitions": p}, jnp.asarray(x), prep), p0
    )
