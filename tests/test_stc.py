"""STC criterion tests, mirroring /root/reference/tests/gtn_stc_test.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions.stc import STC


def test_fwd_trivial():
    T, N = 3, 2
    labels = [[1, 1]]
    emissions = jnp.asarray(
        np.array([0.0, 1.0, 1.0, 0.0, 0.0, 1.0], np.float32).reshape(1, T, N)
    )
    log_probs = jnp.log(emissions + 1e-35)
    crit = STC(0, 1, 1, 1)
    fwd = crit(log_probs, labels)
    assert abs(float(fwd)) < 1e-4


def test_fwd_closed_form():
    T, N = 3, 4
    labels = [[1, 2]]
    log_probs = jax.nn.log_softmax(jnp.zeros((1, T, N)), 2)
    crit = STC(0, 1, 1, 1, "none")
    fwd = crit(log_probs, labels)
    # all ways of arranging "* 1 * 2 *" in 3 steps (reference closed form)
    expected = -math.log(0.25 * 0.25 * (0.75 + 0.75 + 1))
    assert abs(float(fwd) - expected) < 1e-4


def test_penalty_anneals():
    crit = STC(0, p0=1.0, plast=0.1, thalf=2.0, reduction="none")
    p1 = crit.prepare([[1]])["log_penalty"]
    for _ in range(10):
        pn = crit.prepare([[1]])["log_penalty"]
    assert float(pn) < float(p1)
    crit.eval()
    n = crit.nstep
    crit.prepare([[1]])
    assert crit.nstep == n  # no annealing in eval mode


def test_grad_finite_and_batched():
    rng = np.random.RandomState(0)
    B, T, N = 3, 10, 6
    x = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    labels = [[1, 2], [3], [5, 5, 4]]
    crit = STC(0, 1, 1, 1, "mean")
    prep = crit.prepare(labels)

    def f(x):
        return crit.loss({}, jax.nn.log_softmax(x, 2), prep)

    loss, grad = jax.value_and_grad(f)(x)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    # batched == mean of singles
    singles = []
    for i in range(B):
        p = crit.prepare([labels[i]])
        singles.append(
            float(crit.loss({}, jax.nn.log_softmax(x[i : i + 1], 2), p))
        )
    assert abs(float(loss) - np.mean(singles)) < 1e-3
