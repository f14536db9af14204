"""Associative-scan (sequence-parallel) CTC: numerical equivalence with the
sequential scan, including gradients, and execution with the time axis
sharded over the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtn_applications_tpu.criterions.common import pad_targets
from gtn_applications_tpu.ops import lattice


def _setup(B=3, T=24, C=7, seed=0):
    rng = np.random.RandomState(seed)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, C).astype(np.float32)), 2)
    tgts, lens = pad_targets([[0, 1, 2], [3, 3], [1, 2, 3, 4, 5]])
    il = jnp.asarray([T, T - 5, T], jnp.int32)
    return lp, tgts, lens, il


def test_assoc_matches_scan():
    lp, tgts, lens, il = _setup()
    s_seq = lattice.ctc_forward_score(lp, tgts, lens, 6, il, impl="scan")
    s_assoc = lattice.ctc_forward_score_assoc(lp, tgts, lens, 6, il)
    np.testing.assert_allclose(
        np.asarray(s_seq), np.asarray(s_assoc), rtol=1e-4, atol=1e-4
    )


def test_assoc_grads_match():
    lp, tgts, lens, il = _setup()

    def f_seq(lp):
        return -lattice.ctc_forward_score(lp, tgts, lens, 6, il, impl="scan").sum()

    def f_assoc(lp):
        return -lattice.ctc_forward_score_assoc(lp, tgts, lens, 6, il).sum()

    g1 = jax.grad(f_seq)(lp)
    g2 = jax.grad(f_assoc)(lp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_assoc_sequence_sharded():
    """The operator prefix combine runs with T sharded across 8 devices."""
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the virtual 8-device mesh")
    lp, tgts, lens, il = _setup(T=32)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))

    # shard the time axis of the log-probs; the per-step operators inherit
    # the sharding and associative_scan combines across chips
    lp_sharded = jax.device_put(
        lp, NamedSharding(mesh, P(None, "seq", None))
    )

    @jax.jit
    def f(lp):
        return lattice.ctc_forward_score_assoc(lp, tgts, lens, 6, il)

    with mesh:
        out = f(lp_sharded)
    ref = lattice.ctc_forward_score(lp, tgts, lens, 6, il, impl="scan")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_impl_knob_through_criterion():
    """config impl='assoc' reaches the associative-scan lattice and agrees
    with the default scan through the CTC criterion API."""
    from gtn_applications_tpu.criterions.ctc import CTC

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 12, 6).astype(np.float32))
    targets = [[0, 1, 2], [3, 1]]
    base = CTC(blank=5)
    assoc = CTC(blank=5, impl="assoc")
    prepared = base.prepare(targets)
    l0 = float(base.loss({}, x, prepared))
    l1 = float(assoc.loss({}, x, prepared))
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
