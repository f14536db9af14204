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


def test_chunked_matches_scan_values_and_grads():
    """impl='chunked' (checkpointed two-level scan) is numerically the
    sequential scan, including through AD."""
    rng = np.random.RandomState(3)
    B, T, C, L = 2, 67, 7, 5
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    tgts = jnp.asarray(rng.randint(1, C, size=(B, L)))
    lens = jnp.asarray([5, 3])
    il = jnp.asarray([67, 41])

    def loss(impl):
        def f(x):
            lp = jax.nn.log_softmax(x, 2)
            return -lattice.ctc_forward_score(
                lp, tgts, lens, 0, il, impl=impl
            ).sum()
        return f

    np.testing.assert_allclose(
        float(loss("chunked")(x)), float(loss("scan")(x)), rtol=1e-5
    )
    g_ref = jax.grad(loss("scan"))(x)
    g_chk = jax.grad(loss("chunked"))(x)
    np.testing.assert_allclose(
        np.asarray(g_chk), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_long_T_sharded_chunked_assoc():
    """The long-context regime the assoc form exists for: T = 4096 sharded
    across the 8-device mesh on the time axis, chunk-transfer operators
    built shard-locally, prefix combined across devices — must match the
    sequential scan."""
    devs = jax.devices()
    if len(devs) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(devs[:8]), ("seq",))
    rng = np.random.RandomState(9)
    B, T, C, L = 2, 4096, 6, 4
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, T, C).astype(np.float32)), axis=2
    )
    tgts = jnp.asarray(rng.randint(0, 5, size=(B, L)))
    lens = jnp.asarray([4, 2])
    il = jnp.asarray([4096, 3000])

    lp_sharded = jax.device_put(lp, NamedSharding(mesh, P(None, "seq", None)))

    @jax.jit
    def f(lp):
        return lattice.ctc_forward_score_assoc(
            lp, tgts, lens, 5, il, chunk=512
        )

    with mesh:
        out = f(lp_sharded)
    ref = lattice.ctc_forward_score(lp, tgts, lens, 5, il, impl="scan")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3
    )


def test_chunked_assoc_peak_memory_bounded():
    """The chunk-transfer form must materialize O(T/c) dense operators,
    not O(T): XLA's own memory analysis of the compiled backward shows at
    least ~4x less temp memory than the per-frame dense form."""
    rng = np.random.RandomState(4)
    B, T, C, L = 2, 1024, 6, 4
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    tgts = jnp.asarray(rng.randint(0, 5, size=(B, L)))
    lens = jnp.asarray([4, 3])

    def temp_bytes(fn):
        compiled = jax.jit(fn).lower(x).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            import pytest

            pytest.skip("memory_analysis unavailable on this backend")
        return ma.temp_size_in_bytes

    def dense(x):
        lp = jax.nn.log_softmax(x, 2)
        return jax.grad(
            lambda lp: lattice.ctc_forward_score_assoc(
                lp, tgts, lens, 5
            ).sum()
        )(lp)

    def chunked(x):
        lp = jax.nn.log_softmax(x, 2)
        return jax.grad(
            lambda lp: lattice.ctc_forward_score_assoc(
                lp, tgts, lens, 5, chunk=128
            ).sum()
        )(lp)

    bd, bc = temp_bytes(dense), temp_bytes(chunked)
    # chunked residuals must stay several-x below the dense trajectory
    # (3x margin: the dead-masked logsumexp adds one boolean temp per lse)
    assert bc * 3 <= bd, (bc, bd)
