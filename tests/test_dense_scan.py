"""dense_scan_pallas vs the pure-JAX alignment_lattice_score oracle:
values and gradients (emissions AND adjacency), ragged lengths, padded
state axes, and the criterion-level word-decomps shape."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtn_applications_tpu.ops import factored as F


def _random_case(rng, B, T, S, N):
    """A well-formed random lattice family: every state has one in-label,
    adjacency from exp of bounded weights with random sparsity, start /
    accept potentials on random subsets."""
    adj = np.where(rng.rand(B, S, S) < 0.3,
                   np.exp(rng.randn(B, S, S).clip(-3, 3)), 0.0)
    lab = np.zeros((B, S, N), np.float32)
    labels = rng.randint(0, N, size=(B, S))
    has = rng.rand(B, S) < 0.9
    for b in range(B):
        for s in range(S):
            if has[b, s]:
                lab[b, s, labels[b, s]] = 1.0
    start = np.where(rng.rand(B, S) < 0.4, 0.0, F.NEG).astype(np.float32)
    accept = np.where(rng.rand(B, S) < 0.4,
                      rng.randn(B, S) * 0.1, F.NEG).astype(np.float32)
    em = rng.randn(B, T, N).astype(np.float32)
    lens = rng.randint(1, T + 1, size=(B,)).astype(np.int32)
    lens[0] = T
    return (jnp.asarray(em), jnp.asarray(adj.astype(np.float32)),
            jnp.asarray(lab), jnp.asarray(start), jnp.asarray(accept),
            jnp.asarray(lens))


def _with_impl(impl):
    """Temporarily force the dense-scan dispatch mode."""
    class _Ctx:
        def __enter__(self):
            self.saved = F._DENSE_SCAN_IMPL
            F._DENSE_SCAN_IMPL = impl

        def __exit__(self, *a):
            F._DENSE_SCAN_IMPL = self.saved
    return _Ctx()


CASES = [(3, 7, 10, 6), (2, 12, 40, 9), (4, 5, 130, 5),
         (16, 6, 20, 7)]  # 16 = two batch tiles: scratch must re-init


@pytest.mark.parametrize("B,T,S,N", CASES)
def test_values_and_grads_match_oracle(B, T, S, N):
    rng = np.random.RandomState(B * 100 + S)
    em, adj, lab, start, accept, lens = _random_case(rng, B, T, S, N)

    def score(em, adj):
        return jnp.sum(F.alignment_lattice_score(
            em, adj, lab, start, accept, lens))

    with _with_impl("off"):
        v_ref, (ge_ref, ga_ref) = jax.value_and_grad(
            score, argnums=(0, 1))(em, adj)
    with _with_impl("on"):
        v_new, (ge_new, ga_new) = jax.value_and_grad(
            score, argnums=(0, 1))(em, adj)

    np.testing.assert_allclose(float(v_new), float(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ge_new), np.asarray(ge_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_new), np.asarray(ga_ref),
                               rtol=1e-4, atol=1e-5)


def test_zero_length_sample():
    rng = np.random.RandomState(0)
    em, adj, lab, start, accept, lens = _random_case(rng, 3, 6, 12, 5)
    lens = lens.at[1].set(0)
    with _with_impl("off"):
        ref = F.alignment_lattice_score(em, adj, lab, start, accept, lens)
    with _with_impl("on"):
        new = F.alignment_lattice_score(em, adj, lab, start, accept, lens)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,T,S,N", [(3, 8, 12, 6), (2, 10, 50, 9),
                                     (4, 6, 96, 80), (16, 5, 14, 6)])
def test_factored_scan_matches_oracle(B, T, S, N):
    rng = np.random.RandomState(B + S + N)
    em, adj, lab, start, accept, lens = _random_case(rng, B, T, S, N)
    ws = jnp.asarray(rng.randn(N).astype(np.float32) * 0.3)
    W = jnp.asarray(rng.randn(N, N).astype(np.float32) * 0.3)
    we = jnp.asarray(rng.randn(N).astype(np.float32) * 0.3)

    def score(em, adj, ws, W, we):
        return jnp.sum(F.factored_lattice_score(
            em, adj, lab, start, accept, ws, W, we, lens))

    with _with_impl("off"):
        v_ref, g_ref = jax.value_and_grad(
            score, argnums=(0, 1, 2, 3, 4))(em, adj, ws, W, we)
    with _with_impl("on"):
        v_new, g_new = jax.value_and_grad(
            score, argnums=(0, 1, 2, 3, 4))(em, adj, ws, W, we)

    np.testing.assert_allclose(float(v_new), float(v_ref),
                               rtol=1e-5, atol=1e-5)
    for name, a, b in zip("em adj ws W we".split(), g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_factored_scan_ngram2_criterion_matches():
    # the real consumer: full-bigram transducer at a reduced bench shape
    from gtn_applications_tpu.criterions.transducer import Transducer

    Nt = 12
    crit = Transducer([(i,) for i in range(Nt)],
                      {i: i for i in range(Nt)}, ngram=2, reduction="mean")
    rng = np.random.RandomState(3)
    B, T = 4, 20
    x = jnp.asarray(rng.randn(B, T, Nt).astype(np.float32))
    prepared = crit.prepare(
        [rng.randint(0, Nt, size=6).tolist() for _ in range(B)])
    assert "factored" in prepared
    params = crit.init_params()

    def loss(p, x):
        return crit.loss(p, x, prepared)

    with _with_impl("off"):
        v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    with _with_impl("on"):
        v_new, g_new = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(v_new), float(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_new[0]["transitions"]),
        np.asarray(g_ref[0]["transitions"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-5)


def test_word_decomps_criterion_matches():
    # the real consumer: transitions-free multi-grapheme transducer
    from gtn_applications_tpu.criterions.transducer import Transducer

    tokens = ["ab", "ba", "a", "b", "bb"]
    g2i = {"a": 0, "b": 1}
    crit = Transducer(tokens, g2i, blank="optional", allow_repeats=False,
                      reduction="mean")
    rng = np.random.RandomState(1)
    B, T, N = 4, 9, len(tokens) + 1
    x = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    targets = [[0, 1, 0], [1, 1], [0, 0, 1, 1], [1]]
    saved_f = getattr(__import__(
        "gtn_applications_tpu.criterions.transducer", fromlist=["x"]),
        "_FACTORED_IMPL")
    import gtn_applications_tpu.criterions.transducer as tmod
    tmod._FACTORED_IMPL = "on"
    try:
        prepared = crit.prepare(targets)
    finally:
        tmod._FACTORED_IMPL = saved_f
    assert "factored_plain" in prepared

    def loss(x):
        return crit.loss({}, x, prepared)

    with _with_impl("off"):
        v_ref, g_ref = jax.value_and_grad(loss)(x)
    with _with_impl("on"):
        v_new, g_new = jax.value_and_grad(loss)(x)
    np.testing.assert_allclose(float(v_new), float(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_kernel_gate_defaults_off():
    # the kernels are chip-measured SLOWER than the XLA scan (see
    # dense_scan_pallas docstring); the shipped default must stay "off"
    # unless GTN_DENSE_SCAN=on is set explicitly
    if os.environ.get("GTN_DENSE_SCAN") in (None, "off", "0"):
        assert not F._use_dense_scan(32, 376)
        assert not F._use_factored_scan(32, 96, 80)


def test_remat_knob_is_pure_speed_tradeoff():
    # GTN_FACTORED_REMAT changes the backward's recompute schedule only;
    # losses and gradients must be identical
    rng = np.random.RandomState(9)
    em, adj, lab, start, accept, lens = _random_case(rng, 3, 10, 14, 6)
    ws = jnp.asarray(rng.randn(6).astype(np.float32) * 0.3)
    W = jnp.asarray(rng.randn(6, 6).astype(np.float32) * 0.3)
    we = jnp.asarray(rng.randn(6).astype(np.float32) * 0.3)

    def score(em, W):
        return jnp.sum(F.factored_lattice_score(
            em, adj, lab, start, accept, ws, W, we, lens))

    saved = F._SCAN_REMAT
    try:
        F._SCAN_REMAT = False
        v0, g0 = jax.value_and_grad(score, argnums=(0, 1))(em, W)
        F._SCAN_REMAT = True
        v1, g1 = jax.value_and_grad(score, argnums=(0, 1))(em, W)
    finally:
        F._SCAN_REMAT = saved
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
