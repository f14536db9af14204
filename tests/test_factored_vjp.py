"""Differential tests: analytic alpha-beta custom VJP for the dense
factored scans (ops/factored_vjp.py) vs the autodiffed lax.scan oracle
(GTN_FACTORED_VJP=off — the exact round-4 path).

The custom path must match the oracle's losses AND all gradients
(emissions, transition rows, adjacency) on every scorer it rewires:
``alignment_lattice_score`` and ``factored_lattice_score``
(the shared-K dense normalizer and ASG scans were measured slower
under the VJP and stay on XLA's transpose).  Behavioral spec: reference transducer.py:239-309;
gradient semantics reference ctc.py:71-94 (gtn.backward posteriors).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gtn_applications_tpu.ops import factored as fact
from gtn_applications_tpu.ops.semiring import NEG


def _both(fn, *args, wrt):
    """(value, grads) under the custom path and the oracle path."""
    out = []
    saved = fact._VJP_IMPL
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        try:
            val, grads = jax.value_and_grad(
                lambda *a: jnp.sum(fn(*a)), argnums=wrt
            )(*args)
        finally:
            fact._VJP_IMPL = saved
        out.append((np.asarray(val), [np.asarray(g) for g in grads]))
    return out


def _random_lattice(rng, B, S, N, density=0.4):
    """Random dense-adjacency alignment tables in the factored layout:
    every state has a unique in-label, a random subset of arcs."""
    adj = np.zeros((B, S, S), np.float32)
    lab_oh = np.zeros((B, S, N), np.float32)
    start = np.full((B, S), NEG, np.float32)
    accept = np.full((B, S), NEG, np.float32)
    for b in range(B):
        labels = rng.integers(0, N, size=S)
        lab_oh[b, np.arange(S), labels] = 1.0
        mask = rng.random((S, S)) < density
        mask[np.arange(S), np.roll(np.arange(S), -1)] = True  # connected
        w = rng.normal(size=(S, S)).astype(np.float32)
        adj[b][mask] = np.exp(w[mask])
        start[b, rng.integers(0, S, size=2)] = 0.0
        accept[b, rng.integers(0, S, size=2)] = 0.0
    return jnp.asarray(adj), jnp.asarray(lab_oh), jnp.asarray(
        start), jnp.asarray(accept)


@pytest.mark.parametrize("seed,B,T,S,N", [(0, 3, 7, 9, 5), (1, 2, 12, 6, 4),
                                          (2, 4, 5, 11, 7)])
def test_alignment_score_matches_oracle(seed, B, T, S, N):
    rng = np.random.default_rng(seed)
    adj, lab, start, accept = _random_lattice(rng, B, S, N)
    em = jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, T + 1, size=B), jnp.int32)

    (v_new, g_new), (v_old, g_old) = _both(
        lambda e, a: fact.alignment_lattice_score(e, a, lab, start,
                                                  accept, lens),
        em, adj, wrt=(0, 1),
    )
    np.testing.assert_allclose(v_new, v_old, rtol=1e-5, atol=1e-5)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(gn, go, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed,B,T,S,N", [(3, 3, 9, 8, 5), (4, 2, 6, 10, 6)])
def test_factored_score_matches_oracle(seed, B, T, S, N):
    rng = np.random.default_rng(seed)
    adj, lab, start, accept = _random_lattice(rng, B, S, N)
    em = jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(N, N)) * 1.5, jnp.float32)
    we = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, T + 1, size=B), jnp.int32)

    (v_new, g_new), (v_old, g_old) = _both(
        lambda e, a, w1, w2, w3: fact.factored_lattice_score(
            e, a, lab, start, accept, w1, w2, w3, lens),
        em, adj, ws, W, we, wrt=(0, 1, 2, 3, 4),
    )
    np.testing.assert_allclose(v_new, v_old, rtol=1e-5, atol=1e-5)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(gn, go, rtol=1e-4, atol=1e-5)



def test_zero_and_one_frame_edges():
    """T=1 (empty scan tail) and zero-length samples must agree."""
    rng = np.random.default_rng(7)
    B, T, S, N = 3, 1, 6, 4
    adj, lab, start, accept = _random_lattice(rng, B, S, N)
    em = jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32)
    lens = jnp.asarray([1, 0, 1], jnp.int32)

    (v_new, g_new), (v_old, g_old) = _both(
        lambda e, a: fact.alignment_lattice_score(e, a, lab, start,
                                                  accept, lens),
        em, adj, wrt=(0, 1),
    )
    np.testing.assert_allclose(v_new, v_old, rtol=1e-5, atol=1e-5)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(gn, go, rtol=1e-4, atol=1e-5)


def test_gradcheck_vs_numeric():
    """The custom VJP against central finite differences (fp64-free:
    loose tolerance, smooth regime)."""
    rng = np.random.default_rng(8)
    B, T, S, N = 2, 5, 5, 4
    adj, lab, start, accept = _random_lattice(rng, B, S, N, density=0.7)
    em0 = rng.normal(size=(B, T, N)).astype(np.float32)
    W0 = (rng.normal(size=(N, N)) * 0.5).astype(np.float32)
    ws = jnp.zeros((N,), jnp.float32)
    we = jnp.zeros((N,), jnp.float32)

    def f(e, w):
        return jnp.sum(fact.factored_lattice_score(
            e, adj, lab, start, accept, ws, w, we))

    g_em, g_W = jax.grad(f, argnums=(0, 1))(jnp.asarray(em0),
                                            jnp.asarray(W0))
    eps = 1e-2
    for _ in range(6):
        i = tuple(rng.integers(0, d) for d in em0.shape)
        ep, en = em0.copy(), em0.copy()
        ep[i] += eps
        en[i] -= eps
        num = (f(jnp.asarray(ep), jnp.asarray(W0))
               - f(jnp.asarray(en), jnp.asarray(W0))) / (2 * eps)
        np.testing.assert_allclose(g_em[i], num, rtol=5e-2, atol=5e-3)
    for _ in range(6):
        i = tuple(rng.integers(0, d) for d in W0.shape)
        wp, wn = W0.copy(), W0.copy()
        wp[i] += eps
        wn[i] -= eps
        num = (f(jnp.asarray(em0), jnp.asarray(wp))
               - f(jnp.asarray(em0), jnp.asarray(wn))) / (2 * eps)
        np.testing.assert_allclose(g_W[i], num, rtol=5e-2, atol=5e-3)


def test_underflow_adjacent_no_nans():
    """Deep-underflow lattices (huge negative emissions): scores may
    clamp but gradients must stay finite on both paths."""
    rng = np.random.default_rng(9)
    B, T, S, N = 2, 6, 5, 4
    adj, lab, start, accept = _random_lattice(rng, B, S, N, density=0.6)
    em = jnp.asarray(rng.normal(size=(B, T, N)) * 40.0 - 60.0, jnp.float32)
    lens = jnp.asarray([T, T - 2], jnp.int32)

    for impl in ("auto", "off"):
        saved = fact._VJP_IMPL
        fact._VJP_IMPL = impl
        try:
            val, g = jax.value_and_grad(
                lambda e: jnp.sum(fact.alignment_lattice_score(
                    e, adj, lab, start, accept, lens))
            )(em)
        finally:
            fact._VJP_IMPL = saved
        assert np.isfinite(np.asarray(val))
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("seed", [20, 21])
def test_vjp_arbitrary_cotangents(seed):
    """lattice_scan's bwd must be the true linear transpose for ANY
    cotangent (not just the loss-readout posteriors our criteria feed
    it): compare jax.vjp against the oracle path under random
    mixed-sign cotangents on the raw scan output."""
    rng = np.random.default_rng(seed)
    B, T, S, N = 3, 6, 7, 4
    adj, lab, start, accept = _random_lattice(rng, B, S, N, density=0.6)
    em = jnp.asarray(rng.normal(size=(B, T, N)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, T + 1, size=B), jnp.int32)
    ct = jnp.asarray(rng.normal(size=(B,)), jnp.float32)  # mixed signs

    outs = []
    saved = fact._VJP_IMPL
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        try:
            val, pull = jax.vjp(
                lambda e, a: fact.alignment_lattice_score(
                    e, a, lab, start, accept, lens),
                em, adj,
            )
            outs.append((np.asarray(val), [np.asarray(g) for g in
                                           pull(ct)]))
        finally:
            fact._VJP_IMPL = saved
    (v_new, g_new), (v_old, g_old) = outs
    np.testing.assert_allclose(v_new, v_old, rtol=1e-5, atol=1e-5)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(gn, go, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed,blank,prune", [(50, "optional", 0),
                                              (51, "none", 1)])
def test_backoff_dst_exp_tier_matches_staged(seed, blank, prune):
    """The exp-linear dst-factored tier (backoff_dst_exp_score, the
    GTN_FACTORED_VJP default) vs the staged oracle: losses + all grads
    (emissions AND learned transition arc weights) on pruned backoff
    graphs with ragged/zero-length samples."""
    from tests.test_factored import _bigram_lm_graph, _prepare_generic  # noqa
    from gtn_applications_tpu.criterions import transducer as tmod
    from gtn_applications_tpu.criterions.transducer import Transducer

    ntok = 4
    g = _bigram_lm_graph(7 + prune, ntok, blank, prune)
    tokens = [str(i) for i in range(ntok)]
    crit = Transducer(tokens, {str(i): i for i in range(ntok)},
                      transitions=g, blank=blank)
    assert crit._factored_backoff_dst
    rng = np.random.default_rng(seed)
    B, T = 3, 7
    C = ntok + int(blank != "none")
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1], [], [2, 0, 1]]
    lens = jnp.asarray([T, 0, T - 1], jnp.int32)
    params = jnp.asarray(
        rng.normal(size=(crit.num_transition_arcs,)) * 0.4, jnp.float32)

    saved_f = tmod._FACTORED_IMPL
    tmod._FACTORED_IMPL = "on"
    try:
        crit._factored_backoff = False  # force the dst variant
        prep = crit.prepare(targets)
        assert "factored_dst" in prep
        out = []
        saved = fact._VJP_IMPL
        for impl in ("auto", "off"):
            fact._VJP_IMPL = impl
            try:
                v, grads = jax.value_and_grad(
                    lambda p, x: crit.loss(
                        {"transitions": p}, x, prep, lens),
                    argnums=(0, 1),
                )(params, inputs)
            finally:
                fact._VJP_IMPL = saved
            out.append((np.asarray(v), [np.asarray(g) for g in grads]))
    finally:
        tmod._FACTORED_IMPL = saved_f
    (v_new, g_new), (v_old, g_old) = out
    np.testing.assert_allclose(v_new, v_old, rtol=1e-4, atol=1e-4)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(gn, go, rtol=2e-3, atol=1e-4)


# -- low-rank epsilon closure (eps_chain_struct / eps_lowrank_build) ----


def test_eps_chain_struct_gates():
    """Structure builder: fan-out-safe enumeration; None on no-eps,
    too-many-paths, and no-win (2K > S) inputs."""
    # simple chain 0->1->2 at depth 2: paths 0->1, 0->1->2, 1->2
    st = fact.eps_chain_struct([0, 1], [1, 2], 8, 2)
    assert st is not None
    path_arcs, path_col_oh, col_onehot = st
    assert path_arcs.shape[0] == 8 and col_onehot.shape == (2, 8)
    # state 0 has two paths (lengths 1, 2); landing cols {1, 2}
    assert (path_arcs[0, :, 0] >= 0).sum() == 2
    # no eps arcs
    assert fact.eps_chain_struct([], [], 8, 2) is None
    # depth 0
    assert fact.eps_chain_struct([0], [1], 8, 0) is None
    # no win: landing columns cover more than half the states (2K > S)
    assert fact.eps_chain_struct(
        [0, 1, 2, 3, 4], [5, 6, 7, 3, 4], 8, 1) is None
    # path explosion: complete eps fan-out blows max_paths
    src = [0] * 6 + [1] * 6
    dst = [1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2]
    assert fact.eps_chain_struct(src, dst, 16, 4, max_paths=8) is None


@pytest.mark.parametrize("seed,fanout", [(0, False), (1, True)])
def test_eps_lowrank_closure_matches_dense(seed, fanout):
    """I + U @ C == the dense exp-domain power series sum_k E^k on a
    random eps DAG (optionally with fan-out), random learnable weights."""
    rng = np.random.default_rng(seed)
    S, depth = 12, 3
    # a layered DAG into two hub states {10, 11}
    src, dst = [], []
    for s in range(8):
        src.append(s)
        dst.append(10 if s % 2 else 11)
        if fanout and s < 3:
            src.append(s)
            dst.append(8 + (s % 2))
    src += [8, 9]
    dst += [10, 11]
    ew = jnp.asarray(rng.normal(size=(len(src),)), jnp.float32)
    st = fact.eps_chain_struct(src, dst, S, depth)
    assert st is not None
    U, C = fact.eps_lowrank_build(ew, st)
    E = np.zeros((S, S), np.float64)
    for i, (s, d) in enumerate(zip(src, dst)):
        E[s, d] += np.exp(float(ew[i]))
    M = np.eye(S)
    cur = np.eye(S)
    for _ in range(depth):
        cur = cur @ E
        M = M + cur
    M_lr = np.eye(S) + np.asarray(U, np.float64) @ np.asarray(C, np.float64)
    np.testing.assert_allclose(M_lr, M, rtol=1e-5, atol=1e-6)


def test_backoff_dst_lowrank_engaged(monkeypatch):
    """The bigram-LM fixture must actually ENGAGE the low-rank closure
    under the default gate (guards against the tier silently gating
    itself off), and its loss/grads must match the dense-closure oracle
    — including gradients of the epsilon (backoff) arc weights."""
    from tests.test_factored import _bigram_lm_graph  # noqa
    from gtn_applications_tpu.criterions import transducer as tmod
    from gtn_applications_tpu.criterions.transducer import Transducer

    ntok = 4
    g = _bigram_lm_graph(9, ntok, "optional", 0)
    crit = Transducer([str(i) for i in range(ntok)],
                      {str(i): i for i in range(ntok)},
                      transitions=g, blank="optional")
    assert crit._factored_backoff_dst
    assert crit._eps_lr_struct is not None, (
        "low-rank closure must engage on the builder's bigram output"
    )
    assert len(np.asarray(crit._norm_table.eps_src)) > 0
    monkeypatch.setattr(crit, "_factored_backoff", False)
    rng = np.random.default_rng(11)
    B, T, C = 3, 8, ntok + 1
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    saved_f = tmod._FACTORED_IMPL
    tmod._FACTORED_IMPL = "on"
    try:
        prep = crit.prepare([[0, 1], [2], [3, 0, 1]])
    finally:
        tmod._FACTORED_IMPL = saved_f
    assert "factored_dst" in prep
    params = jnp.asarray(
        rng.normal(size=(crit.num_transition_arcs,)) * 0.5, jnp.float32)
    out = []
    saved = fact._VJP_IMPL
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        try:
            v, grads = jax.value_and_grad(
                lambda p, x: crit.loss({"transitions": p}, x, prep),
                argnums=(0, 1),
            )(params, inputs)
        finally:
            fact._VJP_IMPL = saved
        out.append((np.asarray(v), [np.asarray(gr) for gr in grads]))
    (v_new, g_new), (v_old, g_old) = out
    np.testing.assert_allclose(v_new, v_old, rtol=1e-5, atol=1e-5)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(gn, go, rtol=1e-3, atol=1e-5)
    # the eps arc weights must receive NONZERO gradient through the
    # low-rank build (a broken fold would silently zero them)
    eps_widx = np.asarray(crit._norm_eps_widx)
    eps_params = eps_widx[eps_widx >= 0]
    assert np.abs(g_new[0][eps_params]).max() > 0.0
