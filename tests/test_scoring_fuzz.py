"""Randomized cross-path consistency: every sparse scoring implementation
must agree on random lattices.

Paths pinned against each other per trial:
  * pure-JAX ``forward_score`` (the oracle),
  * per-step seg_lse Pallas scan (``_SCAN_IMPL = 'step'``),
  * whole-scan MXU kernel (``_SCAN_IMPL = 'whole'``),
and for full-ngram transducers additionally the transition-factored dense
path vs the generic composed path (values + emission/param grads).
Deterministic seeds — failures reproduce.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gtn_applications_tpu.criterions.transducer import (
    Transducer,
    make_transitions_graph,
)
from gtn_applications_tpu.ops import sparse
from gtn_applications_tpu.ops.semiring import NEG
from gtn_applications_tpu.ops.sparse import ArcTable, forward_score


def _random_table(rng, S, A, E, eps_depth):
    src = list(range(S - 1)) + [0, S - 1]
    dst = list(range(1, S)) + [0, S - 1]
    while len(src) < A:
        src.append(int(rng.integers(0, S)))
        dst.append(int(rng.integers(0, S)))
    n = len(src)
    label = rng.integers(0, 6, size=n).astype(np.int32)
    w = (rng.normal(size=n) * 0.7).astype(np.float32)
    if eps_depth > 0 and E > 0:
        esrc = rng.integers(0, S, size=E).astype(np.int32)
        edst = rng.integers(0, S, size=E).astype(np.int32)
        ew = (rng.normal(size=E) * 0.5 - 1.0).astype(np.float32)
    else:
        esrc = np.zeros((0,), np.int32)
        edst = np.zeros((0,), np.int32)
        ew = np.zeros((0,), np.float32)
        eps_depth = 0
    start = np.full((S,), NEG, np.float32)
    start[: max(1, S // 4)] = 0.0
    accept = np.full((S,), NEG, np.float32)
    accept[rng.integers(0, S)] = 0.0
    accept[S - 1] = 0.0
    return ArcTable(
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(label), jnp.asarray(w), jnp.asarray(start),
        jnp.asarray(accept), jnp.asarray(esrc), jnp.asarray(edst),
        jnp.asarray(ew), eps_depth=eps_depth,
    )


@pytest.mark.parametrize("seed", range(6))
def test_scan_impls_agree_random(monkeypatch, seed):
    rng = np.random.default_rng(100 + seed)
    B = int(rng.integers(2, 5))
    T = int(rng.integers(3, 14))
    S = int(rng.integers(4, 14))
    A = int(rng.integers(S + 2, 3 * S + 4))
    eps_depth = int(rng.integers(0, 3))
    E = int(rng.integers(1, 6)) if eps_depth else 0
    table = _random_table(rng, S, A, E, eps_depth)
    em = jnp.asarray(rng.normal(size=(B, T, 6)), jnp.float32)
    lens = jnp.asarray(rng.integers(1, T + 1, size=B), jnp.int32)

    def loss(em, w, ew):
        t = table._replace(weight=w, eps_weight=ew)
        return jnp.sum(sparse._forward_batched_pallas(em, t, lens))

    def oracle(em, w, ew):
        t = table._replace(weight=w, eps_weight=ew)
        return jnp.sum(
            jax.vmap(lambda e, l: forward_score(e, t, l))(em, lens)
        )

    args = (em, table.weight, table.eps_weight)
    v_ref, g_ref = jax.value_and_grad(oracle, argnums=(0, 1, 2))(*args)
    for impl in ("step", "whole"):
        monkeypatch.setattr(sparse, "_SCAN_IMPL", impl)
        v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(*args)
        tol = 5e-4 * max(1.0, abs(float(v_ref)))
        assert abs(float(v - v_ref)) < tol, (impl, seed, float(v), float(v_ref))
        for name, a, b in zip(("dem", "dw", "deps"), g, g_ref):
            d = float(jnp.max(jnp.abs(a - b))) if a.size else 0.0
            assert d < 5e-4, (impl, seed, name, d)


@pytest.mark.parametrize("seed", range(4))
def test_factored_agrees_random(seed):
    rng = np.random.default_rng(200 + seed)
    n_tok = int(rng.integers(2, 5))
    toks = [chr(ord("a") + i) for i in range(n_tok)]
    g2i = {t: i for i, t in enumerate(toks)}
    ngram = int(rng.integers(1, 3))
    blank = ["none", "optional", "forced"][int(rng.integers(0, 3))]
    C = n_tok + int(blank != "none")
    B = int(rng.integers(2, 4))
    T = int(rng.integers(6, 12))
    fact = Transducer(toks, g2i, ngram=ngram, blank=blank)
    twin = Transducer(
        toks, g2i, transitions=make_transitions_graph(ngram, C, True),
        blank=blank,
    )
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [
        rng.integers(0, n_tok, size=rng.integers(1, 4)).tolist()
        for _ in range(B)
    ]
    lens = jnp.asarray(rng.integers(max(1, T - 4), T + 1, size=B), jnp.int32)
    prep_f = fact.prepare(targets)
    assert "factored" in prep_f
    # force the host-composed generic oracle for the twin (an explicit
    # transitions graph qualifies for the backoff-factored path too)
    from tests.test_factored import _prepare_generic

    prep_g = _prepare_generic(twin, targets)
    assert "factored" not in prep_g
    p0 = jnp.asarray(
        rng.normal(size=(fact.num_transition_arcs,)) * 0.5, jnp.float32
    )
    vf, gf = jax.value_and_grad(
        lambda p, x: fact.loss({"transitions": p}, x, prep_f, lens),
        argnums=(0, 1),
    )(p0, inputs)
    vg, gg = jax.value_and_grad(
        lambda p, x: twin.loss({"transitions": p}, x, prep_g, lens),
        argnums=(0, 1),
    )(p0, inputs)
    assert abs(float(vf - vg)) < 5e-4, (seed, float(vf), float(vg))
    assert float(jnp.max(jnp.abs(gf[0] - gg[0]))) < 5e-4, seed
    assert float(jnp.max(jnp.abs(gf[1] - gg[1]))) < 5e-4, seed


@pytest.mark.parametrize("seed", range(6))
def test_plain_factored_agrees_random(monkeypatch, seed):
    """Random multi-grapheme token inventories, transitions=None: the
    plain dense-adjacency scorer vs the sparse per-arc oracle (losses +
    emission grads), across blank modes, ragged lengths (incl. 0), and
    repeated/unreachable targets."""
    from gtn_applications_tpu.criterions import transducer as tmod
    from tests.test_factored import _prepare_generic

    rng = np.random.default_rng(300 + seed)
    n_graph = int(rng.integers(2, 5))
    graphemes = [chr(ord("a") + i) for i in range(n_graph)]
    g2i = {g: i for i, g in enumerate(graphemes)}
    toks = list(graphemes)
    for _ in range(int(rng.integers(1, 4))):  # multi-grapheme pieces
        L = int(rng.integers(2, 4))
        toks.append("".join(rng.choice(graphemes) for _ in range(L)))
    toks = list(dict.fromkeys(toks))
    blank = ["optional", "none"][int(rng.integers(0, 2))]
    ar = blank == "none"  # allow_repeats=False needs an optional blank
    C = len(toks) + int(blank != "none")
    B = int(rng.integers(2, 5))
    T = int(rng.integers(5, 11))

    fact = Transducer(toks, g2i, blank=blank, allow_repeats=ar)
    twin = Transducer(toks, g2i, blank=blank, allow_repeats=ar)
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [
        rng.integers(0, n_graph, size=rng.integers(0, 5)).tolist()
        for _ in range(B)
    ]
    lens = jnp.asarray(rng.integers(0, T + 1, size=B), jnp.int32)

    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    prep_f = fact.prepare(targets)
    assert "factored_plain" in prep_f, seed
    prep_g = _prepare_generic(twin, targets)

    vf, gf = jax.value_and_grad(
        lambda x: fact.loss({}, x, prep_f, lens)
    )(inputs)
    vg, gg = jax.value_and_grad(
        lambda x: twin.loss({}, x, prep_g, lens)
    )(inputs)
    both_inf = not np.isfinite(float(vf)) and not np.isfinite(float(vg))
    huge = abs(float(vf)) > 1e20 and abs(float(vg)) > 1e20
    if both_inf or huge:
        return  # batch-wide untransducible: both paths agree it's dead
    assert abs(float(vf - vg)) < 5e-4, (seed, float(vf), float(vg))
    assert float(jnp.max(jnp.abs(gf - gg))) < 5e-4, seed
