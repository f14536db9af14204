"""Differential tests: transition-factored n-gram transducer scoring
(ops/factored.py) vs the generic host-composed path.

The factored path never composes transitions into the per-sample tables;
these tests pin its losses and all gradients (transition params and
emissions) against a twin criterion built with an explicit transitions
graph, which takes the generic sparse-table path.  Behavioral spec:
reference transducer.py:239-309 (compose + forward_score with
transitions present).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gtn_applications_tpu.criterions import transducer as tmod
from gtn_applications_tpu.criterions.transducer import (
    Transducer,
    make_transitions_graph,
)

TOKS = ["a", "b", "c"]
G2I = {c: i for i, c in enumerate("abc")}


def _pair(ngram, blank, allow_repeats=True):
    n_chan = len(TOKS) + int(blank != "none")
    fact = Transducer(TOKS, G2I, ngram=ngram, blank=blank,
                      allow_repeats=allow_repeats)
    twin = Transducer(TOKS, G2I,
                      transitions=make_transitions_graph(ngram, n_chan, True),
                      blank=blank, allow_repeats=allow_repeats)
    return fact, twin, n_chan


def _prepare_generic(crit, targets):
    """Force the host-composed generic path regardless of the factored
    gates (explicit transitions graphs qualify for the backoff-factored
    path too)."""
    saved = tmod._FACTORED_IMPL
    tmod._FACTORED_IMPL = "off"
    try:
        return crit.prepare(targets)
    finally:
        tmod._FACTORED_IMPL = saved


@pytest.mark.parametrize(
    "ngram,blank,allow_repeats",
    [(1, "optional", True), (2, "optional", True), (2, "none", True),
     (2, "forced", True), (2, "optional", False)],
)
def test_factored_matches_generic(ngram, blank, allow_repeats):
    rng = np.random.default_rng(ngram * 10 + len(blank))
    fact, twin, C = _pair(ngram, blank, allow_repeats)
    B, T = 3, 8
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1], [2, 0, 1], [1]]
    lens = jnp.asarray([T, T - 2, 5], jnp.int32)

    prep_f = fact.prepare(targets)
    assert "factored" in prep_f, "factored path must engage for full ngrams"
    prep_g = _prepare_generic(twin, targets)
    assert "factored" not in prep_g

    p0 = jnp.asarray(
        rng.normal(size=(fact.num_transition_arcs,)) * 0.4, jnp.float32
    )

    vf, gf = jax.value_and_grad(
        lambda p, x: fact.loss({"transitions": p}, x, prep_f, lens),
        argnums=(0, 1),
    )(p0, inputs)
    vg, gg = jax.value_and_grad(
        lambda p, x: twin.loss({"transitions": p}, x, prep_g, lens),
        argnums=(0, 1),
    )(p0, inputs)

    assert abs(float(vf - vg)) < 2e-4
    assert float(jnp.max(jnp.abs(gf[0] - gg[0]))) < 2e-4
    assert float(jnp.max(jnp.abs(gf[1] - gg[1]))) < 2e-4


def test_infeasible_sample_has_zero_param_grads():
    """An infeasible sample (forced blank needs 2L+1 > len frames) must
    contribute NO gradient to the learned transitions through the score
    term — only the (feasible) normalizer term.  Both the factored and the
    generic composed path are pinned; the generic path used to leak
    uniform softmax weights over dead states through logsumexp."""
    rng = np.random.default_rng(9)
    fact, twin, C = _pair(2, "forced")
    T = 6
    inputs = jnp.asarray(rng.normal(size=(1, T, C)), jnp.float32)
    targets = [[2, 0, 1]]  # needs 2*3+1 = 7 frames > 6
    p0 = jnp.asarray(
        rng.normal(size=(fact.num_transition_arcs,)) * 0.4, jnp.float32
    )

    from gtn_applications_tpu.ops import factored as F
    from gtn_applications_tpu.ops import sparse

    prep_f = fact.prepare(targets)
    prep_g = _prepare_generic(twin, targets)

    def score_f(p):
        ws, W, we, _we0 = F.ngram_rows(p, 2, C)
        f = prep_f["factored"]
        return jnp.sum(F.factored_lattice_score(
            inputs, f["adj_exp"], f["lab_oh"], f["start"], f["accept"],
            ws, W, we))

    def score_g(p):
        table = twin._apply_params(
            prep_g["table"],
            prep_g["widx"], prep_g["eps_widx"], p,
        )
        return jnp.sum(sparse.forward_score_batch_tables(inputs, table))

    for name, fn in (("factored", score_f), ("generic", score_g)):
        v, g = jax.value_and_grad(fn)(p0)
        assert float(v) < -1e28, name
        assert float(jnp.max(jnp.abs(g))) == 0.0, (
            name, np.nonzero(np.abs(np.asarray(g)) > 0))


def _backoff_graph(C, rng):
    """Pruned bigram with unigram backoff: unigram hub, per-label bigram
    states, epsilon backoff arcs, and random direct bigram arcs."""
    from gtn_applications_tpu.wfst import EPSILON, Graph

    g = Graph()
    uni = g.add_node(True, True)
    for lbl in range(C):
        g.add_node(False, True)
    for lbl in range(C):
        g.add_arc(uni, lbl + 1, lbl)
        g.add_arc(lbl + 1, uni, EPSILON)
    for _ in range(2 * C):
        a = int(rng.integers(0, C))
        b = int(rng.integers(0, C))
        g.add_arc(a + 1, b + 1, b)
    return g


@pytest.mark.parametrize("seed,blank", [(0, "optional"), (1, "none"),
                                        (2, "optional")])
def test_backoff_factored_matches_generic(monkeypatch, seed, blank):
    rng = np.random.default_rng(seed)
    C = len(TOKS) + int(blank != "none")
    g = _backoff_graph(C, rng)

    fact = Transducer(TOKS, G2I, transitions=g, blank=blank)
    assert fact._factored_backoff
    twin = Transducer(TOKS, G2I, transitions=g.copy(), blank=blank)
    # "on" forces the backoff-factored path on the CPU test backend
    # (under "auto" it requires TPU, where segment ops are pathological)
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")

    B, T = 3, 8
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1], [2, 0, 1], [1]]
    lens = jnp.asarray([T, T - 2, 4], jnp.int32)
    prep_f = fact.prepare(targets)
    assert "factored" in prep_f
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "off")
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
    assert abs(float(vf - vg)) < 5e-4, (float(vf), float(vg))
    assert float(jnp.max(jnp.abs(gf[0] - gg[0]))) < 5e-4
    assert float(jnp.max(jnp.abs(gf[1] - gg[1]))) < 5e-4


def test_backoff_zero_length_sample(monkeypatch):
    # zero-frame sample with a nonempty target against a backoff graph
    # whose start state has outgoing epsilon arcs: the composed oracle
    # gives ZERO grads for it (empty path infeasible); the factored path
    # must too
    rng = np.random.default_rng(6)
    C = len(TOKS) + 1
    g = _backoff_graph(C, rng)
    fact = Transducer(TOKS, G2I, transitions=g, blank="optional")
    twin = Transducer(TOKS, G2I, transitions=g.copy(), blank="optional")
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    T = 6
    inputs = jnp.asarray(rng.normal(size=(2, T, C)), jnp.float32)
    targets = [[0, 1], [2]]
    lens = jnp.asarray([0, T], jnp.int32)
    prep_f = fact.prepare(targets)
    assert "factored" in prep_f
    prep_g = _prepare_generic(twin, targets)
    p0 = jnp.asarray(
        rng.normal(size=(fact.num_transition_arcs,)) * 0.4, jnp.float32
    )
    vf, gf = jax.value_and_grad(
        lambda p: fact.loss({"transitions": p}, inputs, prep_f, lens)
    )(p0)
    vg, gg = jax.value_and_grad(
        lambda p: twin.loss({"transitions": p}, inputs, prep_g, lens)
    )(p0)
    assert abs(float(vf - vg)) < 2e-4
    assert float(jnp.max(jnp.abs(gf - gg))) < 2e-4


def test_factored_zero_length_sample():
    # a zero-frame sample only admits the empty path (start∩accept in the
    # alignment, the root's final epsilon in the n-gram)
    rng = np.random.default_rng(4)
    fact, twin, C = _pair(2, "optional")
    T = 6
    inputs = jnp.asarray(rng.normal(size=(2, T, C)), jnp.float32)
    targets = [[0, 1], [2]]
    lens = jnp.asarray([0, T], jnp.int32)
    prep_f = fact.prepare(targets)
    prep_g = _prepare_generic(twin, targets)
    p0 = jnp.asarray(
        rng.normal(size=(fact.num_transition_arcs,)) * 0.4, jnp.float32
    )
    vf, gf = jax.value_and_grad(
        lambda p: fact.loss({"transitions": p}, inputs, prep_f, lens)
    )(p0)
    vg, gg = jax.value_and_grad(
        lambda p: twin.loss({"transitions": p}, inputs, prep_g, lens)
    )(p0)
    assert abs(float(vf - vg)) < 2e-4
    assert float(jnp.max(jnp.abs(gf - gg))) < 2e-4


def test_factored_off_switch(monkeypatch):
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "off")
    crit = Transducer(TOKS, G2I, ngram=2, blank="optional")
    prep = crit.prepare([[0, 1]])
    assert "factored" not in prep


def test_backoff_factored_learns(monkeypatch):
    """SGD through the backoff-factored loss must reduce it (end-to-end
    gradient sanity beyond pointwise parity)."""
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    rng = np.random.default_rng(12)
    C = len(TOKS) + 1
    crit = Transducer(TOKS, G2I, transitions=_backoff_graph(C, rng),
                      blank="optional", reduction="mean")
    B, T = 4, 12
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1], [2], [1, 1], [0, 2, 1]]
    prep = crit.prepare(targets)
    assert "factored" in prep
    p = crit.init_params()["transitions"]
    x = inputs

    def loss_fn(p, x):
        return crit.loss({"transitions": p}, x, prep)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
    v0 = None
    for _ in range(30):
        v, (gp, gx) = grad_fn(p, x)
        if v0 is None:
            v0 = float(v)
        p = p - 0.5 * gp
        x = x - 0.5 * gx
    assert float(v) < v0 - 0.5, (v0, float(v))


def test_backoff_dst_factored_learns(monkeypatch):
    """Same end-to-end gradient sanity through the destination-factored
    scorer + dense normalizer (the huge-LM dispatch)."""
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    rng = np.random.default_rng(13)
    ntok = 4
    g = _bigram_lm_graph(3, ntok, "optional", 0)
    crit = Transducer(
        [str(i) for i in range(ntok)], {str(i): i for i in range(ntok)},
        transitions=g, blank="optional", reduction="mean",
    )
    assert crit._factored_backoff_dst
    monkeypatch.setattr(crit, "_factored_backoff", False)
    C = ntok + 1
    B, T = 4, 12
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    prep = crit.prepare([[0, 1], [2], [1, 3], [0, 2, 1]])
    assert "factored" in prep
    p = crit.init_params()["transitions"]
    x = inputs

    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, x: crit.loss({"transitions": p}, x, prep), argnums=(0, 1)
    ))
    v0 = None
    for _ in range(30):
        v, (gp, gx) = grad_fn(p, x)
        if v0 is None:
            v0 = float(v)
        p = p - 0.5 * gp
        x = x - 0.5 * gx
    assert float(v) < v0 - 0.5, (v0, float(v))


def test_factored_viterbi_unchanged():
    # decode goes through the transitions decode template either way
    rng = np.random.default_rng(3)
    crit = Transducer(TOKS, G2I, ngram=2, blank="optional")
    C = 4
    inputs = jnp.asarray(rng.normal(size=(2, 10, C)), jnp.float32)
    p = {"transitions": jnp.asarray(
        rng.normal(size=(crit.num_transition_arcs,)) * 0.3, jnp.float32)}
    out = crit.viterbi(inputs, p)
    assert len(out) == 2
    for o in out:
        assert o.dtype == np.int32


def _bigram_lm_graph(seed, ntok, blank, prune):
    """A pruned bigram + blank-interleave transition graph via the
    offline builder (the structure the dst-factored scorer targets)."""
    import random

    from gtn_applications_tpu.scripts import build_transitions as bt

    rng = random.Random(seed)
    lines = [
        [str(rng.randrange(ntok)) for _ in range(rng.randint(3, 8))]
        for _ in range(150)
    ]
    t2i = {str(i): i for i in range(ntok)}
    counts = bt.count_ngrams(lines, 2, t2i)
    pruned = bt.prune_ngrams(counts, [0, prune])
    grams = (
        bt.add_blank_grams(pruned, ntok, blank) if blank != "none" else pruned
    )
    grams = bt.add_self_loops(grams)
    return bt.build_graph(grams)


@pytest.mark.parametrize(
    "blank,prune", [("optional", 0), ("forced", 1), ("none", 0)]
)
@pytest.mark.slow  # large composed-path differential
def test_backoff_dst_factored_matches_generic(monkeypatch, blank, prune):
    """The destination-factored scorer (the 1k-wordpiece-LM regime, where
    the dense [N, S_c, S_c] form cannot materialize) == the generic
    composed path: losses, transition grads, emission grads — including a
    ragged batch with a zero-length input and an empty target."""
    ntok = 4
    g = _bigram_lm_graph(7 + prune, ntok, blank, prune)
    tokens = [str(i) for i in range(ntok)]
    g2i = {str(i): i for i in range(ntok)}
    crit = Transducer(tokens, g2i, transitions=g, blank=blank)
    assert crit._factored_backoff_dst  # build_transitions output qualifies

    rng = np.random.default_rng(31 + prune)
    B, T = 3, 7
    C = ntok + int(blank != "none")
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1], [], [2, 0, 1]]
    lens = jnp.asarray([T, 0, T - 1], jnp.int32)
    params = jnp.asarray(
        rng.normal(size=(crit.num_transition_arcs,)) * 0.4, jnp.float32
    )

    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    prep_f = crit.prepare(targets)
    assert "factored" in prep_f
    prep_g = _prepare_generic(crit, targets)
    # emulate the huge-LM regime: only the dst variant is available
    monkeypatch.setattr(crit, "_factored_backoff", False)

    def val_and_grads(prep):
        f = lambda p, x: crit.loss({"transitions": p}, x, prep, lens)
        return jax.value_and_grad(f, argnums=(0, 1))(params, inputs)

    vg, gg = val_and_grads(prep_g)
    vt, gt = val_and_grads(prep_f)
    tol = 5e-4 * max(1.0, abs(float(vg)))
    assert abs(float(vt - vg)) < tol, (blank, float(vt), float(vg))
    assert float(jnp.max(jnp.abs(gt[0] - gg[0]))) < 5e-4, blank
    assert float(jnp.max(jnp.abs(gt[1] - gg[1]))) < 5e-4, blank


def test_factored_untransducible_batch_scores_neg(monkeypatch):
    """A batch whose targets have no decomposition packs empty alignment
    lattices; the factored path must score NEG (infinite loss), not trip
    zero-size reductions."""
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    fact, _, C = _pair(2, "optional")
    # grapheme id 9 exists in no token: compose(target, lexicon) is empty
    bad = [[0, 9], [9]]
    prep = fact.prepare(bad)
    assert "factored" in prep
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, C)), jnp.float32)
    loss = fact.loss(fact.init_params(), x, prep)
    assert float(loss) > 1e20


def test_dst_gate_rejects_multi_destination_labels():
    """A transition graph where one label advances to two different
    contexts violates the dst-factored invariant and must not enable it
    (the dense form still applies)."""
    from gtn_applications_tpu.wfst import Graph

    g = Graph()
    for i in range(3):
        g.add_node(i == 0, True)
    g.add_arc(0, 1, 0)
    g.add_arc(1, 2, 0)  # label 0 advances to both 1 and 2
    g.add_arc(2, 0, 1)
    crit = Transducer(
        ["x", "y"], {"x": 0, "y": 1}, transitions=g, blank="none"
    )
    assert not crit._factored_backoff_dst
    assert crit._factored_backoff  # tiny graph: dense form still fine


@pytest.mark.parametrize("blank", ["optional", "forced", "none"])
def test_backoff_dst_viterbi_matches_composed(monkeypatch, blank):
    """The destination-factored tropical decode == the composed
    eps-removed-table decode: same alignment labels (hence same
    transduced predictions) over random emissions, ragged lengths, and
    every blank mode."""
    ntok = 4
    g = _bigram_lm_graph(11, ntok, blank, 0)
    crit = Transducer(
        [str(i) for i in range(ntok)], {str(i): i for i in range(ntok)},
        transitions=g, blank=blank,
    )
    assert crit._factored_backoff_dst
    rng = np.random.default_rng(17)
    B, T = 3, 8
    C = ntok + int(blank != "none")
    outputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    lens = jnp.asarray([T, T - 3, 1], jnp.int32)
    params = {
        "transitions": jnp.asarray(
            rng.normal(size=(crit.num_transition_arcs,)) * 0.4, jnp.float32
        )
    }
    monkeypatch.setattr(tmod, "_DECODE_FACTORED_MIN_ARCS", 1 << 60)
    ref = crit.viterbi(outputs, params, input_lengths=lens)
    monkeypatch.setattr(tmod, "_DECODE_FACTORED_MIN_ARCS", 0)
    crit._decode_dst_cache = None
    got = crit.viterbi(outputs, params, input_lengths=lens)
    for b in range(B):
        np.testing.assert_array_equal(got[b], ref[b], err_msg=str(b))


def test_backoff_dst_deep_eps_chain(monkeypatch):
    """Closure origins must survive multi-hop backoff chains: a state
    whose best continuation routes deep -> mid -> root -> arc.  Decode
    labels and loss match the composed path."""
    from gtn_applications_tpu.wfst import EPSILON, Graph

    ntok = 3
    rng = np.random.RandomState(0)
    g = Graph()
    root = g.add_node(True, True)
    ctx1 = [g.add_node(False, True) for _ in range(ntok)]
    deep = g.add_node(False, True)
    mid = g.add_node(False, True)
    g.add_arc(deep, mid, EPSILON, EPSILON, float(rng.randn() * 0.3))
    g.add_arc(mid, root, EPSILON, EPSILON, float(rng.randn() * 0.3))
    for l in range(ntok):
        g.add_arc(root, ctx1[l], l, l, float(rng.randn() * 0.5))
        g.add_arc(ctx1[l], root, EPSILON, EPSILON, float(rng.randn() * 0.3))
    g.add_arc(ctx1[0], ctx1[1], 1, 1, float(rng.randn() * 0.5))
    g.add_arc(ctx1[1], ctx1[0], 0, 0, float(rng.randn() * 0.5))
    g.add_arc(deep, ctx1[2], 2, 2, 2.0)
    g.add_arc(deep, deep, 0, 0, 1.0)
    crit = Transducer(
        [str(i) for i in range(ntok)], {str(i): i for i in range(ntok)},
        transitions=g, blank="none",
    )
    assert crit._factored_backoff_dst and crit._norm_table.eps_depth >= 2

    B, T = 2, 6
    outputs = jnp.asarray(rng.randn(B, T, ntok).astype(np.float32))
    params = {
        "transitions": jnp.asarray(
            rng.randn(crit.num_transition_arcs).astype(np.float32) * 0.4
        )
    }
    lens = jnp.asarray([T, T - 2], jnp.int32)
    monkeypatch.setattr(tmod, "_DECODE_FACTORED_MIN_ARCS", 1 << 60)
    ref = crit.viterbi(outputs, params, input_lengths=lens)
    monkeypatch.setattr(tmod, "_DECODE_FACTORED_MIN_ARCS", 0)
    crit._decode_dst_cache = None
    got = crit.viterbi(outputs, params, input_lengths=lens)
    for b in range(B):
        np.testing.assert_array_equal(got[b], ref[b], err_msg=str(b))

    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")
    monkeypatch.setattr(crit, "_factored_backoff", False)
    prep_f = crit.prepare([[0, 1], [2]])
    assert "factored_dst" in prep_f
    prep_g = _prepare_generic(crit, [[0, 1], [2]])
    vf = float(crit.loss(params, outputs, prep_f, lens))
    vg = float(crit.loss(params, outputs, prep_g, lens))
    assert abs(vf - vg) < 5e-4, (vf, vg)


def test_backoff_dst_viterbi_hlo_has_no_gathers():
    """Gathers lower to serial scalar loops on the target TPU stack; the
    factored decode must stay gather-free (one-hot contractions only)."""
    import re

    from gtn_applications_tpu.ops import factored as F

    ntok = 4
    g = _bigram_lm_graph(5, ntok, "optional", 0)
    crit = Transducer(
        [str(i) for i in range(ntok)], {str(i): i for i in range(ntok)},
        transitions=g, blank="optional",
    )
    mats = crit._decode_matrices_dst(
        np.zeros((crit.num_transition_arcs,), np.float32)
    )
    B, T, C = 2, 5, ntok + 1
    em = jnp.zeros((B, T, C), jnp.float32)
    lens = jnp.asarray([T, T], jnp.int32)
    txt = (
        jax.jit(lambda e: F.backoff_dst_viterbi(e, *mats, lens))
        .lower(em)
        .compile()
        .as_text()
    )
    assert not re.search(r"\bgather\(", txt)


@pytest.mark.parametrize("blank", ["optional", "none"])
def test_plain_factored_matches_sparse(monkeypatch, blank):
    """transitions=None dense-adjacency scorer (alignment_lattice_score)
    vs the sparse per-arc oracle: losses and emission grads must agree.
    Multi-grapheme tokens make the decomposition lattices nontrivial
    (the word-decomps protocol's structure)."""
    toks = ["a", "b", "c", "ab", "bc", "abc"]
    g2i = {c: i for i, c in enumerate("abc")}
    rng = np.random.default_rng(11)
    C = len(toks) + int(blank != "none")

    # allow_repeats=False (the word-decomps setting) requires an optional
    # blank; the blank="none" leg keeps repeats
    ar = blank == "none"
    fact = Transducer(toks, g2i, blank=blank, allow_repeats=ar)
    twin = Transducer(toks, g2i, blank=blank, allow_repeats=ar)
    monkeypatch.setattr(tmod, "_FACTORED_IMPL", "on")

    B, T = 4, 9
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1, 2], [1, 2, 0, 1], [2], [0, 1]]
    lens = jnp.asarray([T, T - 3, 4, 0], jnp.int32)
    prep_f = fact.prepare(targets)
    assert "factored" in prep_f and "factored_plain" in prep_f
    prep_g = _prepare_generic(twin, targets)
    assert "factored" not in prep_g

    vf, gf = jax.value_and_grad(
        lambda x: fact.loss({}, x, prep_f, lens)
    )(inputs)
    vg, gg = jax.value_and_grad(
        lambda x: twin.loss({}, x, prep_g, lens)
    )(inputs)
    assert abs(float(vf - vg)) < 5e-4, (float(vf), float(vg))
    assert float(jnp.max(jnp.abs(gf - gg))) < 5e-4

    # decode is prep-independent; parity across the two criteria
    outs_f = fact.viterbi(inputs, input_lengths=lens)
    outs_g = twin.viterbi(inputs, input_lengths=lens)
    for a, b in zip(outs_f, outs_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_factored_loss_on_data_mesh():
    """The factored ngram path (with its analytic custom VJP) jitted
    over an 8-device data mesh: batch + prepared tables sharded, loss
    and grads identical to the unsharded run.  Pins the custom_vjp's
    batching/partitioning behavior in CI (previously only the driver's
    dryrun exercised it)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    rng = np.random.default_rng(42)
    fact_crit, _, C = _pair(2, "optional", True)
    B, T = 8, 10
    inputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    targets = [[0, 1], [2], [1, 0], [2, 1], [0], [1], [2, 0], [1, 2]]
    prep = fact_crit.prepare(targets)
    assert "factored" in prep
    p0 = jnp.asarray(
        rng.normal(size=(fact_crit.num_transition_arcs,)) * 0.3,
        jnp.float32,
    )

    def loss(p, x, pr):
        return fact_crit.loss({"transitions": p}, x, pr)

    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(
        p0, inputs, prep)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    x_sh = jax.device_put(inputs, bsh)
    prep_sh = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, bsh if hasattr(a, "shape") and a.ndim >= 1
            and a.shape[0] == B else rep),
        prep,
    )
    v_sh, g_sh = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1))
    )(jax.device_put(p0, rep), x_sh, prep_sh)

    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sh[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sh[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-5)
