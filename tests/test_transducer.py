"""Transducer criterion tests, mirroring /root/reference/tests/transducer_test.py
golden values and equivalence checks."""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu import wfst
from gtn_applications_tpu.criterions import CTC
from gtn_applications_tpu.criterions.asg import create_transitions_graph
from gtn_applications_tpu.criterions.common import pad_targets
from gtn_applications_tpu.criterions.transducer import (
    Transducer,
    make_token_graph,
    make_transitions_graph,
)
from gtn_applications_tpu.ops import lattice
from gtn_applications_tpu.wfst import EPSILON, Graph


def test_fwd_trivial():
    T, N = 3, 2
    emissions = jnp.log(
        jnp.asarray([1.0, 0.0, 0.0, 1.0, 1.0, 0.0]).reshape(1, T, N) + 1e-35
    )
    crit = Transducer(tokens=["a", "b"], graphemes_to_idx={"a": 0, "b": 1})
    assert abs(float(crit(emissions, [[0, 1, 0]]))) < 1e-4

    crit = Transducer(tokens=["a"], graphemes_to_idx={"a": 0}, blank="optional")
    assert abs(float(crit(emissions, [[0, 0]]))) < 1e-4

    crit = Transducer(
        tokens=["a"], graphemes_to_idx={"a": 0}, blank="optional",
        allow_repeats=False,
    )
    assert abs(float(crit(emissions, [[0, 0]]))) < 1e-4


def test_fwd():
    T, N = 3, 4
    log_probs = jax.nn.log_softmax(jnp.zeros((1, T, N)), 2)
    crit = Transducer(
        tokens=["a", "b", "c"],
        graphemes_to_idx={"a": 0, "b": 1, "c": 2},
        blank="optional",
    )
    fwd = crit(log_probs, [[1, 2]])
    assert abs(float(fwd) + math.log(0.25 * 0.25 * 0.25 * 5)) < 1e-4


EM1 = np.array(
    [
        0.633766, 0.221185, 0.0917319, 0.0129757, 0.0142857, 0.0260553,
        0.111121, 0.588392, 0.278779, 0.0055756, 0.00569609, 0.010436,
        0.0357786, 0.633813, 0.321418, 0.00249248, 0.00272882, 0.0037688,
        0.0663296, 0.643849, 0.280111, 0.00283995, 0.0035545, 0.00331533,
        0.458235, 0.396634, 0.123377, 0.00648837, 0.00903441, 0.00623107,
    ],
    dtype=np.float32,
).reshape(1, 5, 6)


def test_transducer_as_ctc_golden():
    crit = Transducer(
        tokens=["a", "b", "c", "d", "e"],
        graphemes_to_idx={"a": 0, "b": 1, "c": 2, "d": 3, "e": 4},
        blank="optional",
    )
    prepared = crit.prepare([[0, 1, 2, 1, 0]])

    def loss_fn(logits):
        # row-stochastic table: log_softmax(log p) == log p
        return crit.loss({}, jax.nn.log_softmax(jnp.log(logits), 2), prepared)

    loss, grad = jax.value_and_grad(loss_fn)(jnp.asarray(EM1))
    assert abs(float(loss) - 3.34211) < 1e-4


def test_transducer_no_repeats_golden():
    em = np.array(
        [
            0.30176, 0.28562, 0.0831517, 0.0862751, 0.0816851, 0.161508,
            0.24082, 0.397533, 0.0557226, 0.0546814, 0.0557528, 0.19549,
            0.230246, 0.450868, 0.0389607, 0.038309, 0.0391602, 0.202456,
            0.280884, 0.429522, 0.0326593, 0.0339046, 0.0326856, 0.190345,
            0.423286, 0.315517, 0.0338439, 0.0393744, 0.0339315, 0.154046,
        ],
        dtype=np.float32,
    ).reshape(1, 5, 6)
    crit = Transducer(
        tokens=["a", "b", "c", "d", "e"],
        graphemes_to_idx={"a": 0, "b": 1, "c": 2, "d": 3, "e": 4},
        blank="optional",
        allow_repeats=False,
    )
    loss = crit(jnp.log(jnp.asarray(em)), [[0, 1, 1, 0]])
    assert abs(float(loss) - 5.42262) < 1e-4


def test_ctc_compare():
    """Transducer(blank=optional, no repeats) == CTC on random data
    (reference transducer_test.py:275-316)."""
    rng = np.random.RandomState(0)
    T, N, B = 20, 15, 5
    tgt = [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        [1, 1],
        [0, 2, 3],
        [0, 0, 0, 0, 0],
        [0, 4, 8, 12],
    ]
    tokens = [(t,) for t in range(N - 1)]
    graphemes_to_idx = {t: t for t in range(N - 1)}
    inputs = jnp.asarray(rng.randn(B, T, N).astype(np.float32))

    ctc = CTC(blank=N - 1)
    for reduction in ["none", "mean"]:
        crit = Transducer(
            tokens=tokens,
            graphemes_to_idx=graphemes_to_idx,
            blank="optional",
            allow_repeats=False,
            reduction=reduction,
        )
        tg, ln = pad_targets(tgt)

        def ctc_fn(x):
            lp = jax.nn.log_softmax(x, 2)
            return lattice.ctc_loss(lp, tg, ln, N - 1, reduction)

        def tr_fn(x):
            return crit.loss({}, x, crit.prepare(tgt))

        l1, g1 = jax.value_and_grad(ctc_fn)(inputs)
        l2, g2 = jax.value_and_grad(tr_fn)(inputs)
        assert abs(float(l1) - float(l2)) < 1e-3, reduction
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)


def test_simple_decomposition():
    """Marginalization over wordpiece decompositions equals a hand-built
    alignment lattice (reference transducer_test.py:218-273)."""
    rng = np.random.RandomState(1)
    T = 5
    tokens = ["a", "b", "ab", "ba", "aba"]
    scores = jnp.asarray(rng.randn(1, T, len(tokens)).astype(np.float32))
    labels = [[0, 1, 0]]
    crit = Transducer(tokens=tokens, graphemes_to_idx={"a": 0, "b": 1})

    # Hand-built alignment graph with all decompositions of "aba"
    alignments = Graph()
    alignments.add_node(True)
    alignments.add_node()
    alignments.add_arc(0, 1, 0)
    alignments.add_arc(1, 1, 0)
    alignments.add_node()
    alignments.add_arc(1, 2, 1)
    alignments.add_arc(2, 2, 1)
    alignments.add_node(False, True)
    alignments.add_arc(2, 3, 0)
    alignments.add_arc(3, 3, 0)
    alignments.add_node(False, True)
    alignments.add_arc(1, 4, 3)
    alignments.add_arc(4, 4, 3)
    alignments.add_node()
    alignments.add_arc(0, 5, 2)
    alignments.add_arc(5, 5, 2)
    alignments.add_arc(5, 3, 0)
    alignments.add_node(False, True)
    alignments.add_arc(0, 6, 4)
    alignments.add_arc(6, 6, 4)

    em = wfst.linear_graph(T, len(tokens))
    em.set_weights(np.asarray(scores).reshape(-1))
    expected = wfst.forward_score(em) - wfst.forward_score(
        wfst.intersect(em, alignments)
    )

    def loss_fn(s):
        return crit.loss({}, s, crit.prepare(labels))

    loss, grad = jax.value_and_grad(loss_fn)(scores)
    # crit loss = -forward(em ∘ align) with log_softmax applied (transitions
    # None). expected uses raw scores: compare -forward(em∘align) parts by
    # normalizing manually.
    lsm = jax.nn.log_softmax(scores, 2)
    em2 = wfst.linear_graph(T, len(tokens))
    em2.set_weights(np.asarray(lsm).reshape(-1))
    expected_loss = -wfst.forward_score(wfst.intersect(em2, alignments))
    assert abs(float(loss) - expected_loss) < 1e-4


def test_viterbi():
    em1 = np.array(
        [0, 4, 0, 1, 0, 2, 1, 1, 0, 0, 0, 2, 0, 0, 0, 2, 8, 0, 0, 2],
        dtype=np.float32,
    ).reshape(5, 4)
    em2 = np.array(
        [0, 2, 1, 7, 0, 2, 9, 1, 0, 0, 0, 2, 0, 0, 5, 2, 1, 0, 0, 2],
        dtype=np.float32,
    ).reshape(5, 4)
    emissions = jnp.asarray(np.stack([em1, em2]))

    crit = Transducer(
        tokens=["a", "b", "c", "d"],
        graphemes_to_idx={"a": 0, "b": 1, "c": 2, "d": 3},
        blank="none",
    )
    preds = crit.viterbi(emissions)
    assert [p.tolist() for p in preds] == [[1, 3, 0], [3, 2, 3, 2, 3]]

    crit = Transducer(
        tokens=["a", "b", "c"],
        graphemes_to_idx={"a": 0, "b": 1, "c": 2},
        blank="optional",
        allow_repeats=False,
    )
    preds = crit.viterbi(emissions)
    assert [p.tolist() for p in preds] == [[1, 0], [2, 2]]


def test_transitions_graphs_isomorphic():
    """make_transitions_graph structure (transducer_test.py:367-418)."""
    num_tokens = 4
    transitions = make_transitions_graph(1, num_tokens)
    expected = Graph()
    expected.add_node(True, True)
    for i in range(num_tokens):
        expected.add_arc(0, 0, i)
    assert wfst.isomorphic(transitions, expected)

    transitions = make_transitions_graph(2, num_tokens)
    expected = Graph()
    expected.add_node(True, False)
    for i in range(num_tokens):
        expected.add_node(False, False)
        expected.add_arc(0, i + 1, i)
    for i in range(num_tokens):
        for j in range(num_tokens):
            expected.add_arc(i + 1, j + 1, j)
    expected.add_node(False, True)
    for i in range(num_tokens + 1):
        expected.add_arc(i, num_tokens + 1, EPSILON)
    assert wfst.isomorphic(transitions, expected)


def test_transducer_asg_golden():
    """Transducer with dense ASG transitions reproduces the ASG goldens
    (transducer_test.py:420-508)."""
    import tests.test_asg as ta

    T, N, B = 5, 6, 3
    emissions = jnp.asarray(ta.EMISSIONS)
    labels = ta.LABELS
    tokens = [(n,) for n in range(N)]
    graphemes_to_idx = {n: n for n in range(N)}
    asg_graph = create_transitions_graph(np.zeros((N + 1, N)))
    crit = Transducer(
        tokens=tokens, graphemes_to_idx=graphemes_to_idx, transitions=asg_graph
    )
    prepared = crit.prepare(labels)
    params = crit.init_params()

    def loss_fn(p, em):
        return crit.loss(p, em, prepared)

    (loss, (g_p, g_em)) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        params, emissions
    )
    assert abs(float(loss) - 7.47995) < 1e-4

    expected_trans_grad = (
        np.array(
            [
                [0.3990, 0.3396, 0.3486, 0.3922, 0.3504, 0.3155],
                [0.3666, 0.0116, -1.6678, 0.3737, 0.3361, -0.7152],
                [0.3468, 0.3163, -1.1583, -0.6803, 0.3216, 0.2722],
                [0.3694, -0.6688, 0.3047, -0.8531, -0.6571, 0.2870],
                [0.3866, 0.3321, 0.3447, 0.3664, -0.2163, 0.3039],
                [0.3640, -0.6943, 0.2988, -0.6722, 0.3215, -0.1860],
            ],
            dtype=np.float32,
        )
        / B
    )
    trans_grad = np.asarray(g_p["transitions"])[N:].reshape(N, N)
    np.testing.assert_allclose(trans_grad, expected_trans_grad, rtol=1e-2, atol=1e-4)


def test_transducer_asg_viterbi():
    T, N = 4, 3
    inputs = jnp.asarray(
        np.array([0, 0, 7, 5, 4, 3, 5, 8, 5, 5, 4, 3], dtype=np.float32).reshape(
            1, T, N
        )
    )
    transitions = np.array(
        [0, 0, 0, 0, 2, 0, 0, 0, 2, 2, 0, 0], dtype=np.float32
    )
    tokens = [(n,) for n in range(N)]
    graphemes_to_idx = {n: n for n in range(N)}
    asg_graph = create_transitions_graph(np.zeros((N + 1, N)))
    crit = Transducer(
        tokens=tokens, graphemes_to_idx=graphemes_to_idx, transitions=asg_graph
    )
    path = crit.viterbi(inputs, {"transitions": jnp.asarray(transitions)})[0]
    assert path.tolist() == [2, 1, 0]


@pytest.mark.slow  # numeric grad over every arc
def test_backoff_transitions_numeric_grad():
    """Analytic vs numerical gradient of backoff transition weights
    (transducer_test.py:534-566), on a framework-built pruned bigram graph
    with epsilon backoff arcs."""
    # Build a small backoff bigram transition graph over 5 tokens + blank
    # (labels 0..5): a unigram state with arcs for every label into per-label
    # bigram states, epsilon backoff arcs from bigram states back to the
    # unigram state, and a few direct bigram arcs.
    N = 5  # tokens; blank index = 5, emission channels = 6
    C = N + 1
    g = Graph()
    uni = g.add_node(True, True)
    for lbl in range(C):
        g.add_node(False, True)  # bigram state for lbl -> node lbl+1
    for lbl in range(C):
        g.add_arc(uni, lbl + 1, lbl)
        g.add_arc(lbl + 1, uni, EPSILON)  # backoff
    # a few direct bigram arcs
    g.add_arc(1, 2, 1)
    g.add_arc(2, 1, 0)
    g.add_arc(1, 6, 5)
    g.add_arc(6, 2, 1)

    T = 4
    rng = np.random.RandomState(7)
    inputs = jnp.asarray(rng.randn(1, T, C).astype(np.float32))
    labels = [[0, 1, 0]]
    tokens = [(n,) for n in range(N)]
    graphemes_to_idx = {n: n for n in range(N)}
    crit = Transducer(
        tokens=tokens,
        graphemes_to_idx=graphemes_to_idx,
        blank="optional",
        allow_repeats=False,
        transitions=g,
    )
    prepared = crit.prepare(labels)
    params = crit.init_params()

    def loss_fn(p):
        return crit.loss(p, inputs, prepared)

    analytic = np.asarray(jax.grad(loss_fn)(params)["transitions"])
    eps = 1e-3
    numeric = np.zeros_like(analytic)
    base = np.asarray(params["transitions"]).copy()
    for i in range(len(base)):
        up = base.copy()
        up[i] += eps
        down = base.copy()
        down[i] -= eps
        lu = float(loss_fn({"transitions": jnp.asarray(up)}))
        ld = float(loss_fn({"transitions": jnp.asarray(down)}))
        numeric[i] = (lu - ld) / (2 * eps)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-2, atol=1e-3)


@pytest.mark.slow  # numeric grad over every arc
def test_backoff_fixture_numeric_grad():
    """The reference's exact backoff-transitions regression
    (transducer_test.py:534-566 with tests/trans_backoff_test.txt): load
    the same fixture graph, same shapes/labels, and check analytic vs
    numerical transition grads."""
    import os

    fixture = os.path.join(
        os.path.dirname(__file__), "goldens", "trans_backoff_test.txt"
    )
    transitions = wfst.loadtxt(fixture)
    T, N = 4, 5
    rng = np.random.RandomState(13)
    inputs = jnp.asarray(rng.randn(1, T, N).astype(np.float32))
    labels = [[0, 1, 0]]
    crit = Transducer(
        tokens=[(n,) for n in range(N)],
        graphemes_to_idx={n: n for n in range(N)},
        blank="optional",
        allow_repeats=False,
        transitions=transitions,
    )
    prepared = crit.prepare(labels)
    params = crit.init_params()

    def loss_fn(p):
        return crit.loss(p, inputs, prepared)

    analytic = np.asarray(jax.grad(loss_fn)(params)["transitions"])
    eps = 1e-3
    base = jnp.asarray(params["transitions"])
    A = base.shape[0]
    # central differences for every arc in two vmapped evals (the loss is
    # pure and jittable, so the whole sweep is one compile)
    probes = jnp.eye(A, dtype=base.dtype) * eps
    batched = jax.jit(
        jax.vmap(lambda p: loss_fn({"transitions": p}))
    )
    lu = batched(base[None, :] + probes)
    ld = batched(base[None, :] - probes)
    numeric = np.asarray((lu - ld) / (2 * eps))
    np.testing.assert_allclose(analytic, numeric, rtol=1e-2, atol=1e-3)


def test_forced_blank_decode_batch():
    """blank='forced' decode runs the general graph transduction per
    sample (threaded); outputs must drop blanks and collapse runs exactly
    like the single-sample path."""
    crit = Transducer(
        tokens=["a", "b"], graphemes_to_idx={"a": 0, "b": 1}, blank="forced"
    )
    # emissions force alignments: tokens 0/1 + blank (last index)
    B, T, C = 4, 6, 3
    rng = np.random.RandomState(2)
    outputs = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 3)
    batch = crit.viterbi(outputs)
    assert len(batch) == B
    for b in range(B):
        single = crit.viterbi(outputs[b : b + 1])[0]
        np.testing.assert_array_equal(batch[b], single)


def test_decode_template_matches_full_rebuild():
    """The weight-independent DecodeTemplate must reproduce the full
    set_weights -> tropical epsilon-removal -> compile pipeline for any
    weight assignment: same best-path labels and same best-path scores on
    random emissions over a backoff graph with learnable epsilon arcs."""
    from gtn_applications_tpu.ops import sparse
    from gtn_applications_tpu.wfst import compile as wcompile

    N = 4
    C = N + 1
    g = Graph()
    uni = g.add_node(True, True)
    for lbl in range(C):
        g.add_node(False, True)
    for lbl in range(C):
        g.add_arc(uni, lbl + 1, lbl)
        g.add_arc(lbl + 1, uni, EPSILON)
    g.add_arc(1, 2, 1)
    g.add_arc(2, 1, 0)
    g.add_arc(1, 5, 4)

    tmpl = wcompile.build_decode_template(g)
    rng = np.random.RandomState(5)
    em = jnp.asarray(rng.randn(3, 6, C).astype(np.float32))
    for trial in range(4):
        w = rng.randn(g.num_arcs()).astype(np.float32)
        fresh = g.copy()
        fresh.set_weights(w.tolist())
        old = wcompile.to_arc_table(
            wcompile.compile_acceptor(
                fresh, semiring="tropical", remove_eps=True
            )
        )
        new = wcompile.apply_decode_weights(tmpl, w)
        lab_old, sc_old = sparse.viterbi_batch(em, old)
        lab_new, sc_new = sparse.viterbi_batch(em, new)
        np.testing.assert_allclose(
            np.asarray(sc_old), np.asarray(sc_new), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(lab_old), np.asarray(lab_new))


def test_decode_template_no_rebuild_in_train_loop():
    """After the first dispatch, fresh parameter pytrees must not trigger
    host epsilon removal again (the template re-weights instead)."""
    from gtn_applications_tpu.wfst import compile as wcompile

    N = 3
    tokens = [(n,) for n in range(N)]
    crit = Transducer(
        tokens=tokens, graphemes_to_idx={n: n for n in range(N)},
        ngram=2, blank="optional",
    )
    rng = np.random.RandomState(0)
    out = jnp.asarray(rng.randn(2, 5, N + 1).astype(np.float32))
    p1 = {"transitions": jnp.asarray(rng.randn(crit.num_transition_arcs))}
    crit.viterbi(out, p1)
    calls = []
    orig = wcompile.build_decode_template
    wcompile.build_decode_template = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        p2 = {"transitions": jnp.asarray(rng.randn(crit.num_transition_arcs))}
        crit.viterbi(out, p2)
    finally:
        wcompile.build_decode_template = orig
    assert calls == []  # template cached; only O(nnz) re-weighting ran
