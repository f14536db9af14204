"""Differential tests: native (C++) graph compiler vs the Python oracle."""

import math

import numpy as np
import pytest

from gtn_applications_tpu import wfst
from gtn_applications_tpu.wfst import EPSILON, Graph, native
from gtn_applications_tpu.wfst import ops as wops

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _random_transducer(rng, S=8, A=20, C=4, eps_frac=0.25):
    g = Graph()
    for i in range(S):
        g.add_node(i == 0, i >= S - 2)
    for _ in range(A):
        s = rng.randint(0, S - 1)
        d = rng.randint(s, S)  # forward arcs: eps stays acyclic
        if rng.rand() < eps_frac and d > s:
            g.add_arc(s, d, EPSILON, EPSILON, float(rng.randn() * 0.5))
        else:
            il = rng.randint(0, C)
            ol = rng.randint(0, C) if rng.rand() < 0.5 else il
            g.add_arc(s, min(d, S - 1), il, ol, float(rng.randn() * 0.5))
    for i in range(S):
        lbl = rng.randint(0, C)
        g.add_arc(i, i, lbl, lbl, float(rng.randn() * 0.5))
    return g


def _graphs_equivalent(a, b):
    """State discovery order (and hence node ids) may differ between the
    implementations; compare order-invariant structure plus behavior."""
    assert a.num_nodes() == b.num_nodes()
    assert a.num_arcs() == b.num_arcs()
    assert a.num_start() == b.num_start()
    assert len(a.finals) == len(b.finals)
    fa = sorted(w for ws in a.finals.values() for w in ws)
    fb = sorted(w for ws in b.finals.values() for w in ws)
    np.testing.assert_allclose(fa, fb, rtol=1e-5, atol=1e-6)
    assert sorted(a.arc_ilabel) == sorted(b.arc_ilabel)
    assert sorted(a.arc_olabel) == sorted(b.arc_olabel)
    np.testing.assert_allclose(
        sorted(a.arc_weight), sorted(b.arc_weight), rtol=1e-5, atol=1e-6
    )
    # behavioral probe: identical forward scores against short label chains
    for seq in ([0], [0, 1], [1, 0, 1]):
        chain = wfst.linear_graph(seq)
        sa = wops.forward_score_py(wops.compose_py(wops.project_input(a), chain))
        sb = wops.forward_score_py(wops.compose_py(wops.project_input(b), chain))
        dead = sa < -1e29 and sb < -1e29
        assert dead or abs(sa - sb) < 1e-3, seq


def test_compose_differential():
    rng = np.random.RandomState(0)
    for trial in range(10):
        g1 = _random_transducer(rng)
        g2 = _random_transducer(rng)
        py = wops.compose_py(g1, g2)
        cc = native.compose(g1, g2)
        _graphs_equivalent(py, cc)


def test_compose_prov_differential():
    rng = np.random.RandomState(1)
    for trial in range(5):
        g1 = _random_transducer(rng, eps_frac=0.3)
        g2 = _random_transducer(rng, eps_frac=0.0)
        py, prov_py = wops.compose_py(g1, g2, return_arc_map=True)
        cc, prov_cc = native.compose(g1, g2, return_arc_map=True)
        assert len(prov_py) == len(prov_cc)
        # provenance pairs agree as multisets of (arcs' labels/weights)
        def sig(g, prov, src_graphs):
            out = []
            for (a1, a2) in prov:
                s1 = (
                    (src_graphs[0].arc_ilabel[a1], src_graphs[0].arc_weight[a1])
                    if a1 >= 0
                    else None
                )
                s2 = (
                    (src_graphs[1].arc_ilabel[a2], src_graphs[1].arc_weight[a2])
                    if a2 >= 0
                    else None
                )
                out.append((s1, s2))
            return sorted(map(repr, out))

        assert sig(py, prov_py, (g1, g2)) == sig(cc, prov_cc, (g1, g2))


def test_remove_differential():
    rng = np.random.RandomState(2)
    for trial in range(10):
        g = _random_transducer(rng, eps_frac=0.35)
        py = wops.remove_py(g)
        cc = native.remove(g)
        _graphs_equivalent(py, cc)
        # behavioral check: forward scores match when DAG-compatible
        # (intersect with a short chain to force acyclicity)
        chain = wfst.linear_graph([0, 1, 0])
        i_py = wops.compose_py(wops.project_input(py), chain)
        i_cc = wops.compose_py(wops.project_input(cc), chain)
        s_py = wops.forward_score_py(i_py)
        s_cc = wops.forward_score_py(i_cc)
        assert abs(s_py - s_cc) < 1e-3 or (s_py < -1e29 and s_cc < -1e29)


def test_scores_differential():
    rng = np.random.RandomState(3)
    for trial in range(10):
        # acyclic graph for host scoring
        g = Graph()
        S = 7
        for i in range(S):
            g.add_node(i == 0, i == S - 1)
        for _ in range(15):
            s = rng.randint(0, S - 1)
            d = rng.randint(s + 1, S)
            lbl = rng.randint(0, 3)
            g.add_arc(s, d, lbl, lbl, float(rng.randn()))
        assert abs(wops.forward_score_py(g) - native.forward_score(g)) < 1e-4
        assert abs(wops.viterbi_score_py(g) - native.viterbi_score(g)) < 1e-4


def test_transducer_uses_native(monkeypatch):
    """End-to-end: the Transducer criterion produces identical losses with
    the native and Python graph pipelines."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer

    rng = np.random.RandomState(4)
    tokens = ["a", "b", "ab", "ba"]
    g2i = {"a": 0, "b": 1}
    x = jnp.asarray(rng.randn(2, 8, 5).astype(np.float32))
    tgts = [[0, 1], [1, 0, 0]]

    crit = Transducer(tokens=tokens, graphemes_to_idx=g2i, blank="optional")
    loss_native = float(crit.loss({}, x, crit.prepare(tgts)))

    monkeypatch.setenv("TW_NATIVE", "0")
    native._LIB = None
    try:
        crit2 = Transducer(tokens=tokens, graphemes_to_idx=g2i, blank="optional")
        loss_py = float(crit2.loss({}, x, crit2.prepare(tgts)))
    finally:
        monkeypatch.setenv("TW_NATIVE", "1")
        native._LIB = None
    assert abs(loss_native - loss_py) < 1e-5


def test_wordpiece_native_matches_python():
    from gtn_applications_tpu.scripts.wordpiece import UnigramModel

    rng = np.random.RandomState(7)
    alphabet = "abcdef▁"
    pieces = set(alphabet)
    while len(pieces) < 60:
        pieces.add(
            "".join(rng.choice(list(alphabet), rng.randint(2, 5)))
        )
    lps = {p: float(-rng.rand() * 8 - 1) for p in pieces}

    m_native = UnigramModel(dict(lps))
    m_py = UnigramModel(dict(lps))
    m_py._native = False  # force the Python DP

    texts = [
        "abc▁def", "aaaa", "fedcba", "ab▁cd▁ef", "x▁abc",  # x is unk
        "", "a",
    ]
    for t in texts:
        assert m_native.encode(t) == m_py.encode(t), t


def test_wordpiece_estep_matches_python():
    from gtn_applications_tpu.scripts import wordpiece as wp

    rng = np.random.RandomState(8)
    alphabet = "abcd▁"
    pieces = set(alphabet) | {"ab", "cd", "▁a", "bcd"}
    lps = {p: float(-rng.rand() * 4 - 0.5) for p in pieces}
    sentences = ["▁abcd", "▁ab▁cd", "▁dcba", "▁abcdabcd"]

    m_native = wp.UnigramModel(dict(lps))
    counts_n, ll_n = wp._e_step(sentences, m_native)

    m_py = wp.UnigramModel(dict(lps))
    m_py._native = False
    counts_p, ll_p = wp._e_step(sentences, m_py)

    assert abs(ll_n - ll_p) < 1e-3
    for p in set(counts_n) | set(counts_p):
        assert abs(counts_n.get(p, 0.0) - counts_p.get(p, 0.0)) < 1e-3, p


def test_asg_collapse_matches_python():
    """Native batched decode cleanup == the Python per-sample path."""
    from gtn_applications_tpu.criterions.asg import ASG

    rng = np.random.RandomState(5)
    for num_replabels, use_garbage in [(0, False), (1, True), (2, True)]:
        N = 5
        crit = ASG(N, num_replabels, use_garbage)
        C = N + num_replabels + int(use_garbage)
        paths = rng.randint(0, C, (4, 30)).astype(np.int32)
        lengths = np.asarray([30, 17, 1, 0], np.int32)
        want = crit._cleanup(paths, lengths)
        got = native.asg_collapse(
            paths, lengths, crit.garbage_idx, num_replabels
        )
        assert got is not None
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, np.asarray(w, np.int32))
        # no lengths -> full T
        want = crit._cleanup(paths, None)
        got = native.asg_collapse(paths, None, crit.garbage_idx, num_replabels)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, np.asarray(w, np.int32))


def test_forced_collapse_matches_graph_oracle():
    """Native batched forced-blank decode cleanup == the per-sample graph
    transduction (chain ∘ forced token graph → viterbi → project)."""
    from gtn_applications_tpu.criterions.transducer import Transducer

    tok = ["a", "b", "c"]
    g2i = {c: i for i, c in enumerate("abc")}
    crit = Transducer(tok, g2i, blank="forced")
    blank = len(tok)

    rng = np.random.RandomState(11)
    for trial in range(20):
        B, T = 8, 19
        paths = rng.randint(0, blank + 1, (B, T)).astype(np.int32)
        lengths = rng.randint(0, T + 1, B).astype(np.int32)
        for b in range(B):
            paths[b, lengths[b] :] = -1  # dead frames
        got = native.forced_collapse(paths, blank, lengths)
        assert got is not None
        for b in range(B):
            seq = [int(l) for l in paths[b, : lengths[b]] if l >= 0]
            want = crit._alignment_to_tokens(seq)
            np.testing.assert_array_equal(got[b], np.asarray(want, np.int32))
    # hand-picked feasibility edges: empty, token-first, token-last,
    # adjacent token runs, blank-only, repeated token via blank gap
    cases = np.full((6, 9), -1, np.int32)
    seqs = [[], [0, 3], [3, 0], [3, 0, 1, 3], [3, 3], [3, 0, 3, 0, 3]]
    lens = np.asarray([len(s) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        cases[i, : len(s)] = s
    got = native.forced_collapse(cases, blank, lens)
    expect = [[], [], [], [], [], [0, 0]]
    for g, w in zip(got, expect):
        np.testing.assert_array_equal(g, np.asarray(w, np.int32))


def test_ctc_engine_matches_lattice():
    """Graph-engine CTC (C++ compose + log-semiring autodiff, the honest
    bench.py denominator) == the JAX lattice path, losses and grads."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.common import pad_targets
    from gtn_applications_tpu.ops import lattice

    rng = np.random.RandomState(0)
    B, T, C = 5, 14, 7
    x = rng.randn(B, T, C).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(x), 2))
    targets = [
        rng.randint(0, C - 1, size=rng.randint(1, 7)).tolist()
        for _ in range(B - 1)
    ]
    targets.append([2, 2, 3, 3])  # repeats exercise the no-skip rule
    losses, grad = native.ctc_engine_batch(lp, targets, blank=C - 1)

    tg, ln = pad_targets(targets)
    want = -np.asarray(lattice.ctc_forward_score(jnp.asarray(lp), tg, ln, C - 1))
    np.testing.assert_allclose(losses, want, rtol=1e-5, atol=1e-5)
    gwant = np.asarray(
        jax.jacrev(
            lambda y: -jnp.sum(lattice.ctc_forward_score(y, tg, ln, C - 1))
        )(jnp.asarray(lp))
    )
    np.testing.assert_allclose(grad, gwant, rtol=1e-4, atol=1e-5)


def test_ctc_engine_golden():
    """Reference golden table (gtn_ctc_test 5x6): loss 3.34211."""
    golden = np.log(np.array([
        [0.633766, 0.221185, 0.0917319, 0.0129757, 0.0142857, 0.0260553],
        [0.111121, 0.588392, 0.278779, 0.0055756, 0.00569609, 0.010436],
        [0.0357786, 0.633813, 0.321418, 0.00249248, 0.00272882, 0.0037688],
        [0.0663296, 0.643849, 0.280111, 0.00283995, 0.0035545, 0.00331533],
        [0.458235, 0.396634, 0.123377, 0.00648837, 0.00903441, 0.00623107],
    ], dtype=np.float32))[None]
    losses, grad = native.ctc_engine_batch(golden, [[0, 1, 2, 1, 0]], blank=5)
    assert abs(losses[0] - 3.34211) < 1e-4
    # grad of -logZ wrt log-probs sums to -T over the posterior rows
    assert abs(grad.sum() + golden.shape[1]) < 1e-3


def test_ctc_engine_impossible_target():
    """A target longer than T has no accepting path -> ValueError."""
    lp = np.zeros((1, 3, 4), dtype=np.float32)
    with pytest.raises(ValueError):
        native.ctc_engine_batch(lp, [[0, 1, 0, 1, 0]], blank=3)


def test_asg_engine_matches_lattice():
    """Graph-engine ASG (C++ compose + autodiff) == JAX lattice: losses,
    emission grads, and transition grads."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.common import pad_targets
    from gtn_applications_tpu.ops import lattice

    rng = np.random.RandomState(1)
    B, T, C = 4, 12, 6
    lp = rng.randn(B, T, C).astype(np.float32)
    trans = (rng.randn(C + 1, C) * 0.3).astype(np.float32)
    targets = [
        rng.randint(0, C, size=rng.randint(1, 6)).tolist() for _ in range(B)
    ]
    losses, gem, gtr = native.asg_engine_batch(lp, targets, trans)

    tg, ln = pad_targets(targets)

    def per_sample(lp, trans):
        fcc = lattice.asg_fcc_score(lp, trans)
        fal = lattice.asg_fal_score(lp, trans, tg, ln)
        return fcc - fal

    want = np.asarray(per_sample(jnp.asarray(lp), jnp.asarray(trans)))
    np.testing.assert_allclose(losses, want, rtol=1e-5, atol=1e-5)
    g = jax.grad(
        lambda x, t: jnp.sum(per_sample(x, t)), argnums=(0, 1)
    )(jnp.asarray(lp), jnp.asarray(trans))
    np.testing.assert_allclose(gem, np.asarray(g[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gtr, np.asarray(g[1]), rtol=1e-4, atol=1e-5)


def test_asg_engine_golden():
    """Reference ASG golden (gtn_asg_test): batch-mean loss 7.47995."""
    from tests.test_asg import EMISSIONS, LABELS

    N = 6
    losses, _, _ = native.asg_engine_batch(
        EMISSIONS, LABELS, np.zeros((N + 1, N), np.float32)
    )
    assert abs(losses.mean() - 7.47995) < 1e-4


def test_transducer_engine_matches_criterion():
    """Graph-engine transducer (alignment-graph compose + autodiff) == the
    criterion's sparse-scan path, losses and grads (chained through the
    criterion's internal log_softmax), incl. marginalized decompositions."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer

    rng = np.random.RandomState(0)

    def check(crit, C, targets, B, T):
        x = rng.randn(B, T, C).astype(np.float32)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(x), 2))
        losses, grad = native.transducer_engine_batch(
            lp, crit.lexicon, crit.tokens, targets
        )
        prep = crit.prepare(targets)
        want = float(crit.loss({}, jnp.asarray(lp), prep))
        np.testing.assert_allclose(losses.mean(), want, rtol=1e-5)
        gx = np.asarray(
            jax.grad(lambda y: crit.loss({}, y, prep) * B)(jnp.asarray(x))
        )
        sm = np.exp(lp)
        chained = grad - sm * grad.sum(-1, keepdims=True)
        np.testing.assert_allclose(chained, gx, rtol=1e-4, atol=1e-5)

    # ngram-0 CTC-style: singleton tokens, optional blank
    C0 = 7
    crit = Transducer(
        [(i,) for i in range(C0)], {i: i for i in range(C0)},
        blank="optional", allow_repeats=False, reduction="none",
    )
    targets = [rng.randint(0, C0, size=rng.randint(1, 5)).tolist() for _ in range(3)]
    check(crit, C0 + 1, targets, 3, 10)

    # marginalized decompositions: multi-grapheme pieces
    crit2 = Transducer(
        ["a", "b", "ab", "ba"], {"a": 0, "b": 1},
        blank="optional", allow_repeats=False, reduction="none",
    )
    check(crit2, 5, [[0, 1, 0], [1, 1]], 2, 8)


def test_transducer_ngram_engine_matches_criterion():
    """The ngram graph-engine denominator (normalizer + aligned
    compositions with transition-weight autodiff) reproduces the factored
    criterion's loss and BOTH gradients."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer

    N, T, L, B = 8, 20, 5, 3
    rng = np.random.RandomState(0)
    crit = Transducer(
        [(i,) for i in range(N)], {i: i for i in range(N)},
        ngram=2, reduction="none",
    )
    x = rng.randn(B, T, N).astype(np.float32)
    targets = [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    prep = crit.prepare(targets)
    params = crit.init_params()
    loss, grads = jax.value_and_grad(
        lambda p, x: crit.loss(p, x, prep), argnums=(0, 1)
    )(params, jnp.asarray(x))
    losses, g_em, g_tr = native.transducer_ngram_engine_batch(
        x, crit.lexicon, crit.tokens, crit.transitions, targets
    )
    np.testing.assert_allclose(losses.mean(), float(loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads[1]), g_em / B, rtol=1e-4, atol=1e-5
    )
    # transition grads: compare as sorted multisets (the criterion's
    # parameter layout and the host graph's arc order differ)
    tp = np.sort(np.asarray(jax.tree_util.tree_leaves(grads[0])[0]).ravel())
    np.testing.assert_allclose(tp, np.sort(g_tr / B), rtol=1e-4, atol=1e-5)


def test_acceptor_engine_matches_stc():
    """The generic acceptor engine over per-sample star graphs reproduces
    the STC criterion's loss and emission gradient."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions import STC
    from gtn_applications_tpu.criterions.stc import (
        _STAR_SENTINEL, STC_BLANK_IDX, make_stc_graph,
    )

    Ns, Ts, Ls, Bs = 10, 30, 6, 3
    rng = np.random.RandomState(0)
    crit = STC(0, p0=1.0, plast=0.1, thalf=100, reduction="none",
               shift_targets=1)
    xs = rng.randn(Bs, Ts, Ns + 1).astype(np.float32)
    raw = [rng.randint(0, Ns, size=Ls).tolist() for _ in range(Bs)]
    prep = crit.prepare(raw)
    loss, g_ours = jax.value_and_grad(
        lambda x: crit.loss({}, x, prep)
    )(jnp.asarray(xs))

    lsm = jax.nn.log_softmax(jnp.asarray(xs), 2)
    em = np.asarray(crit.star_channels(lsm, prep["select"]))
    log_pen = float(prep["log_penalty"])
    targets = [[t + 1 for t in tgt] for tgt in raw]
    select = [STC_BLANK_IDX] + sorted(set(t for tgt in targets for t in tgt))
    tmap = {t: i for i, t in enumerate(select)}
    Csel = ((len(select) + 7) // 8) * 8
    graphs = []
    for tgt in targets:
        g = make_stc_graph([tmap[t] for t in tgt], Csel)
        g.arc_weight = [
            log_pen if w == _STAR_SENTINEL else w for w in g.arc_weight
        ]
        graphs.append(g)
    losses, grad_em = native.acceptor_engine_batch(em, graphs)
    np.testing.assert_allclose(losses.mean(), float(loss), rtol=1e-5)
    # chain the engine's star-emission grad through star_channels + softmax
    # with jax VJP for an end-to-end input-grad comparison
    _, vjp = jax.vjp(
        lambda x: crit.star_channels(jax.nn.log_softmax(x, 2),
                                     prep["select"]),
        jnp.asarray(xs),
    )
    gx = np.asarray(vjp(jnp.asarray(grad_em / Bs))[0])
    np.testing.assert_allclose(np.asarray(g_ours), gx, rtol=1e-4, atol=1e-5)


def test_transducer_viterbi_batch_matches_criterion():
    """Native batched decode (tw_transducer_viterbi_batch — the bench.py
    decode denominator) == the criterion's device decode, on random
    emissions at word-decomps-style settings (blank=optional,
    allow_repeats=False) and a multi-grapheme wordpiece inventory."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer

    if not native.available():
        pytest.skip("native library unavailable")
    tokens = ["a", "b", "ab", "ba", "c"]
    g2i = {c: i for i, c in enumerate("abc")}
    crit = Transducer(tokens, g2i, blank="optional", allow_repeats=False)
    B, T = 6, 14
    C = len(tokens) + 1
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lp = np.asarray(jax.nn.log_softmax(x, 2))
    want = crit.viterbi(x)
    got = native.transducer_viterbi_batch(lp, crit.tokens)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(
            np.asarray(g, np.int32), np.asarray(w, np.int32)
        )
