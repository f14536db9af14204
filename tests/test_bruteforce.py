"""Independent brute-force oracles: enumerate EVERY label sequence at tiny
shapes and logsumexp the accepted paths' scores.

Unlike the differential tests (which pin implementations against each
other) these share no scoring code with the library at all — acceptance
is defined straight from the criterion semantics:

  * CTC: sequences whose blank-strip + run-collapse equals the target
    (reference criterions/ctc.py:14-28 graph semantics).
  * ASG free score: all sequences, with start row transitions[0, s0] and
    steps transitions[cur+1, prev]; forced score: sequences that are a
    concatenation of non-empty runs of the target labels in order
    (reference criterions/asg.py:53-115).
  * Transducer (ngram 0, singleton tokens, optional blank, no repeats):
    sequences whose run-collapse + blank-drop equals the target — the
    token-graph transduction is deterministic in this configuration
    (reference criterions/transducer.py:78-123).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions.common import pad_targets
from gtn_applications_tpu.ops import lattice


def _lse(xs):
    if not xs:
        return -np.inf
    m = max(xs)
    return m + np.log(sum(np.exp(x - m) for x in xs))


def _collapse_ctc(seq, blank):
    out = []
    prev = None
    for s in seq:
        if s != prev:
            if s != blank:
                out.append(s)
            prev = s
    return out


def _asg_parse_count(seq, target):
    """Number of ways to parse seq as L non-empty runs of the target
    labels in order.  Adjacent equal target labels make parses ambiguous;
    the force-align GRAPH counts every parse as a distinct path (one state
    per target position with a self-loop), so the oracle must too."""
    L = len(target)
    # counts[i] = number of parses of the consumed prefix ending inside
    # run i-1 (i target positions fully entered)
    counts = [0] * (L + 1)
    counts[0] = 1
    for s in seq:
        nxt = [0] * (L + 1)
        for i in range(L + 1):
            if not counts[i]:
                continue
            if i < L and target[i] == s:
                nxt[i + 1] += counts[i]  # start run i
            if i > 0 and target[i - 1] == s:
                nxt[i] += counts[i]  # extend run i-1
        counts = nxt
        if not any(counts):
            return 0
    return counts[L]


def test_graph_scores_match_path_enumeration():
    """Host (Python and C++) forward/viterbi scores vs DFS enumeration of
    every start→accept path on random acyclic graphs (incl. eps arcs,
    parallel arcs, multiple starts/accepts, and final weights)."""
    from gtn_applications_tpu import wfst
    from gtn_applications_tpu.wfst import native
    from gtn_applications_tpu.wfst.graph import EPSILON, Graph

    rng = np.random.RandomState(9)
    for trial in range(30):
        S = rng.randint(3, 9)
        g = Graph()
        for s in range(S):
            g.add_node(s == 0 or rng.rand() < 0.25, False)
        for s in range(S):
            if s == S - 1 or rng.rand() < 0.3:
                g.add_final(s, float(rng.randn() * 0.3))
        arcs = []
        for _ in range(rng.randint(S, 4 * S)):
            a = rng.randint(0, S - 1)
            b = rng.randint(a + 1, S)  # forward arcs only: acyclic
            lbl = EPSILON if rng.rand() < 0.2 else int(rng.randint(0, 4))
            w = float(rng.randn() * 0.7)
            g.add_arc(a, b, lbl, lbl, w)
            arcs.append((a, b, w))

        # DFS path enumeration
        out_arcs = {}
        for a, b, w in arcs:
            out_arcs.setdefault(a, []).append((b, w))
        scores = []

        def walk(node, acc):
            for fw in g.finals.get(node, []):
                scores.append(acc + fw)
            for b, w in out_arcs.get(node, []):
                walk(b, acc + w)

        for s in range(S):
            if g.start[s]:
                walk(s, 0.0)

        want_fwd = _lse(scores)
        want_vit = max(scores) if scores else -np.inf
        got_fwd = wfst.forward_score(g)
        got_vit = wfst.viterbi_score(g)
        if not scores:
            assert got_fwd < -1e20 and got_vit < -1e20, trial
            continue
        assert abs(got_fwd - want_fwd) < 1e-4, (trial, got_fwd, want_fwd)
        assert abs(got_vit - want_vit) < 1e-4, (trial, got_vit, want_vit)
        if native.available():
            assert abs(native.forward_score(g) - want_fwd) < 1e-4, trial
            assert abs(native.viterbi_score(g) - want_vit) < 1e-4, trial


def test_ctc_matches_bruteforce():
    T, C = 5, 4
    blank = C - 1
    rng = np.random.RandomState(0)
    logits = rng.randn(1, T, C).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))[0]

    for target in ([], [0], [0, 1], [1, 1], [2, 0, 2], [0, 1, 2, 0, 1]):
        scores = [
            lp[np.arange(T), list(seq)].sum()
            for seq in itertools.product(range(C), repeat=T)
            if _collapse_ctc(seq, blank) == list(target)
        ]
        want = _lse(scores)
        tg, ln = pad_targets([list(target)])
        got = float(
            lattice.ctc_forward_score(
                jnp.asarray(lp)[None], tg, ln, blank, impl="scan"
            )[0]
        )
        if not scores:  # infeasible (target longer than T allows)
            assert got < -1e20, target
        else:
            assert abs(got - want) < 1e-4, (target, got, want)


def test_ctc_bruteforce_ragged_length():
    T, C = 6, 3
    blank = C - 1
    rng = np.random.RandomState(1)
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.randn(1, T, C)), axis=-1),
        np.float32,
    )[0]
    for length in (2, 4, 6):
        scores = [
            lp[np.arange(length), list(seq)].sum()
            for seq in itertools.product(range(C), repeat=length)
            if _collapse_ctc(seq, blank) == [0, 1]
        ]
        tg, ln = pad_targets([[0, 1]])
        got = float(
            lattice.ctc_forward_score(
                jnp.asarray(lp)[None], tg, ln, blank,
                input_lengths=jnp.asarray([length], jnp.int32), impl="scan",
            )[0]
        )
        assert abs(got - _lse(scores)) < 1e-4, length


def test_asg_matches_bruteforce():
    T, N = 4, 3
    rng = np.random.RandomState(2)
    em = rng.randn(1, T, N).astype(np.float32)
    trans = (rng.randn(N + 1, N) * 0.5).astype(np.float32)

    def path_score(seq):
        s = trans[0, seq[0]] + em[0, 0, seq[0]]
        for t in range(1, T):
            s += trans[seq[t] + 1, seq[t - 1]] + em[0, t, seq[t]]
        return s

    all_seqs = list(itertools.product(range(N), repeat=T))
    fcc_bf = _lse([path_score(s) for s in all_seqs])
    fcc = float(
        lattice.asg_fcc_score(jnp.asarray(em), jnp.asarray(trans))[0]
    )
    assert abs(fcc - fcc_bf) < 1e-4

    for target in ([0], [0, 1], [1, 1], [2, 0, 2], [0, 1, 2, 1]):
        fal_bf = _lse(
            [
                path_score(s) + np.log(k)
                for s in all_seqs
                for k in [_asg_parse_count(s, list(target))]
                if k > 0
            ]
        )
        tg, ln = pad_targets([list(target)])
        fal = float(
            lattice.asg_fal_score(
                jnp.asarray(em), jnp.asarray(trans), tg, ln
            )[0]
        )
        assert abs(fal - fal_bf) < 1e-4, (target, fal, fal_bf)


def test_stc_matches_reference_spec_forward():
    """STC vs an independent NFA forward built VERBATIM from the
    reference's graph construction (reference criterions/stc.py:23-64):
    nodes, arcs, star penalties, and the appended star channels are all
    recomputed test-locally in numpy, sharing no code with the library."""
    import math

    from gtn_applications_tpu.criterions.stc import STC

    def ref_stc_arcs(target, star_idx, log_p):
        """(starts, accepts, arcs) exactly as reference create_stc_graph."""
        L = len(target)
        S = 2 * L + 1
        starts, accepts, arcs = set(), set(), []
        node_count = S
        for l in range(S):
            idx = (l - 1) // 2
            if l == 0:
                starts.add(l)
            if l == S - 1 or l == S - 2:
                accepts.add(l)
            label = target[idx] if l % 2 else 0
            if label == 0:
                arcs.append((l, l, label, 0.0))
            if l > 0:
                arcs.append((l - 1, l, label, 0.0))
            if l % 2 and l > 1:
                arcs.append((l - 2, l, label, 0.0))
        for l in range(L + 1):
            p1, p2 = 2 * l - 1, 2 * l
            c1 = node_count
            node_count += 1
            if l == L:
                accepts.add(c1)
            idx = star_idx if l == L else (star_idx + target[l])
            if p1 >= 0:
                arcs.append((p1, c1, idx, log_p))
            arcs.append((p2, c1, idx, log_p))
            arcs.append((c1, c1, idx, log_p))
            if l < L:
                arcs.append((c1, 2 * l + 1, target[l], 0.0))
            arcs.append((c1, p2, 0, 0.0))
        return starts, accepts, arcs, node_count

    def oracle_loss(logits, target, prob, select_multiple=8):
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        T, C = lp.shape
        # token subsetting + remap (part of the criterion's semantics)
        select = [0] + sorted(set(target))
        remap = {t: i for i, t in enumerate(select)}
        Csel = -(-len(select) // select_multiple) * select_multiple
        select = select + [0] * (Csel - len(select))
        star_idx = Csel
        tgt = [remap[t] for t in target]
        # star channels: star = lse over ORIGINAL non-blank channels;
        # star\tok = log(exp(star) - exp(tok)) for each selected token
        star = np.logaddexp.reduce(lp[:, 1:], axis=1)
        em = np.full((T, 2 * Csel), -np.inf)
        em[:, :Csel] = lp[:, select]
        em[:, Csel] = star
        for m in range(1, Csel):
            diff = np.exp(star) - np.exp(lp[:, select[m]])
            em[:, Csel + m] = np.log(np.maximum(diff, 1e-37))
        starts, accepts, arcs, S = ref_stc_arcs(tgt, star_idx, math.log(prob))
        alpha = np.full(S, -np.inf)
        for s in starts:
            alpha[s] = 0.0
        for t in range(T):
            new = np.full(S, -np.inf)
            for src, dst, lab, w in arcs:
                new[dst] = np.logaddexp(new[dst], alpha[src] + w + em[t, lab])
            alpha = new
        return -np.logaddexp.reduce([alpha[a] for a in accepts])

    rng = np.random.RandomState(8)
    prob = 0.4
    crit = STC(blank_idx=0, p0=prob, plast=prob, thalf=1.0, reduction="none")
    T, C = 6, 5
    for target in ([1], [1, 2], [3, 1, 4], [2, 2], [1, 2, 3, 4]):
        logits = rng.randn(1, T, C).astype(np.float32)
        prepared = crit.prepare([list(target)])
        got = float(crit.loss({}, jnp.asarray(logits), prepared))
        want = oracle_loss(logits[0], list(target), prob)
        assert abs(got - want) < 1e-3, (target, got, want)


def test_asg_viterbi_matches_bruteforce():
    """The tropical decode's best path must be the argmax over ALL label
    sequences of emissions + transitions, for both backtrace impls."""
    T, N = 5, 3
    rng = np.random.RandomState(6)
    em = rng.randn(2, T, N).astype(np.float32)
    trans = (rng.randn(N + 1, N) * 0.5).astype(np.float32)

    def path_score(b, seq, length):
        s = trans[0, seq[0]] + em[b, 0, seq[0]]
        for t in range(1, length):
            s += trans[seq[t] + 1, seq[t - 1]] + em[b, t, seq[t]]
        return s

    lens = np.asarray([T, 3], np.int32)
    best = []
    for b in range(2):
        seqs = list(itertools.product(range(N), repeat=int(lens[b])))
        scores = [path_score(b, s, int(lens[b])) for s in seqs]
        best.append((list(seqs[int(np.argmax(scores))]), max(scores)))

    for backtrace in ("xla", "kernel"):
        paths, scores = lattice.asg_viterbi(
            jnp.asarray(em), jnp.asarray(trans),
            jnp.asarray(lens), backtrace,
        )
        for b in range(2):
            got = list(np.asarray(paths)[b][: lens[b]])
            assert got == best[b][0], (backtrace, b, got, best[b][0])
            assert abs(float(scores[b]) - best[b][1]) < 1e-4, (backtrace, b)


def test_transducer_ngram_matches_bruteforce():
    """Full-bigram transducer with learnable arc weights: loss =
    -(score - norm) where both terms walk the transitions trie per frame
    label. The oracle walks the actual transitions Graph arc-by-arc (so
    the parameter indexing is validated too) and weights each accepted
    sequence by its run-split parse count (allow_repeats=True lets a run
    of k identical labels emit 1..k tokens).  Checked against BOTH the
    transition-factored dense path and the host-composed generic path."""
    from gtn_applications_tpu.criterions.transducer import (
        Transducer,
        EPSILON,
    )

    T, ntok = 4, 3
    rng = np.random.RandomState(5)
    em = rng.randn(1, T, ntok).astype(np.float32)
    crit = Transducer(
        tokens=[(i,) for i in range(ntok)],
        graphemes_to_idx={i: i for i in range(ntok)},
        ngram=2,
        reduction="none",
    )
    params = (rng.randn(crit.num_transition_arcs) * 0.5).astype(np.float32)

    # deterministic walk table straight off the transitions Graph
    g = crit.transitions
    step = {}
    eps_out = {}
    for a in range(g.num_arcs()):
        s, d, il = g.arc_src[a], g.arc_dst[a], g.arc_ilabel[a]
        if il == EPSILON:
            eps_out[s] = params[a]
        else:
            step[(s, il)] = (d, params[a])
    starts = [s for s in range(g.num_nodes()) if g.start[s]]
    assert len(starts) == 1

    def trans_score(seq):
        s = starts[0]
        tot = 0.0
        for l in seq:
            s, w = step[(s, l)]
            tot += w
        return tot + eps_out[s]

    all_seqs = list(itertools.product(range(ntok), repeat=T))
    norm_bf = _lse([em[0, np.arange(T), list(s)].sum() + trans_score(s)
                    for s in all_seqs])
    for target in ([0, 1], [1, 1], [2, 0, 2], [0, 0, 1, 1]):
        num = _lse(
            [
                em[0, np.arange(T), list(s)].sum()
                + trans_score(s)
                + np.log(k)
                for s in all_seqs
                for k in [_asg_parse_count(s, list(target))]
                if k > 0
            ]
        )
        want = -(num - norm_bf)

        prep_f = crit.prepare([list(target)])
        assert "factored" in prep_f
        got_f = float(
            crit.loss({"transitions": jnp.asarray(params)},
                      jnp.asarray(em), prep_f)
        )
        assert abs(got_f - want) < 1e-3, ("factored", target, got_f, want)

        from tests.test_factored import _prepare_generic

        prep_g = _prepare_generic(crit, [list(target)])
        got_g = float(
            crit.loss({"transitions": jnp.asarray(params)},
                      jnp.asarray(em), prep_g)
        )
        assert abs(got_g - want) < 1e-3, ("generic", target, got_g, want)


def test_transducer_ngram_viterbi_matches_bruteforce():
    """Decode through a full-bigram transition graph: the best alignment
    must be the argmax over all label sequences of emissions + the
    transitions-trie walk (incl. the epsilon exit weight), and the decode
    output its run-collapse (shortest ambiguous transduction)."""
    from gtn_applications_tpu.criterions.transducer import (
        Transducer,
        EPSILON,
    )

    T, ntok = 5, 3
    rng = np.random.RandomState(7)
    em = rng.randn(2, T, ntok).astype(np.float32)
    crit = Transducer(
        tokens=[(i,) for i in range(ntok)],
        graphemes_to_idx={i: i for i in range(ntok)},
        ngram=2,
        reduction="none",
    )
    params = (rng.randn(crit.num_transition_arcs) * 0.7).astype(np.float32)

    g = crit.transitions
    step = {}
    eps_out = {}
    for a in range(g.num_arcs()):
        s, d, il = g.arc_src[a], g.arc_dst[a], g.arc_ilabel[a]
        if il == EPSILON:
            eps_out[s] = params[a]
        else:
            step[(s, il)] = (d, params[a])
    start = [s for s in range(g.num_nodes()) if g.start[s]][0]

    def trans_score(seq):
        s, tot = start, 0.0
        for l in seq:
            s, w = step[(s, l)]
            tot += w
        return tot + eps_out[s]

    preds = crit.viterbi(
        jnp.asarray(em), {"transitions": jnp.asarray(params)}
    )
    for b in range(2):
        seqs = list(itertools.product(range(ntok), repeat=T))
        scores = [
            em[b, np.arange(T), list(s)].sum() + trans_score(s) for s in seqs
        ]
        best = seqs[int(np.argmax(scores))]
        want = [l for i, l in enumerate(best) if i == 0 or l != best[i - 1]]
        assert list(preds[b]) == want, (b, list(preds[b]), want, best)


def test_transducer_marginalized_matches_bruteforce():
    """Marginalized decompositions: with multi-grapheme tokens the loss
    sums over every token sequence whose graphemes spell the target
    (reference transducer.py:239-309 compose(target, lexicon) pipeline).
    The oracle accepts a label sequence iff the graphemes of its collapsed
    token sequence spell the target."""
    from gtn_applications_tpu.criterions.transducer import Transducer

    tokens = ["a", "b", "ab", "ba"]
    g2i = {"a": 0, "b": 1}
    piece_of = [tuple(g2i[c] for c in t) for t in tokens]
    T = 4
    C = len(tokens) + 1  # + optional blank (last channel)
    blank = len(tokens)
    rng = np.random.RandomState(4)
    em = rng.randn(1, T, C).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(em), axis=-1))
    crit = Transducer(
        tokens=tokens,
        graphemes_to_idx=g2i,
        blank="optional",
        allow_repeats=False,
        reduction="none",
    )
    for word in ("ab", "aab", "abba", "a"):
        target = [g2i[c] for c in word]
        scores = [
            lp[0, np.arange(T), list(seq)].sum()
            for seq in itertools.product(range(C), repeat=T)
            if list(
                g
                for tok in _collapse_ctc(seq, blank)
                for g in piece_of[tok]
            ) == target
        ]
        want = -_lse(scores)
        prepared = crit.prepare([target])
        got = float(crit.loss({}, jnp.asarray(em), prepared))
        assert abs(got - want) < 1e-4, (word, got, want)


def test_transducer_ngram0_matches_bruteforce():
    from gtn_applications_tpu.criterions.transducer import Transducer

    T, ntok = 4, 3
    C = ntok + 1  # + optional blank (last channel)
    blank = ntok
    rng = np.random.RandomState(3)
    em = rng.randn(1, T, C).astype(np.float32)
    # without transitions the criterion log_softmaxes the emissions
    # (reference transducer.py:187) — the oracle scores the normalized rows
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(em), axis=-1))
    crit = Transducer(
        tokens=[(i,) for i in range(ntok)],
        graphemes_to_idx={i: i for i in range(ntok)},
        blank="optional",
        allow_repeats=False,
        reduction="none",
    )
    for target in ([0], [0, 1], [2, 0], [0, 1, 2]):
        scores = [
            lp[0, np.arange(T), list(seq)].sum()
            for seq in itertools.product(range(C), repeat=T)
            if _collapse_ctc(seq, blank) == list(target)
        ]
        want = -_lse(scores)
        prepared = crit.prepare([list(target)])
        got = float(crit.loss({}, jnp.asarray(em), prepared))
        assert abs(got - want) < 1e-4, (target, got, want)
