"""Host WFST library tests: compose/remove/score semantics, serialization,
and host-vs-device forward-score parity on random lattices."""

import pytest
import math
import tempfile

import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu import wfst
from gtn_applications_tpu.ops import sparse
from gtn_applications_tpu.ops.semiring import NEG
from gtn_applications_tpu.wfst import EPSILON, Graph


def chain(seq, weights=None):
    g = Graph()
    g.add_node(True, len(seq) == 0)
    for i, s in enumerate(seq):
        g.add_node(False, i == len(seq) - 1)
        g.add_arc(i, i + 1, s, s, 0.0 if weights is None else weights[i])
    return g


def test_forward_score_chain():
    g = chain([0, 1, 2], weights=[0.5, 1.0, -0.25])
    assert abs(wfst.forward_score(g) - 1.25) < 1e-6


def test_forward_score_parallel_paths():
    g = Graph()
    g.add_node(True)
    g.add_node(False, True)
    g.add_arc(0, 1, 0, 0, 1.0)
    g.add_arc(0, 1, 1, 1, 2.0)
    expected = math.log(math.exp(1.0) + math.exp(2.0))
    assert abs(wfst.forward_score(g) - expected) < 1e-6
    assert abs(wfst.viterbi_score(g) - 2.0) < 1e-6


def test_intersect_simple():
    # chain 'aba' against an acceptor allowing any of a/b each step
    g1 = chain([0, 1, 0])
    g2 = Graph()
    g2.add_node(True, True)
    g2.add_arc(0, 0, 0, 0, 0.1)
    g2.add_arc(0, 0, 1, 1, 0.2)
    r = wfst.intersect(g1, g2)
    assert abs(wfst.forward_score(r) - 0.4) < 1e-6


def test_compose_transducer_eps():
    # lexicon-style: graphemes (0,1) -> wordpiece ids with eps intermediate
    lex = Graph()
    lex.add_node(True, True)
    # token 0 = "ab": a:eps then b:0
    n = lex.add_node()
    lex.add_arc(0, n, 0, EPSILON)
    lex.add_arc(n, 0, 1, 0)
    # token 1 = "a": a:1
    lex.add_arc(0, 0, 0, 1)
    target = chain([0, 1, 0])  # "aba"
    out = wfst.compose(target, lex)
    proj = wfst.remove(wfst.project_output(out))
    # decompositions of "aba": [ab, a] and [a, ?]. "ba" isn't a token so
    # only path: 0 (ab) then 1 (a); plus [a,?]: after "a"(tok 1), "ba" needs
    # b.. no token starts with b -> dead. So single path [0, 1].
    assert abs(wfst.forward_score(proj) - 0.0) < 1e-6
    path = wfst.viterbi_path(proj)
    assert path.labels_to_list() == [0, 1]


def test_remove_multiplicity():
    # interior parallel eps paths stay distinct paths; eps suffixes into an
    # accept state collapse to a single final (GTN boolean-accept parity)
    g = Graph()
    g.add_node(True)
    g.add_node()
    g.add_node()
    g.add_node(False, True)
    g.add_arc(0, 1, 5, 5, 0.0)
    g.add_arc(1, 2, EPSILON, EPSILON, 0.0)
    g.add_arc(1, 2, EPSILON, EPSILON, 0.0)
    g.add_arc(2, 3, 7, 7, 0.0)
    r = wfst.remove(g)
    # two eps routes into the 7-arc -> two parallel arcs -> log 2
    assert abs(wfst.forward_score(r) - math.log(2.0)) < 1e-6
    # suffix collapse: eps into accept counts once
    g2 = Graph()
    g2.add_node(True)
    g2.add_node()
    g2.add_node(False, True)
    g2.add_arc(0, 1, 5, 5, 0.0)
    g2.add_arc(1, 2, EPSILON, EPSILON, 0.0)
    g2.add_arc(1, 2, EPSILON, EPSILON, 0.0)
    r2 = wfst.remove(g2)
    assert abs(wfst.forward_score(r2) - 0.0) < 1e-6


def test_remove_weighted_eps():
    g = Graph()
    g.add_node(True)
    g.add_node()
    g.add_node(False, True)
    g.add_arc(0, 1, EPSILON, EPSILON, 0.7)
    g.add_arc(1, 2, 3, 3, 0.3)
    r = wfst.remove(g)
    assert abs(wfst.forward_score(r) - 1.0) < 1e-6
    assert not any(
        il == EPSILON and ol == EPSILON
        for _, _, il, ol, _ in r.arcs()
    )


def test_loadtxt_roundtrip():
    # GTN text format: start line, accept line, "src dst ilabel olabel w"
    text = "2\n0 1 2\n0 1 1 1 0\n1 0 -1 -1 0.5\n2 0 0 0 0\n1 1 2 2 -0.25\n"
    import io

    g = wfst.loadtxt(io.StringIO(text))
    assert g.num_nodes() == 3
    assert g.start_nodes() == [2]
    assert g.num_accept() == 3
    assert g.arc_ilabel[1] == EPSILON
    with tempfile.NamedTemporaryFile("w+", suffix=".txt", delete=False) as f:
        wfst.savetxt(f.name, g)
        g2 = wfst.loadtxt(f.name)
    assert wfst.equal(g, g2)


def test_binary_roundtrip():
    g = chain([3, 1, 2], weights=[0.25, -1.0, 2.0])
    g.add_final(1, -0.5)
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        wfst.save(f.name, g)
        g2 = wfst.load(f.name)
    assert wfst.equal(g, g2)


def test_isomorphic():
    g1 = chain([0, 1])
    g2 = Graph()
    g2.add_node(False, True)   # permuted node order
    g2.add_node(True)
    g2.add_node()
    g2.add_arc(1, 2, 0)
    g2.add_arc(2, 0, 1)
    assert wfst.isomorphic(g1, g2)
    g3 = chain([1, 0])
    assert not wfst.isomorphic(g1, g3)


def _random_acceptor(rng, S=6, A=14, C=4, eps_frac=0.2):
    while True:
        g = Graph()
        for i in range(S):
            g.add_node(i == 0, i >= S - 2)
        ok = True
        for _ in range(A):
            s = rng.randint(0, S - 1)
            d = rng.randint(s, S)  # forward arcs only: keeps eps acyclic
            if rng.rand() < eps_frac and d > s:
                g.add_arc(s, d, EPSILON, EPSILON, float(rng.randn() * 0.5))
            else:
                lbl = rng.randint(0, C)
                g.add_arc(s, min(d, S - 1), lbl, lbl, float(rng.randn() * 0.5))
        # need some self loops so T-step paths exist
        for i in range(S):
            lbl = rng.randint(0, C)
            g.add_arc(i, i, lbl, lbl, float(rng.randn() * 0.5))
        return g


def _host_score_with_emissions(g, em):
    T, C = em.shape
    lin = wfst.linear_graph(T, C)
    lin.set_weights(em.reshape(-1))
    inter = wfst.intersect(lin, g)
    return wfst.forward_score(inter)


def test_device_scan_matches_host():
    rng = np.random.RandomState(0)
    for trial in range(5):
        g = _random_acceptor(rng)
        T, C = 7, 4
        em = rng.randn(T, C).astype(np.float32)
        host = _host_score_with_emissions(g, em)
        cg = wfst.compile_acceptor(g)
        table = wfst.to_arc_table(cg)
        dev = float(sparse.forward_score(jnp.asarray(em), table))
        if host <= NEG / 2:
            assert dev <= NEG / 2 + 1e25
        else:
            assert abs(host - dev) < 1e-3, f"trial {trial}: {host} vs {dev}"


def test_device_viterbi_matches_host():
    rng = np.random.RandomState(1)
    for trial in range(5):
        g = _random_acceptor(rng)
        T, C = 6, 4
        em = rng.randn(T, C).astype(np.float32)
        lin = wfst.linear_graph(T, C)
        lin.set_weights(em.reshape(-1))
        inter = wfst.intersect(lin, g)
        host = wfst.viterbi_score(inter)
        cg = wfst.compile_acceptor(g, semiring="tropical", remove_eps=True)
        table = wfst.to_arc_table(cg)
        labels, score = sparse.viterbi(jnp.asarray(em), table)
        if host <= NEG / 2:
            continue
        assert abs(host - float(score)) < 1e-3, f"trial {trial}"
        # the emitted labels re-score to the same value
        host_path = wfst.viterbi_path(inter)
        assert len([l for l in labels.tolist() if l >= 0]) == T


@pytest.mark.slow  # fuzz at scale
def test_device_scan_fuzz_with_eps():
    """Random acceptors incl. weighted eps arcs: host forward_score vs the
    compiled device scan, 20 graphs."""
    rng = np.random.RandomState(11)
    for trial in range(20):
        g = _random_acceptor(rng, S=rng.randint(4, 9), A=rng.randint(8, 24))
        T, C = rng.randint(3, 9), 4
        em = rng.randn(T, C).astype(np.float32)
        host = _host_score_with_emissions(g, em)
        table = wfst.to_arc_table(wfst.compile_acceptor(g))
        dev = float(sparse.forward_score(jnp.asarray(em), table))
        if host <= NEG / 2:
            assert dev <= NEG / 2 + 1e25, trial
        else:
            assert abs(host - dev) < 2e-3, (trial, host, dev)
