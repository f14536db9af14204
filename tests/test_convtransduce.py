"""ConvTransduce1D tests: kernel graph structure, shape contracts, and
host-WFST scoring parity (mirrors /root/reference/tests/transducer_test.py
TestConvTransducer)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu import wfst
from gtn_applications_tpu.criterions.transducer import (
    ConvTransduce1D,
    make_kernel_graph,
)
from gtn_applications_tpu.ops import convkernel
from gtn_applications_tpu.wfst import Graph


def test_kernel_graph_structure():
    """Expected graphs from transducer_test.py:24-55."""

    def get_graph(l1, l2, add_skip=False):
        g = Graph()
        g.add_node(True)
        g.add_node(True)
        g.add_node()
        g.add_node(False, True)
        g.add_node(False, True)
        g.add_arc(0, 0, 2)
        g.add_arc(0, 1, l1)
        g.add_arc(1, 1, l1)
        g.add_arc(1, 2, 2)
        g.add_arc(2, 2, 2)
        g.add_arc(2, 3, l2)
        g.add_arc(3, 3, l2)
        g.add_arc(3, 4, 2)
        g.add_arc(4, 4, 2)
        if add_skip:
            g.add_arc(1, 3, l2)
        return g

    # NOTE: the reference expected-graph marks node 1 as a start node and
    # nodes 3,4 accepting; make_kernel_graph only starts at 0 and accepts
    # 2n-1, 2n — the reference test used gtn.equal without asserting, and
    # the graphs ARE different in start flags.  We assert against the
    # actual builder semantics: same arcs, start {0}, accepts {2n-1, 2n}.
    graph = make_kernel_graph([0, 0], 2, True)
    assert graph.start_nodes() == [0]
    assert graph.accept_nodes() == [3, 4]
    assert graph.num_arcs() == 9  # no skip (repeat labels)

    graph = make_kernel_graph([0, 1], 2, False)
    assert graph.accept_nodes() == [4]
    assert graph.num_arcs() == 9  # no skip (blank not optional)

    graph = make_kernel_graph([0, 1], 2, True)
    assert graph.num_arcs() == 10  # skip arc present


def test_shapes_and_stride():
    lexicon = [(0, 0), (0, 1), (1, 0), (1, 1)]
    conv = ConvTransduce1D(lexicon, kernel_size=5, stride=3, blank_idx=2)
    B, C = 2, 3
    rng = np.random.RandomState(0)
    try:
        conv(jnp.asarray(rng.randn(B, 0, C).astype(np.float32)))
        assert False, "expected ValueError on zero-length input"
    except ValueError:
        pass
    Tin = (1, 3, 4, 6, 7, 8)
    Tout = (1, 1, 2, 2, 3, 3)
    for Ti, To in zip(Tin, Tout):
        out = conv(jnp.asarray(rng.randn(B, Ti, C).astype(np.float32)))
        assert out.shape == (B, To, len(lexicon)), (Ti, out.shape)


def test_backward():
    lexicon = [(0, 0), (0, 1), (1, 0), (1, 1)]
    conv = ConvTransduce1D(lexicon, kernel_size=5, stride=3, blank_idx=2)
    rng = np.random.RandomState(0)
    for Ti in (1, 4, 8):
        x = jnp.asarray(rng.randn(2, Ti, 3).astype(np.float32))
        g = jax.grad(lambda x: conv(x).sum())(x)
        assert np.isfinite(np.asarray(g)).all()


def _host_scores(x_seq, lexicon, blank_idx, blank_optional, windows, viterbi=False):
    """Score windows against kernel graphs with the host WFST library."""
    out = np.zeros((windows.shape[0], len(lexicon)), np.float32)
    for w in range(windows.shape[0]):
        K, C = windows.shape[1:]
        em = wfst.linear_graph(K, C)
        em.set_weights(windows[w].reshape(-1))
        for v, entry in enumerate(lexicon):
            kg = make_kernel_graph(list(entry), blank_idx, blank_optional)
            inter = wfst.intersect(em, kg)
            out[w, v] = (
                wfst.viterbi_score(inter) if viterbi else wfst.forward_score(inter)
            )
    return out


def test_scores_match_host_wfst():
    rng = np.random.RandomState(3)
    lexicon = [(0,), (1,), (0, 1), (1, 0), (0, 1, 0)]
    blank_idx = 2
    K, stride, C = 7, 2, 3
    T = 9
    x = rng.randn(1, T, C).astype(np.float32)
    conv = ConvTransduce1D(lexicon, K, stride, blank_idx)
    dev = np.asarray(conv(jnp.asarray(x)))[0]
    win = np.asarray(convkernel.make_windows(jnp.asarray(x), K, stride))[0]
    host = _host_scores(None, lexicon, blank_idx, True, win)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_viterbi_scores_match_host_wfst():
    rng = np.random.RandomState(4)
    lexicon = [(0,), (0, 1)]
    blank_idx = 2
    K, stride, C = 5, 3, 3
    x = rng.randn(1, 6, C).astype(np.float32)
    conv = ConvTransduce1D(lexicon, K, stride, blank_idx, viterbi=True)
    dev = np.asarray(conv(jnp.asarray(x)))[0]
    win = np.asarray(convkernel.make_windows(jnp.asarray(x), K, stride))[0]
    host = _host_scores(None, lexicon, blank_idx, True, win, viterbi=True)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_learnable_params_gradient():
    lexicon = [(0, 1), (1, 0)]
    conv = ConvTransduce1D(
        lexicon, kernel_size=5, stride=1, blank_idx=2, learn_params=True
    )
    params = conv.init_params()
    assert params.shape[0] == conv.tables.num_params
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 6, 3).astype(np.float32))
    g = jax.grad(lambda p: conv(x, p).sum())(params)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_scale_and_normalize_modes():
    lexicon = [(0,), (1,)]
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    base = ConvTransduce1D(lexicon, 3, 1, 2)
    sqrt = ConvTransduce1D(lexicon, 3, 1, 2, scale="sqrt")
    np.testing.assert_allclose(
        np.asarray(base(x)) / np.sqrt(3.0), np.asarray(sqrt(x)), rtol=1e-5
    )
    post = ConvTransduce1D(lexicon, 3, 1, 2, normalize="post")
    out = np.asarray(post(x))
    np.testing.assert_allclose(out.sum(-1), np.ones_like(out.sum(-1)), rtol=1e-5)
    pre = ConvTransduce1D(lexicon, 3, 1, 2, normalize="pre")
    assert (np.asarray(pre(x)) >= 0).all()


def test_chunked_matches_direct(monkeypatch):
    """V-chunked (rematerialized) scoring equals the direct path."""
    from gtn_applications_tpu.ops import convkernel as ck

    rng = np.random.RandomState(9)
    # 150 entries > chunk size 128 after padding
    lexicon = []
    seen = set()
    while len(lexicon) < 150:
        t = tuple(rng.randint(0, 3, rng.randint(1, 3)))
        lexicon.append(t)
    conv = ConvTransduce1D(lexicon, kernel_size=5, stride=2, blank_idx=3,
                           learn_params=True)
    p = conv.init_params()
    x = jnp.asarray(rng.randn(2, 12, 4).astype(np.float32))

    direct, gd = jax.value_and_grad(
        lambda p, x: conv(x, p).sum(), argnums=(0, 1)
    )(p, x)

    monkeypatch.setattr(ck, "_CHUNK_THRESHOLD", 1)
    chunked, gc_ = jax.value_and_grad(
        lambda p, x: conv(x, p).sum(), argnums=(0, 1)
    )(p, x)
    np.testing.assert_allclose(float(direct), float(chunked), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(gc_[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(gc_[1]), rtol=1e-4, atol=1e-5)


def test_pre_normalize_edge_window_parity():
    """normalize='pre' must pad the raw scores BEFORE log_softmax so padded
    edge frames carry uniform log-probs (-log C), matching the reference's
    pad-then-normalize order (transducer.py:437-441).  Verified against the
    host WFST on the edge windows."""
    rng = np.random.RandomState(11)
    lexicon = [(0,), (1,), (0, 1)]
    blank_idx = 2
    K, stride, C, T = 5, 2, 3, 6
    x = rng.randn(1, T, C).astype(np.float32)
    conv = ConvTransduce1D(lexicon, K, stride, blank_idx, normalize="pre")
    dev = np.asarray(conv(jnp.asarray(x)))[0]

    pad = K // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    logp = xp - jax.nn.logsumexp(jnp.asarray(xp), axis=2, keepdims=True)
    win = np.asarray(
        convkernel.make_windows(jnp.asarray(logp), K, stride, padded=True)
    )[0]
    host = np.exp(_host_scores(None, lexicon, blank_idx, True, win))
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
    # padded edge frames are uniform: prob exp(-log C) per channel, so the
    # first window differs from what normalize-after-pad-with-zeros gives
    assert dev.shape[0] == (T - 1) // stride + 1
