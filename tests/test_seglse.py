"""Pallas seg_lse batched sparse scan vs the XLA segment-op path."""

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu import wfst
from gtn_applications_tpu.ops import sparse
from gtn_applications_tpu.ops.seglse_pallas import seg_lse
from gtn_applications_tpu.ops.semiring import segment_logsumexp
from gtn_applications_tpu.wfst import EPSILON, Graph


def test_seg_lse_matches_segment_ops():
    rng = np.random.RandomState(0)
    B, S, A = 3, 16, 40
    alpha = jnp.asarray(rng.randn(B, S).astype(np.float32))
    src = jnp.asarray(rng.randint(0, S, (B, A)), dtype=jnp.int32)
    dst = jnp.asarray(rng.randint(0, S, (B, A)), dtype=jnp.int32)
    w = jnp.asarray(rng.randn(B, A).astype(np.float32))
    em = jnp.asarray(rng.randn(B, A).astype(np.float32))

    out = seg_lse(alpha, src, dst, w, em)
    for b in range(B):
        contrib = alpha[b][src[b]] + w[b] + em[b]
        ref = segment_logsumexp(contrib, dst[b], S)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_seg_lse_grads():
    rng = np.random.RandomState(1)
    B, S, A = 2, 8, 20
    alpha = jnp.asarray(rng.randn(B, S).astype(np.float32))
    src = jnp.asarray(rng.randint(0, S, (B, A)), dtype=jnp.int32)
    dst = jnp.asarray(rng.randint(0, S, (B, A)), dtype=jnp.int32)
    w = jnp.asarray(rng.randn(B, A).astype(np.float32))
    em = jnp.asarray(rng.randn(B, A).astype(np.float32))

    def f_pallas(alpha, w, em):
        return (seg_lse(alpha, src, dst, w, em) ** 2).sum()

    def f_ref(alpha, w, em):
        outs = []
        for b in range(B):
            contrib = alpha[b][src[b]] + w[b] + em[b]
            outs.append(segment_logsumexp(contrib, dst[b], S))
        return (jnp.stack(outs) ** 2).sum()

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(alpha, w, em)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(alpha, w, em)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_seg_lse_shared_table():
    rng = np.random.RandomState(2)
    B, S, A = 4, 10, 24
    alpha = jnp.asarray(rng.randn(B, S).astype(np.float32))
    src = jnp.asarray(rng.randint(0, S, (1, A)), dtype=jnp.int32)
    dst = jnp.asarray(rng.randint(0, S, (1, A)), dtype=jnp.int32)
    w = jnp.asarray(rng.randn(1, A).astype(np.float32))
    em = jnp.asarray(rng.randn(1, A).astype(np.float32))
    out = seg_lse(alpha, src, dst, w, em)
    for b in range(B):
        contrib = alpha[b][src[0]] + w[0] + em[0]
        ref = segment_logsumexp(contrib, dst[0], S)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref), rtol=1e-4)
    # shared-table weight grads accumulate over the batch
    g = jax.grad(lambda w: seg_lse(alpha, src, dst, w, em).sum())(w)
    assert g.shape == (1, A)


def test_seg_lse_mixed_batch_dims():
    """Per-sample endpoints with SHARED weights (composed per-sample
    lattices whose eps weights come from the one transition graph) — the
    dw reduction and the block specs must gate on each input's own
    leading dim, not src's.  Regression: on-chip the composed 200wp-LM
    leg died with an ad_util add_abstract assert ([B, E] eps cotangent
    added to the [1, E] primal's)."""
    rng = np.random.RandomState(3)
    B, S, A = 4, 10, 24
    alpha = jnp.asarray(rng.randn(B, S).astype(np.float32))
    src = jnp.asarray(rng.randint(0, S, (B, A)), dtype=jnp.int32)
    dst = jnp.asarray(rng.randint(0, S, (B, A)), dtype=jnp.int32)
    w = jnp.asarray(rng.randn(1, A).astype(np.float32))
    em = jnp.asarray(rng.randn(B, A).astype(np.float32))
    out = seg_lse(alpha, src, dst, w, em)
    for b in range(B):
        contrib = alpha[b][src[b]] + w[0] + em[b]
        ref = segment_logsumexp(contrib, dst[b], S)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(ref), rtol=1e-4
        )
    ga, gw, ge = jax.grad(
        lambda alpha, w, em: (seg_lse(alpha, src, dst, w, em) ** 2).sum(),
        argnums=(0, 1, 2),
    )(alpha, w, em)
    assert gw.shape == (1, A) and ge.shape == (B, A)

    def f_ref(alpha, w, em):
        outs = []
        for b in range(B):
            contrib = alpha[b][src[b]] + w[0] + em[b]
            outs.append(segment_logsumexp(contrib, dst[b], S))
        return (jnp.stack(outs) ** 2).sum()

    ra, rw, re = jax.grad(f_ref, argnums=(0, 1, 2))(alpha, w, em)
    for a, b in zip((ga, gw, ge), (ra, rw, re)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_batched_pallas_scan_matches_vmap():
    rng = np.random.RandomState(3)
    # graph with eps backoff arcs
    g = Graph()
    for i in range(6):
        g.add_node(i == 0, i >= 4)
    for _ in range(12):
        s = rng.randint(0, 5)
        d = rng.randint(s, 6)
        lbl = rng.randint(0, 4)
        g.add_arc(s, min(d, 5), lbl, lbl, float(rng.randn() * 0.3))
    g.add_arc(1, 0, EPSILON, EPSILON, -0.5)
    g.add_arc(3, 2, EPSILON, EPSILON, -0.7)
    for i in range(6):
        lbl = rng.randint(0, 4)
        g.add_arc(i, i, lbl, lbl, float(rng.randn() * 0.3))

    cg = wfst.compile_acceptor(g)
    table = wfst.to_arc_table(cg)
    B, T, C = 3, 9, 4
    em = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lens = jnp.asarray([9, 6, 9], jnp.int32)

    ref = jax.vmap(lambda e, l: sparse.forward_score(e, table, l))(em, lens)
    out = sparse._forward_batched_pallas(em, table, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)

    # grads too
    g1 = jax.grad(lambda em: sparse._forward_batched_pallas(em, table, lens).sum())(em)
    g2 = jax.grad(
        lambda em: jax.vmap(lambda e, l: sparse.forward_score(e, table, l))(
            em, lens
        ).sum()
    )(em)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3)


def test_viterbi_batched_pallas_matches_vmap():
    rng = np.random.RandomState(5)
    g = Graph()
    for i in range(6):
        g.add_node(i == 0, i >= 4)
    for _ in range(14):
        s = rng.randint(0, 5)
        d = rng.randint(s, 6)
        lbl = rng.randint(0, 4)
        g.add_arc(s, min(d, 5), lbl, lbl, float(rng.randn() * 0.3))
    for i in range(6):
        g.add_arc(i, i, rng.randint(0, 4), None, float(rng.randn() * 0.3))

    cg = wfst.compile_acceptor(g, semiring="tropical", remove_eps=True)
    table = wfst.to_arc_table(cg)
    B, T, C = 3, 8, 4
    em = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lens = jnp.asarray([8, 5, 8], jnp.int32)

    ref_labels, ref_scores = jax.vmap(
        lambda e, l: sparse.viterbi(e, table, l)
    )(em, lens)
    labels, scores = sparse._viterbi_batched_pallas(em, table, lens)
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-4
    )
    # label sequences must re-score identically (argmax ties can differ in
    # dead-frame handling, so compare live frames only)
    for b in range(B):
        L = int(lens[b])
        assert labels[b, :L].tolist() == ref_labels[b, :L].tolist()
