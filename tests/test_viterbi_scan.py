"""Differential tests for the whole-scan tropical (Viterbi) kernel.

ops/viterbi_scan_pallas.py decodes with a dense in-degree bucket layout in
one Pallas launch; these tests pin labels, scores, tie-breaks, ragged
lengths, and dead-state handling against the pure-JAX ``sparse.viterbi``
oracle.  Behavioral spec: reference transducer.py:199-234
(``gtn.viterbi_path`` + label projection).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gtn_applications_tpu.ops import sparse, viterbi_scan_pallas
from gtn_applications_tpu.ops.semiring import NEG
from gtn_applications_tpu.ops.sparse import ArcTable


def _random_table(S, A, rng, skew=False):
    src = list(range(S - 1))
    dst = list(range(1, S))
    while len(src) < A - 2:
        src.append(int(rng.integers(0, S)))
        # skewed in-degree exercises the bucket padding
        dst.append(0 if skew and rng.random() < 0.5 else int(rng.integers(0, S)))
    src += [0, S - 1]
    dst += [0, S - 1]
    n = len(src)
    label = rng.integers(0, 5, size=n).astype(np.int32)
    w = (rng.normal(size=n) * 0.5).astype(np.float32)
    start = np.full((S,), NEG, np.float32)
    start[0] = 0.0
    accept = np.full((S,), NEG, np.float32)
    accept[S - 1] = 0.0
    z = np.zeros((0,), np.int32)
    return ArcTable(
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(label), jnp.asarray(w), jnp.asarray(start),
        jnp.asarray(accept), jnp.asarray(z), jnp.asarray(z),
        jnp.asarray(np.zeros((0,), np.float32)), eps_depth=0,
    )


@pytest.fixture
def force_whole(monkeypatch):
    monkeypatch.setattr(sparse, "_VIT_IMPL", "whole")


@pytest.mark.parametrize("skew", [False, True])
def test_whole_viterbi_matches_oracle(force_whole, skew):
    rng = np.random.default_rng(3 + skew)
    B, T, S, A, C = 5, 12, 9, 28, 5
    table = _random_table(S, A, rng, skew=skew)
    assert viterbi_scan_pallas.build_plan(table) is not None
    em = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    lens = jnp.asarray([T, T - 1, T - 4, 3, 1], jnp.int32)

    labels, scores = sparse.viterbi_batch(em, table, lens)
    for b in range(B):
        ref_lab, ref_score = sparse.viterbi(em[b], table, lens[b])
        assert abs(float(scores[b] - ref_score)) < 1e-4, b
        np.testing.assert_array_equal(
            np.asarray(labels[b]), np.asarray(ref_lab), err_msg=str(b)
        )


@pytest.mark.parametrize("impl", ["step", "whole"])
def test_infeasible_decode_is_empty(monkeypatch, impl):
    """A sample whose lattice has no accepting path (score == NEG) must
    decode to the empty path (-1 everywhere) on EVERY implementation —
    not a backtrace from an arbitrary argmax state."""
    monkeypatch.setattr(sparse, "_VIT_IMPL", impl)
    # a 3-state chain needing exactly 2 frames to accept; len=1 samples
    # are infeasible
    z = np.zeros((0,), np.int32)
    start = np.asarray([0.0, NEG, NEG], np.float32)
    accept = np.asarray([NEG, NEG, 0.0], np.float32)
    table = ArcTable(
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([1, 2], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.zeros(2, jnp.float32),
        jnp.asarray(start), jnp.asarray(accept), jnp.asarray(z),
        jnp.asarray(z), jnp.zeros(0, jnp.float32), eps_depth=0,
    )
    rng = np.random.default_rng(0)
    em = jnp.asarray(rng.normal(size=(3, 2, 3)), jnp.float32)
    lens = jnp.asarray([2, 1, 2], jnp.int32)  # sample 1 infeasible
    labels, scores = sparse.viterbi_batch(em, table, lens)
    assert float(scores[1]) < NEG / 2
    np.testing.assert_array_equal(np.asarray(labels[1]), [-1, -1])
    np.testing.assert_array_equal(np.asarray(labels[0]), [0, 1])
    np.testing.assert_array_equal(np.asarray(labels[2]), [0, 1])


def test_whole_viterbi_tie_break(force_whole):
    # two identical-score paths: lowest arc id must win (segment_min parity)
    src = jnp.asarray([0, 0, 1, 2], jnp.int32)
    dst = jnp.asarray([1, 2, 3, 3], jnp.int32)
    label = jnp.asarray([0, 1, 2, 2], jnp.int32)
    w = jnp.zeros((4,), jnp.float32)
    start = jnp.asarray([0.0, NEG, NEG, NEG], jnp.float32)
    accept = jnp.asarray([NEG, NEG, NEG, 0.0], jnp.float32)
    z = jnp.zeros((0,), jnp.int32)
    table = ArcTable(src, dst, label, w, start, accept, z, z,
                     jnp.zeros((0,), jnp.float32), eps_depth=0)
    em = jnp.zeros((1, 2, 3), jnp.float32)
    labels, score = sparse.viterbi_batch(em, table)
    ref_lab, ref_score = sparse.viterbi(em[0], table)
    np.testing.assert_array_equal(np.asarray(labels[0]), np.asarray(ref_lab))
    assert abs(float(score[0] - ref_score)) < 1e-6


def test_plan_cache_identity():
    rng = np.random.default_rng(11)
    table = _random_table(6, 14, rng)
    p1 = viterbi_scan_pallas.build_plan(table)
    assert p1 is not None
    p2 = viterbi_scan_pallas.build_plan(table)
    assert p1 is p2
    # a re-weighted table (fresh arrays) must not reuse the stale plan
    t2 = table._replace(weight=table.weight + 1.0)
    p3 = viterbi_scan_pallas.build_plan(t2)
    assert p3 is not p1
    # replacing ANY plan-relevant field must miss (same src identity)
    for f in ("dst", "label", "start", "accept"):
        t4 = table._replace(**{f: getattr(table, f) + 0})
        assert viterbi_scan_pallas.build_plan(t4) is not (
            viterbi_scan_pallas.build_plan(table)), f
    assert float(jnp.max(jnp.abs(
        jnp.sort(p3.w_bucket) - jnp.sort(
            jnp.where(p1.w_bucket > NEG / 2, p1.w_bucket + 1.0, NEG))
    ))) < 1e-6


def test_dense_backtrace_matches_take_along_axis():
    rng = np.random.default_rng(5)
    T, B, C = 13, 4, 7
    bp = rng.integers(0, C, size=(T - 1, B, C)).astype(np.int32)
    last = rng.integers(0, C, size=(B,)).astype(np.int32)

    path = np.asarray(viterbi_scan_pallas.dense_backtrace(
        jnp.asarray(bp), jnp.asarray(last), C))

    ref = np.empty((B, T), np.int32)
    ref[:, T - 1] = last
    for t in range(T - 2, -1, -1):
        ref[:, t] = bp[t][np.arange(B), ref[:, t + 1]]
    np.testing.assert_array_equal(path, ref)

    # T == 1: no backpointers, path is just the final state
    one = np.asarray(viterbi_scan_pallas.dense_backtrace(
        jnp.zeros((0, B, C), jnp.int32), jnp.asarray(last), C))
    np.testing.assert_array_equal(one, last[:, None])


def test_asg_backtrace_variants_agree():
    # the "xla" take_along_axis walk is the compile-failure fallback of
    # the Pallas one-hot walk; both must produce identical paths
    from gtn_applications_tpu.ops import lattice

    rng = np.random.default_rng(8)
    B, T, C = 3, 9, 6
    outputs = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    trans = jnp.asarray(rng.normal(size=(C + 1, C)) * 0.3, jnp.float32)
    lens = jnp.asarray([T, T - 3, 2], jnp.int32)
    pk, sk = lattice.asg_viterbi(outputs, trans, lens, backtrace="kernel")
    px, sx = lattice.asg_viterbi(outputs, trans, lens, backtrace="xla")
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(px))
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-6)


def test_plan_rejects_blowup():
    # one destination with huge in-degree makes the dense layout explode
    n = 400
    src = jnp.asarray(np.arange(n) % 4, jnp.int32)
    dst = jnp.asarray(np.zeros(n), jnp.int32)
    label = jnp.zeros((n,), jnp.int32)
    w = jnp.zeros((n,), jnp.float32)
    start = jnp.asarray([0.0, NEG, NEG, NEG], jnp.float32)
    accept = jnp.asarray([0.0, NEG, NEG, NEG], jnp.float32)
    z = jnp.zeros((0,), jnp.int32)
    table = ArcTable(src, dst, label, w, start, accept, z, z,
                     jnp.zeros((0,), jnp.float32), eps_depth=0)
    assert viterbi_scan_pallas.build_plan(table) is None
