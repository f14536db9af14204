"""Differential tests for the whole-scan MXU sparse kernel.

ops/sparse_scan_pallas.py runs the full lattice scan as one Pallas launch
with one-hot-projection matmuls; these tests pin it (values and all grads)
against the pure-JAX ``forward_score`` oracle, for shared and per-sample
tables, with and without epsilon (backoff) closures, under ragged lengths.
Behavioral spec: reference criterions/transducer.py:260-296 (GTN compose +
forward_score).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gtn_applications_tpu.ops import sparse
from gtn_applications_tpu.ops.semiring import NEG
from gtn_applications_tpu.ops.sparse import ArcTable, forward_score


def _random_table(S, A, E, eps_depth, rng):
    """Feasible random acceptor: chain backbone + random extra arcs."""
    src = list(range(S - 1))
    dst = list(range(1, S))
    while len(src) < A - 2:
        src.append(int(rng.integers(0, S)))
        dst.append(int(rng.integers(0, S)))
    src += [0, S - 1]  # self loops keep every length feasible
    dst += [0, S - 1]
    n = len(src)
    label = rng.integers(0, 5, size=n).astype(np.int32)
    w = (rng.normal(size=n) * 0.5).astype(np.float32)
    if eps_depth > 0:
        esrc = rng.integers(0, S, size=E).astype(np.int32)
        edst = rng.integers(0, S, size=E).astype(np.int32)
        ew = (rng.normal(size=E) * 0.5 - 1.0).astype(np.float32)
    else:
        esrc = np.zeros((0,), np.int32)
        edst = np.zeros((0,), np.int32)
        ew = np.zeros((0,), np.float32)
    start = np.full((S,), NEG, np.float32)
    start[0] = 0.0
    accept = np.full((S,), NEG, np.float32)
    accept[S - 1] = 0.0
    accept[S - 2] = 0.0
    return ArcTable(
        jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
        jnp.asarray(label), jnp.asarray(w), jnp.asarray(start),
        jnp.asarray(accept), jnp.asarray(esrc), jnp.asarray(edst),
        jnp.asarray(ew), eps_depth=eps_depth,
    )


@pytest.fixture
def force_whole(monkeypatch):
    monkeypatch.setattr(sparse, "_SCAN_IMPL", "whole")


@pytest.mark.parametrize("eps_depth,E", [(0, 0), (1, 7), (2, 7)])
def test_whole_scan_matches_oracle_shared_table(force_whole, eps_depth, E):
    rng = np.random.default_rng(42 + eps_depth)
    B, T, S, A, C = 4, 9, 11, 30, 5
    table = _random_table(S, A, E, eps_depth, rng)
    em = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    lens = jnp.asarray([T, T - 2, T - 5, 3], jnp.int32)

    def loss_new(em, w, ew):
        t = table._replace(weight=w, eps_weight=ew)
        return jnp.sum(sparse._forward_batched_pallas(em, t, lens))

    def loss_ref(em, w, ew):
        t = table._replace(weight=w, eps_weight=ew)
        return jnp.sum(jax.vmap(
            lambda e, l: forward_score(e, t, l))(em, lens))

    args = (em, table.weight, table.eps_weight)
    v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2))(*args)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(*args)
    assert abs(float(v_new - v_ref)) < 2e-4
    for name, a, b in zip(("dem", "dw", "deps"), g_new, g_ref):
        d = float(jnp.max(jnp.abs(a - b))) if a.size else 0.0
        assert d < 2e-4, (name, d)


def test_whole_scan_matches_oracle_per_sample_tables(force_whole):
    rng = np.random.default_rng(7)
    B, T, S, A, C = 3, 7, 8, 18, 5
    tables = [_random_table(S, A, 5, 1, rng) for _ in range(B)]
    stacked = ArcTable(
        *[jnp.stack([getattr(t, f) for t in tables])
          for f in ("src", "dst", "label", "weight", "start", "accept",
                    "eps_src", "eps_dst", "eps_weight")],
        eps_depth=1,
    )
    em = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    lens = jnp.asarray([T, T - 1, 4], jnp.int32)

    def loss_new(em, w):
        t = stacked._replace(weight=w)
        return jnp.sum(sparse._forward_batched_pallas(em, t, lens))

    def loss_ref(em, w):
        outs = [
            forward_score(em[b], tables[b]._replace(weight=w[b]), lens[b])
            for b in range(B)
        ]
        return jnp.sum(jnp.stack(outs))

    v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1))(
        em, stacked.weight)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        em, stacked.weight)
    assert abs(float(v_new - v_ref)) < 2e-4
    for name, a, b in zip(("dem", "dw"), g_new, g_ref):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d < 2e-4, (name, d)


@pytest.mark.parametrize("T,S", [(1, 6), (4, 140)])
def test_whole_scan_edge_shapes(force_whole, T, S):
    # T=1 exercises the grid=(2,) block-revisit trick; S=140 exercises a
    # state vector spanning multiple 128-lane tiles (S_pad = 256)
    rng = np.random.default_rng(T * 100 + S)
    B, A, C = 3, 2 * S + 4, 5
    table = _random_table(S, A, 0, 0, rng)
    em = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    lens = jnp.asarray([T] * B, jnp.int32)

    def loss_new(em, w):
        t = table._replace(weight=w)
        return jnp.sum(sparse._forward_batched_pallas(em, t, lens))

    def loss_ref(em, w):
        t = table._replace(weight=w)
        return jnp.sum(jax.vmap(
            lambda e, l: forward_score(e, t, l))(em, lens))

    v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1))(
        em, table.weight)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        em, table.weight)
    assert abs(float(v_new - v_ref)) < 2e-4
    for a, b in zip(g_new, g_ref):
        assert float(jnp.max(jnp.abs(a - b))) < 2e-4


def test_auto_gate_budget():
    # small graphs fit; a per-sample monster graph must fall back
    assert sparse._whole_scan_fits(
        32, 128, 512, 64, per_sample=True, eps_per_sample=True, eps_depth=1)
    assert not sparse._whole_scan_fits(
        32, 4096, 8192, 0, per_sample=True, eps_per_sample=False,
        eps_depth=0)
