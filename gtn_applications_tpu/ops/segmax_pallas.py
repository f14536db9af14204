"""Pallas tropical (max, +) step with backpointers for sparse Viterbi.

``seg_max(alpha, src, dst, w, em) -> (new, best_arc)`` computes, per batch
row, ``new[s'] = max over arcs a with dst[a] == s' of (alpha[src[a]] +
w[a] + em[a])`` and the index of the winning arc (ties break to the lowest
arc id, matching ops.sparse.viterbi's segment_min tie-break).  Same
in-kernel one-hot chunking as seglse_pallas; forward-only (decode path).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import NEG

_CHUNK = 2048
_BIG = 2**30  # plain int: jnp scalars would be captured kernel constants


def _onehot(idx_col, S):
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], S), 1)
    return cols == idx_col


def _chunks(A):
    n = (A + _CHUNK - 1) // _CHUNK
    return [(i * _CHUNK, min(_CHUNK, A - i * _CHUNK)) for i in range(n)]


def _kernel(alpha_ref, src_ref, dst_ref, w_ref, em_ref, out_ref, arc_ref):
    S = out_ref.shape[2]
    A = src_ref.shape[1]
    alpha = alpha_ref[0]

    best = jnp.full((1, S), NEG, jnp.float32)
    best_arc = jnp.full((1, S), _BIG, jnp.int32)
    for off, size in _chunks(A):
        src = src_ref[0, pl.ds(off, size), :]
        w = w_ref[0, pl.ds(off, size), :]
        em = em_ref[0, pl.ds(off, size), :]
        oh_src = _onehot(src, S)
        alpha_src = jnp.sum(jnp.where(oh_src, alpha, 0.0), axis=1, keepdims=True)
        contrib = alpha_src + w + em  # [size, 1]
        oh_dst = _onehot(dst_ref[0, pl.ds(off, size), :], S)
        cand = jnp.where(oh_dst, contrib, NEG)  # [size, S]
        cmax = jnp.max(cand, axis=0, keepdims=True)  # [1, S]
        ids = jax.lax.broadcasted_iota(jnp.int32, (size, S), 0) + off
        cargs = jnp.min(
            jnp.where(cand >= cmax, ids, _BIG), axis=0, keepdims=True
        )
        take = cmax > best
        best_arc = jnp.where(take, cargs, best_arc)
        best = jnp.maximum(best, cmax)
    out_ref[0] = jnp.maximum(best, NEG)
    arc_ref[0] = best_arc


def seg_max(alpha, src, dst, w, em):
    """alpha [B, S]; src/dst/w/em [Ba, A], Ba in {1, B} ->
    (new [B, S], best_arc [B, S] int32 with 2^30 marking dead states)."""
    B, S = alpha.shape
    Ba, A = src.shape
    state = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    arc_b = pl.BlockSpec((1, A, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    arc_s = pl.BlockSpec((1, A, 1), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    tspec = arc_b if Ba == B else arc_s
    espec = arc_b if em.shape[0] == B else arc_s
    out, arc = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, S), jnp.int32),
        ),
        grid=(B,),
        in_specs=[state, tspec, tspec, tspec, espec],
        out_specs=(state, state),
        interpret=jax.default_backend() != "tpu",
    )(
        alpha[:, None, :],
        src[..., None].astype(jnp.int32),
        dst[..., None].astype(jnp.int32),
        w[..., None],
        em[..., None],
    )
    return out[:, 0, :], arc[:, 0, :]
