"""Pallas tropical (max, +) step with backpointers for sparse Viterbi.

``seg_max(alpha, src, dst, w, em) -> (new, best_arc)`` computes, per batch
row, ``new[s'] = max over arcs a with dst[a] == s' of (alpha[src[a]] +
w[a] + em[a])`` and the index of the winning arc (ties break to the lowest
arc id, matching ops.sparse.viterbi's segment_min tie-break).  Same
in-kernel one-hot construction as seglse_pallas.

Arc tiles are a GRID dimension, not an unrolled in-kernel loop: at a
composed 200wp-LM decode table (~42k arcs) the unrolled chunk chain made
Mosaic stack every chunk's [chunk, S] intermediates at once (40.8 MB
scoped VMEM vs the 16 MB limit).  Running (best, best_arc) persist in the
output blocks across arc tiles; processing tiles in increasing arc order
with a strict ``>`` merge keeps the lowest-arc-id tie-break exact.
Forward-only (decode path).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import NEG

_BIG = 2**30  # plain int: jnp scalars would be captured kernel constants


def _onehot(idx_col, S):
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], S), 1)
    return cols == idx_col


def _arc_tile(A, S):
    """Largest 128-multiple arc tile whose [tile, S] transients stay
    around ~2 MB each."""
    t = max(128, (2 * 1024 * 1024 // 4) // max(S, 1) // 128 * 128)
    a_pad = -(-A // 128) * 128
    return min(t, a_pad)


def _kernel(alpha_ref, src_ref, dst_ref, w_ref, em_ref, out_ref, arc_ref):
    S = out_ref.shape[2]
    size = src_ref.shape[1]
    off = pl.program_id(1) * size
    alpha = alpha_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.full((1, S), NEG, jnp.float32)
        arc_ref[0] = jnp.full((1, S), _BIG, jnp.int32)

    src = src_ref[0]
    w = w_ref[0]
    em = em_ref[0]
    oh_src = _onehot(src, S)
    alpha_src = jnp.sum(jnp.where(oh_src, alpha, 0.0), axis=1, keepdims=True)
    contrib = alpha_src + w + em  # [size, 1]
    oh_dst = _onehot(dst_ref[0], S)
    cand = jnp.where(oh_dst, contrib, NEG)  # [size, S]
    cmax = jnp.max(cand, axis=0, keepdims=True)  # [1, S]
    ids = jax.lax.broadcasted_iota(jnp.int32, (size, S), 0) + off
    cargs = jnp.min(
        jnp.where(cand >= cmax, ids, _BIG), axis=0, keepdims=True
    )
    best = out_ref[0]
    take = cmax > best
    arc_ref[0] = jnp.where(take, cargs, arc_ref[0])
    out_ref[0] = jnp.maximum(jnp.maximum(best, cmax), NEG)


def _pad_arcs(a, mult, value):
    A = a.shape[-1]
    pad = -A % mult
    if pad == 0:
        return a
    cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, cfg, constant_values=value)


def seg_max(alpha, src, dst, w, em):
    """alpha [B, S]; src/dst/w/em [Ba, A], each independently batched
    (Ba in {1, B}) -> (new [B, S], best_arc [B, S] int32 with 2^30
    marking dead states)."""
    B, S = alpha.shape
    A = src.shape[-1]
    At = _arc_tile(A, S)
    # padding arcs carry weight NEG and endpoints -1: they match no
    # destination column, so they can never win a state
    src = _pad_arcs(src.astype(jnp.int32), At, -1)
    dst = _pad_arcs(dst.astype(jnp.int32), At, -1)
    w = _pad_arcs(w, At, NEG)
    em = _pad_arcs(em, At, 0.0)
    A_pad = src.shape[-1]
    state = pl.BlockSpec((1, 1, S), lambda b, a: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    arc_b = pl.BlockSpec((1, At, 1), lambda b, a: (b, a, 0),
                         memory_space=pltpu.VMEM)
    arc_s = pl.BlockSpec((1, At, 1), lambda b, a: (0, a, 0),
                         memory_space=pltpu.VMEM)
    sspec = arc_b if src.shape[0] == B else arc_s
    dspec = arc_b if dst.shape[0] == B else arc_s
    wspec = arc_b if w.shape[0] == B else arc_s
    espec = arc_b if em.shape[0] == B else arc_s
    out, arc = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, S), jnp.int32),
        ),
        grid=(B, A_pad // At),
        in_specs=[state, sspec, dspec, wspec, espec],
        out_specs=(state, state),
        interpret=jax.default_backend() != "tpu",
    )(
        alpha[:, None, :],
        src[..., None],
        dst[..., None],
        w[..., None],
        em[..., None],
    )
    return out[:, 0, :], arc[:, 0, :]
