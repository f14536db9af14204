"""Pallas segment-logsumexp step for generic sparse-arc lattice scans.

``seg_lse(alpha, src, dst, w, em) -> new`` computes, per batch row,
``new[s'] = logsumexp over arcs a with dst[a] == s' of
(alpha[src[a]] + w[a] + em[a])`` — the inner step of the generic WFST scan
(ops.sparse).  XLA lowers the equivalent ``jax.ops.segment_max/sum`` to
scatters, which are serial on this TPU stack (~0.1 ms per step, ~28 ms per
250-step scan); here both the source gather and the destination combine are
in-kernel one-hot masks, and the custom VJP reproduces the exact posterior
(softmax) weights.

Arc tiles are a GRID dimension with an online (running max + rescaled sum)
logsumexp merge in VMEM scratch — NOT an unrolled in-kernel chunk loop: at
a composed 200wp-LM table (~42k arcs) Mosaic stacks every unrolled chunk's
[chunk, S] temporaries simultaneously (40+ MB scoped VMEM vs the 16 MB
limit; first seen on the sibling seg_max kernel).  One tile's temporaries
(~2 MB) are all that is ever resident.

Tables may be shared across the batch (leading dim 1) or per-sample
(leading dim B), each input INDEPENDENTLY — composed per-sample lattices
carry per-sample endpoints with shared eps weights, union skeletons the
reverse.  Arc arrays are shaped [*, A, 1] so they land on sublanes without
in-kernel relayouts, and the state rides as [B, 1, S] so block shapes
satisfy Mosaic's divisibility rules.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import NEG

_FLOOR = 1e-30


def _onehot(idx_col, S):
    """[C, 1] int32 -> bool [C, S]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], S), 1)
    return cols == idx_col


def _arc_tile(A, S):
    """Largest 128-multiple arc tile whose [tile, S] transients stay
    around ~2 MB each."""
    t = max(128, (2 * 1024 * 1024 // 4) // max(S, 1) // 128 * 128)
    a_pad = -(-A // 128) * 128
    return min(t, a_pad)


def _pad_arcs(a, mult, value):
    A = a.shape[-1]
    pad = -A % mult
    if pad == 0:
        return a
    cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, cfg, constant_values=value)


def _tile_contrib(alpha, src_ref, w_ref, em_ref, S):
    src = src_ref[0]
    w = w_ref[0]
    em = em_ref[0]
    oh_src = _onehot(src, S)
    alpha_src = jnp.sum(jnp.where(oh_src, alpha, 0.0), axis=1, keepdims=True)
    return alpha_src + w + em  # [tile, 1]


def _fwd_kernel(alpha_ref, src_ref, dst_ref, w_ref, em_ref, out_ref,
                m_scr, s_scr):
    S = out_ref.shape[2]
    a = pl.program_id(1)
    alpha = alpha_ref[0]  # [1, S]

    @pl.when(a == 0)
    def _():
        m_scr[...] = jnp.full(m_scr.shape, NEG, jnp.float32)
        s_scr[...] = jnp.zeros(s_scr.shape, jnp.float32)

    contrib = _tile_contrib(alpha, src_ref, w_ref, em_ref, S)
    oh_dst = _onehot(dst_ref[0], S)
    cand = jnp.where(oh_dst, contrib, NEG)  # [tile, S]
    cmax = jnp.maximum(jnp.max(cand, axis=0, keepdims=True), NEG)
    m_old = m_scr[...]
    m_new = jnp.maximum(m_old, cmax)
    s_c = jnp.sum(
        jnp.where(oh_dst, jnp.exp(cand - m_new), 0.0), axis=0, keepdims=True
    )
    s_scr[...] = s_scr[...] * jnp.exp(m_old - m_new) + s_c
    m_scr[...] = m_new

    @pl.when(a == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = m_scr[...] + jnp.log(jnp.maximum(s_scr[...], _FLOOR))


def _bwd_kernel(
    alpha_ref, src_ref, dst_ref, w_ref, em_ref, out_ref, g_ref,
    dalpha_ref, dcontrib_ref,
):
    S = alpha_ref.shape[2]
    a = pl.program_id(1)
    alpha = alpha_ref[0]
    out = out_ref[0]
    g = g_ref[0]

    @pl.when(a == 0)
    def _():
        dalpha_ref[0] = jnp.zeros((1, S), jnp.float32)

    contrib = _tile_contrib(alpha, src_ref, w_ref, em_ref, S)
    oh_dst = _onehot(dst_ref[0], S)
    # d contrib[a] = exp(contrib[a] - out[dst[a]]) * g[dst[a]]
    ratio = jnp.exp(jnp.minimum(contrib - out, 0.0)) * g
    dcontrib = jnp.sum(jnp.where(oh_dst, ratio, 0.0), axis=1, keepdims=True)
    dcontrib_ref[0] = dcontrib
    oh_src = _onehot(src_ref[0], S)
    dalpha_ref[0] = dalpha_ref[0] + jnp.sum(
        jnp.where(oh_src, dcontrib, 0.0), axis=0, keepdims=True
    )


def _state_spec(S):
    # state is carried as [B, 1, S] so the (1, S) block's last two dims
    # equal the full array dims (Mosaic's block divisibility rule)
    return pl.BlockSpec((1, 1, S), lambda b, a: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _arc_specs(B, At, *arrays):
    arc_b = pl.BlockSpec((1, At, 1), lambda b, a: (b, a, 0),
                         memory_space=pltpu.VMEM)
    arc_s = pl.BlockSpec((1, At, 1), lambda b, a: (0, a, 0),
                         memory_space=pltpu.VMEM)
    return [arc_b if x.shape[0] == B else arc_s for x in arrays]


@jax.custom_vjp
def seg_lse(alpha, src, dst, w, em):
    """alpha [B, S]; src/dst/w/em [Ba, A], each INDEPENDENTLY batched
    (Ba in {1, B}). -> [B, S]."""
    out, _ = _seg_fwd(alpha, src, dst, w, em)
    return out


def _padded(src, dst, w, em, At):
    # padding arcs carry weight NEG and endpoints -1: they match no
    # source or destination column, so they contribute exact zeros
    return (
        _pad_arcs(src.astype(jnp.int32), At, -1),
        _pad_arcs(dst.astype(jnp.int32), At, -1),
        _pad_arcs(w, At, NEG),
        _pad_arcs(em, At, 0.0),
    )


def _seg_fwd(alpha, src, dst, w, em):
    B, S = alpha.shape
    A = src.shape[-1]
    At = _arc_tile(A, S)
    src_p, dst_p, w_p, em_p = _padded(src, dst, w, em, At)
    A_pad = src_p.shape[-1]
    state = _state_spec(S)
    specs = _arc_specs(B, At, src_p, dst_p, w_p, em_p)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
        grid=(B, A_pad // At),
        in_specs=[state] + specs,
        out_specs=state,
        scratch_shapes=[
            pltpu.VMEM((1, S), jnp.float32),
            pltpu.VMEM((1, S), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(alpha[:, None, :], src_p[..., None], dst_p[..., None],
      w_p[..., None], em_p[..., None])[:, 0, :]
    return out, (alpha, src, dst, w, em, out)


def _seg_bwd(res, g):
    alpha, src, dst, w, em, out = res
    B, S = alpha.shape
    A = src.shape[-1]
    At = _arc_tile(A, S)
    src_p, dst_p, w_p, em_p = _padded(src, dst, w, em, At)
    A_pad = src_p.shape[-1]
    state = _state_spec(S)
    specs = _arc_specs(B, At, src_p, dst_p, w_p, em_p)
    darc_spec = pl.BlockSpec((1, At, 1), lambda b, a: (b, a, 0),
                             memory_space=pltpu.VMEM)
    dalpha, dcontrib = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, A_pad, 1), jnp.float32),
        ),
        grid=(B, A_pad // At),
        in_specs=[state] + specs + [state, state],
        out_specs=(state, darc_spec),
        interpret=jax.default_backend() != "tpu",
    )(alpha[:, None, :], src_p[..., None], dst_p[..., None],
      w_p[..., None], em_p[..., None], out[:, None, :], g[:, None, :])
    dalpha = dalpha[:, 0, :]
    darc = dcontrib[:, :A, 0]
    dw = jnp.sum(darc, axis=0, keepdims=True) if w.shape[0] == 1 else darc
    dem = jnp.sum(darc, axis=0, keepdims=True) if em.shape[0] == 1 else darc
    return (dalpha, None, None, dw, dem)


seg_lse.defvjp(_seg_fwd, _seg_bwd)
