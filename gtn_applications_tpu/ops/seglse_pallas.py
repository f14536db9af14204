"""Pallas segment-logsumexp step for generic sparse-arc lattice scans.

``seg_lse(alpha, src, dst, w, em) -> new`` computes, per batch row,
``new[s'] = logsumexp over arcs a with dst[a] == s' of
(alpha[src[a]] + w[a] + em[a])`` — the inner step of the generic WFST scan
(ops.sparse).  XLA lowers the equivalent ``jax.ops.segment_max/sum`` to
scatters, which are serial on this TPU stack (~0.1 ms per step, ~28 ms per
250-step scan); here both the source gather and the destination combine are
in-kernel one-hot masks with a stop-gradient per-dst max shift, and the
custom VJP reproduces the exact posterior (softmax) weights.

The [A, S] one-hot masks are materialized in VMEM one arc-chunk at a time
(two passes: chunked max, then chunked exp-sum), so graphs with tens of
thousands of arcs stay under the ~16 MB VMEM budget.

Tables may be shared across the batch (leading dim 1) or per-sample
(leading dim B); the grid index map broadcasts accordingly.  Arc arrays are
shaped [*, A, 1] so they land on sublanes without in-kernel relayouts, and
the state rides as [B, 1, S] so block shapes satisfy Mosaic's divisibility
rules.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import NEG

_FLOOR = 1e-30
# arc-chunk height: bounds the [CHUNK, S] temporaries in VMEM
_CHUNK = 2048


def _onehot(idx_col, S):
    """[C, 1] int32 -> bool [C, S]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], S), 1)
    return cols == idx_col


def _chunks(A):
    n = (A + _CHUNK - 1) // _CHUNK
    return [(i * _CHUNK, min(_CHUNK, A - i * _CHUNK)) for i in range(n)]


def _chunk_contrib(alpha, src_ref, w_ref, em_ref, off, size, S):
    src = src_ref[0, pl.ds(off, size), :]
    w = w_ref[0, pl.ds(off, size), :]
    em = em_ref[0, pl.ds(off, size), :]
    oh_src = _onehot(src, S)
    alpha_src = jnp.sum(jnp.where(oh_src, alpha, 0.0), axis=1, keepdims=True)
    return alpha_src + w + em  # [size, 1]


def _fwd_kernel(alpha_ref, src_ref, dst_ref, w_ref, em_ref, out_ref):
    S = out_ref.shape[2]
    A = src_ref.shape[1]
    alpha = alpha_ref[0]  # [1, S]

    m = jnp.full((1, S), NEG, jnp.float32)
    for off, size in _chunks(A):
        contrib = _chunk_contrib(alpha, src_ref, w_ref, em_ref, off, size, S)
        oh_dst = _onehot(dst_ref[0, pl.ds(off, size), :], S)
        cand = jnp.where(oh_dst, contrib, NEG)
        m = jnp.maximum(m, jnp.max(cand, axis=0, keepdims=True))
    m = jnp.maximum(m, NEG)

    sums = jnp.zeros((1, S), jnp.float32)
    for off, size in _chunks(A):
        contrib = _chunk_contrib(alpha, src_ref, w_ref, em_ref, off, size, S)
        oh_dst = _onehot(dst_ref[0, pl.ds(off, size), :], S)
        sums = sums + jnp.sum(
            jnp.where(oh_dst, jnp.exp(contrib - m), 0.0), axis=0, keepdims=True
        )
    out_ref[0] = m + jnp.log(jnp.maximum(sums, _FLOOR))


def _bwd_kernel(
    alpha_ref, src_ref, dst_ref, w_ref, em_ref, out_ref, g_ref,
    dalpha_ref, dcontrib_ref,
):
    S = alpha_ref.shape[2]
    A = src_ref.shape[1]
    alpha = alpha_ref[0]
    out = out_ref[0]
    g = g_ref[0]

    dalpha = jnp.zeros((1, S), jnp.float32)
    for off, size in _chunks(A):
        contrib = _chunk_contrib(alpha, src_ref, w_ref, em_ref, off, size, S)
        oh_dst = _onehot(dst_ref[0, pl.ds(off, size), :], S)
        # d contrib[a] = exp(contrib[a] - out[dst[a]]) * g[dst[a]]
        ratio = jnp.exp(jnp.minimum(contrib - out, 0.0)) * g
        dcontrib = jnp.sum(jnp.where(oh_dst, ratio, 0.0), axis=1, keepdims=True)
        dcontrib_ref[0, pl.ds(off, size), :] = dcontrib
        oh_src = _onehot(src_ref[0, pl.ds(off, size), :], S)
        dalpha = dalpha + jnp.sum(
            jnp.where(oh_src, dcontrib, 0.0), axis=0, keepdims=True
        )
    dalpha_ref[0] = dalpha


def _specs(B, S, A):
    # state is carried as [B, 1, S] so the (1, S) block's last two dims
    # equal the full array dims (Mosaic's block divisibility rule)
    state = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    arc_b = pl.BlockSpec((1, A, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    arc_s = pl.BlockSpec((1, A, 1), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    return state, arc_b, arc_s


@jax.custom_vjp
def seg_lse(alpha, src, dst, w, em):
    """alpha [B, S]; src/dst/w/em [Ba, A] with Ba in {1, B}. -> [B, S]."""
    out, _ = _seg_fwd(alpha, src, dst, w, em)
    return out


def _prep(src, dst, w, em):
    return (
        src[..., None].astype(jnp.int32), dst[..., None].astype(jnp.int32),
        w[..., None], em[..., None],
    )


def _seg_fwd(alpha, src, dst, w, em):
    B, S = alpha.shape
    Ba, A = src.shape
    src_c, dst_c, w_c, em_c = _prep(src, dst, w, em)
    state, arc_b, arc_s = _specs(B, S, A)
    tspec = arc_b if Ba == B else arc_s
    espec = arc_b if em.shape[0] == B else arc_s
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
        grid=(B,),
        in_specs=[state, tspec, tspec, tspec, espec],
        out_specs=state,
        interpret=jax.default_backend() != "tpu",
    )(alpha[:, None, :], src_c, dst_c, w_c, em_c)[:, 0, :]
    return out, (alpha, src, dst, w, em, out)


def _seg_bwd(res, g):
    alpha, src, dst, w, em, out = res
    B, S = alpha.shape
    Ba, A = src.shape
    src_c, dst_c, w_c, em_c = _prep(src, dst, w, em)
    state, arc_b, arc_s = _specs(B, S, A)
    tspec = arc_b if Ba == B else arc_s
    espec = arc_b if em.shape[0] == B else arc_s
    dalpha, dcontrib = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, A, 1), jnp.float32),
        ),
        grid=(B,),
        in_specs=[state, tspec, tspec, tspec, espec, state, state],
        out_specs=(
            state,
            pl.BlockSpec((1, A, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != "tpu",
    )(alpha[:, None, :], src_c, dst_c, w_c, em_c, out[:, None, :],
      g[:, None, :])
    dalpha = dalpha[:, 0, :]
    darc = dcontrib[:, :, 0]
    dw = jnp.sum(darc, axis=0, keepdims=True) if Ba == 1 else darc
    dem = jnp.sum(darc, axis=0, keepdims=True) if em.shape[0] == 1 else darc
    return (dalpha, None, None, dw, dem)


seg_lse.defvjp(_seg_fwd, _seg_bwd)
