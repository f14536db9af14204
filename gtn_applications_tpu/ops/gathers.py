"""MXU channel gather: x[..., idx] as an explicit one-hot matmul kernel.

XLA lowers general gathers on TPU to a serial scalar loop (~50 ms for a
[32, 250, 89] gather), pattern-matches ``dot(x, one_hot(idx))`` back into
that same gather, and even materializing the one-hot with elementwise ops
feeding a custom call picks a pathological relayout path (~30 ms).  So the
one-hot never exists at the XLA level at all: only the integer labels cross
the Pallas boundary, the kernel builds the 0/1 matrix in VMEM with an iota
compare, and contracts on the MXU at HIGHEST precision (exact for one-hot
operands).  The custom VJP mirrors the construction in the transposed
orientation so both directions contract along lanes.  Measured: 0.1 ms
forward, 0.1 ms backward for [32, 250, 80] -> [32, 250, 89].

The gather axis is tiled across a second grid dimension so huge index
vectors stay within the scoped-VMEM budget: a composed 200-wordpiece-LM
decode table gathers ~42k arcs per frame, and a single [T, S] output
block (16.7 MB) plus its [S, C] one-hot (33.6 MB) would blow the 16 MB
scoped limit the way one whole-batch block did before tiling.  Padding
columns carry index -1 (matches no channel -> exact zeros), and the
backward accumulates dx across column tiles in a block that persists
over the inner grid dimension.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_fwd_kernel(x_ref, lab_ref, out_ref):
    # x [T, C], lab [St, 1] -> onehot [St, C] -> out [T, St]
    x = x_ref[0]
    lab = lab_ref[0]
    St, C = lab.shape[0], x.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (St, C), dimension=1)
    onehot = (cols == lab).astype(x.dtype)
    out_ref[0] = jax.lax.dot_general(
        x, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_bwd_kernel(g_ref, lab_ref, out_ref):
    # g [T, St], lab [1, St] -> onehot_t [C, St] -> dx [T, C] accumulated
    # across column tiles (the dx block persists over grid dim 1)
    g = g_ref[0]
    lab = lab_ref[0]
    C, St = out_ref.shape[2], g.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, St), dimension=0)
    onehot_t = (rows == lab).astype(g.dtype)
    dx = jax.lax.dot_general(
        g, onehot_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    out_ref[0] = out_ref[0] + dx


def _col_tile(T, C, S):
    """Largest 128-multiple column tile whose [T, St] out block and
    [St, C] one-hot each stay under ~2 MB of VMEM."""
    budget = 2 * 1024 * 1024 // 4
    t = max(128, budget // max(T, C) // 128 * 128)
    s_pad = -(-S // 128) * 128
    return min(t, s_pad)


def _pad_cols(a, mult, value):
    S = a.shape[-1]
    pad = -S % mult
    if pad == 0:
        return a
    cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    return jnp.pad(a, cfg, constant_values=value)


def _fwd(x, idx):
    idx = idx.astype(jnp.int32)
    B, T, C = x.shape
    S = idx.shape[-1]
    St = _col_tile(T, C, S)
    idx_p = _pad_cols(idx, St, -1)
    S_pad = idx_p.shape[-1]
    out = pl.pallas_call(
        _gather_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, S_pad), jnp.float32),
        grid=(B, S_pad // St),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, 1), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, St), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x, idx_p[:, :, None])
    if S_pad != S:
        out = out[..., :S]
    return out, (idx, C)


def _bwd(res, g):
    idx, C = res
    B, T, S = g.shape
    St = _col_tile(T, C, S)
    idx_p = _pad_cols(idx.astype(jnp.int32), St, -1)
    g_p = _pad_cols(g, St, 0.0)
    S_pad = idx_p.shape[-1]
    dx = pl.pallas_call(
        _gather_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        grid=(B, S_pad // St),
        in_specs=[
            pl.BlockSpec((1, T, St), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, St), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(g_p, idx_p[:, None, :])
    return dx, None


@jax.custom_vjp
def gather_channels_mxu(x, idx):
    """x: [B, T, C], idx: [B, S] -> [B, T, S] with out[b,t,s] = x[b,t,idx[b,s]]."""
    out, _ = _fwd(x, idx)
    return out


gather_channels_mxu.defvjp(_fwd, _bwd)
