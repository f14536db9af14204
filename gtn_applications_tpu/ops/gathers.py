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
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_fwd_kernel(x_ref, lab_ref, out_ref):
    # x [T, C], lab [S, 1] -> onehot [S, C] -> out [T, S]
    x = x_ref[0]
    lab = lab_ref[0]
    S, C = lab.shape[0], x.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, C), dimension=1)
    onehot = (cols == lab).astype(x.dtype)
    out_ref[0] = jax.lax.dot_general(
        x, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_bwd_kernel(g_ref, lab_ref, out_ref):
    # g [T, S], lab [1, S] -> onehot_t [C, S] -> dx [T, C]
    g = g_ref[0]
    lab = lab_ref[0]
    C, S = out_ref.shape[2], g.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, S), dimension=0)
    onehot_t = (rows == lab).astype(g.dtype)
    out_ref[0] = jax.lax.dot_general(
        g, onehot_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _call(kernel, x, lab, out_cols):
    B, T, _ = x.shape
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, out_cols), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1,) + x.shape[1:], lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1,) + lab.shape[1:], lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T, out_cols), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, lab)


@jax.custom_vjp
def gather_channels_mxu(x, idx):
    """x: [B, T, C], idx: [B, S] -> [B, T, S] with out[b,t,s] = x[b,t,idx[b,s]]."""
    out, _ = _fwd(x, idx)
    return out


def _fwd(x, idx):
    idx = idx.astype(jnp.int32)
    out = _call(_gather_fwd_kernel, x, idx[:, :, None], idx.shape[-1])
    return out, (idx, x.shape[-1])


def _bwd(res, g):
    idx, C = res
    dx = _call(_gather_bwd_kernel, g, idx[:, None, :], C)
    return dx, None


gather_channels_mxu.defvjp(_fwd, _bwd)
