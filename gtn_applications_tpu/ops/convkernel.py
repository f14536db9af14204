"""Batched kernel-WFST scoring for the 1-D convolutional transducer.

Replaces the reference's ConvTransduce1D inner loops
(/root/reference/criterions/transducer.py:461-556), which intersect every
sliding window with every lexicon kernel graph one GTN call at a time in a
C++ thread pool — the most WFST-intensive op in the repo (SURVEY.md hot
loop #3).  Here all kernel graphs are compiled once into banded tables
``[V, S]`` (each kernel graph is a chain with self-loops and skips, so the
transition structure is a band of width 3) and every (batch, window,
vocab-entry) lattice is scored simultaneously with a K-step vectorized
recursion — MXU/VPU-friendly with no per-sample host work.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .semiring import NEG, logsumexp_stack


class KernelTables(NamedTuple):
    """Banded per-vocab-entry lattice tables, all [V, S]."""

    label: np.ndarray        # emission channel per state
    w_self: np.ndarray       # NEG where the self-loop is absent
    w_prev: np.ndarray       # NEG where the s-1 -> s arc is absent
    w_skip: np.ndarray       # NEG where the s-2 -> s arc is absent
    accept: np.ndarray       # 0 / NEG
    widx_self: np.ndarray    # learnable param index per arc (-1 = none)
    widx_prev: np.ndarray
    widx_skip: np.ndarray
    num_params: int


def compile_kernels(lexicon, blank_idx, blank_optional=True, spike=False):
    """Compile lexicon kernel graphs (transducer.py:351-367) to tables.

    Kernel graph for entry x: state 0 loops on blank; for each position i,
    state 2i+1 consumes x[i] (with a self-loop unless ``spike``) and state
    2i+2 loops on blank; with ``blank_optional`` a skip 2i-1 -> 2i+1 exists
    when x[i-1] != x[i], and state 2n-1 also accepts.  Arc parameter
    indices follow the reference's per-kernel arc creation order so
    learnable kernel weights line up with ``kernel_params``.
    """
    V = len(lexicon)
    S = 2 * max((len(x) for x in lexicon), default=0) + 1
    label = np.zeros((V, S), np.int32)
    w_self = np.full((V, S), NEG, np.float32)
    w_prev = np.full((V, S), NEG, np.float32)
    w_skip = np.full((V, S), NEG, np.float32)
    accept = np.full((V, S), NEG, np.float32)
    widx_self = -np.ones((V, S), np.int32)
    widx_prev = -np.ones((V, S), np.int32)
    widx_skip = -np.ones((V, S), np.int32)

    pidx = 0
    for v, x in enumerate(lexicon):
        x = list(x)
        n = len(x)
        label[v, :] = blank_idx
        # arc order matches make_kernel_graph: (0,0,blank) first
        w_self[v, 0] = 0.0
        widx_self[v, 0] = pidx
        pidx += 1
        for i, c in enumerate(x):
            s_tok, s_blk = 2 * i + 1, 2 * i + 2
            label[v, s_tok] = c
            # (2i -> 2i+1, c)
            w_prev[v, s_tok] = 0.0
            widx_prev[v, s_tok] = pidx
            pidx += 1
            if not spike:
                w_self[v, s_tok] = 0.0
                widx_self[v, s_tok] = pidx
                pidx += 1
            # (2i+1 -> 2i+2, blank)
            w_prev[v, s_blk] = 0.0
            widx_prev[v, s_blk] = pidx
            pidx += 1
            w_self[v, s_blk] = 0.0
            widx_self[v, s_blk] = pidx
            pidx += 1
            if i > 0 and blank_optional and x[i - 1] != c:
                w_skip[v, s_tok] = 0.0
                widx_skip[v, s_tok] = pidx
                pidx += 1
        accept[v, 2 * n] = 0.0
        if blank_optional and n > 0:
            accept[v, 2 * n - 1] = 0.0

    return KernelTables(
        label=label, w_self=w_self, w_prev=w_prev, w_skip=w_skip,
        accept=accept, widx_self=widx_self, widx_prev=widx_prev,
        widx_skip=widx_skip, num_params=pidx,
    )


def _arc_weights(tables: KernelTables, kernel_params):
    """Combine structural masks with learnable per-arc weights."""
    if kernel_params is None:
        return (
            jnp.asarray(tables.w_self),
            jnp.asarray(tables.w_prev),
            jnp.asarray(tables.w_skip),
        )
    p_ext = jnp.concatenate([kernel_params, jnp.zeros((1,), kernel_params.dtype)])
    np_ = tables.num_params

    def mix(base, widx):
        w = p_ext[jnp.where(widx >= 0, widx, np_)]
        return jnp.asarray(base) + w

    return (
        mix(tables.w_self, tables.widx_self),
        mix(tables.w_prev, tables.widx_prev),
        mix(tables.w_skip, tables.widx_skip),
    )


def conv_transduce_scores(
    windows, tables: KernelTables, kernel_params=None, viterbi=False
):
    """Score every window against every kernel lattice.

    Args:
      windows: [B, W, K, C] log scores (K = kernel size).
      tables: compiled kernel tables [V, S].
      kernel_params: optional learnable flat arc weights.
      viterbi: max-semiring instead of log-semiring.

    Returns: [B, W, V] forward (or Viterbi) scores, the reference's
    ConvTransduce1DFunction output (transducer.py:485-517).
    """
    B, W, K, C = windows.shape
    V, S = tables.label.shape
    w_self, w_prev, w_skip = _arc_weights(tables, kernel_params)
    label = jnp.asarray(tables.label)
    accept = jnp.asarray(tables.accept)

    # state emissions via one-hot contraction (TPU gathers are serial):
    # [B, W, K, C] x [V, S, C] -> [B, W, K, V, S]
    onehot = jax.nn.one_hot(label, C, dtype=windows.dtype)
    em = jnp.einsum(
        "bwkc,vsc->bwkvs", windows, onehot,
        precision=jax.lax.Precision.HIGHEST,
    )

    alpha = jnp.full((B, W, V, S), NEG).at[..., 0].set(0.0)

    def shift(x, k):
        return jnp.concatenate(
            [jnp.full(x.shape[:-1] + (k,), NEG), x[..., :-k]], axis=-1
        )

    combine = (
        (lambda xs: jnp.max(jnp.stack(xs, 0), axis=0)) if viterbi
        else logsumexp_stack
    )
    for k in range(K):
        stay = alpha + w_self
        prev = shift(alpha, 1) + w_prev
        skip = shift(alpha, 2) + w_skip
        alpha = em[:, :, k] + combine([stay, prev, skip])

    final = alpha + accept
    if viterbi:
        return jnp.max(final, axis=-1)
    m = jax.lax.stop_gradient(jnp.maximum(jnp.max(final, axis=-1), NEG))
    return m + jnp.log(
        jnp.maximum(jnp.sum(jnp.exp(final - m[..., None]), axis=-1), 1e-30)
    )


def make_windows(inputs, kernel_size, stride):
    """Pad by K//2 on both sides and extract strided windows.

    inputs: [B, T, C] -> [B, W, K, C] with W = (T - 1)//stride + 1.
    """
    B, T, C = inputs.shape
    if T == 0:
        raise ValueError("zero-length input")
    pad = kernel_size // 2
    x = jnp.pad(inputs, ((0, 0), (pad, pad), (0, 0)))
    Tp = T + 2 * pad
    W = (Tp - kernel_size) // stride + 1
    idx = jnp.arange(W)[:, None] * stride + jnp.arange(kernel_size)[None, :]
    return x[:, idx, :]
