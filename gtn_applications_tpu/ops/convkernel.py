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


# flip to V-chunked (rematerialized) scoring when the [B, W, K, V, S]
# emission tensor would exceed this many elements (~256 MB fp32)
_CHUNK_THRESHOLD = 64_000_000
_V_CHUNK = 128


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

    Large vocabularies are processed in rematerialized V-chunks
    (jax.checkpoint over a lax.map) so neither the emission tensor nor the
    AD residuals scale with the full V.
    """
    B, W, K, C = windows.shape
    V, S = tables.label.shape
    if B * W * K * V * S > _CHUNK_THRESHOLD and V > _V_CHUNK:
        return _conv_scores_chunked(windows, tables, kernel_params, viterbi)
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


def _slice_tables(tables: KernelTables, start, size):
    return KernelTables(
        label=tables.label[start : start + size],
        w_self=tables.w_self[start : start + size],
        w_prev=tables.w_prev[start : start + size],
        w_skip=tables.w_skip[start : start + size],
        accept=tables.accept[start : start + size],
        widx_self=tables.widx_self[start : start + size],
        widx_prev=tables.widx_prev[start : start + size],
        widx_skip=tables.widx_skip[start : start + size],
        num_params=tables.num_params,
    )


def _conv_scores_chunked(windows, tables: KernelTables, kernel_params, viterbi):
    """lax.map over V-chunks, each chunk wrapped in jax.checkpoint: live
    memory and AD residuals are bounded by the chunk, at the cost of
    recomputing each chunk's forward once in the backward pass."""
    import numpy as _np

    V = tables.label.shape[0]
    pad_v = (-V) % _V_CHUNK
    if pad_v:
        dead = KernelTables(
            label=_np.zeros((pad_v, tables.label.shape[1]), _np.int32),
            w_self=_np.full((pad_v, tables.label.shape[1]), NEG, _np.float32),
            w_prev=_np.full((pad_v, tables.label.shape[1]), NEG, _np.float32),
            w_skip=_np.full((pad_v, tables.label.shape[1]), NEG, _np.float32),
            accept=_np.full((pad_v, tables.label.shape[1]), NEG, _np.float32),
            widx_self=-_np.ones((pad_v, tables.label.shape[1]), _np.int32),
            widx_prev=-_np.ones((pad_v, tables.label.shape[1]), _np.int32),
            widx_skip=-_np.ones((pad_v, tables.label.shape[1]), _np.int32),
            num_params=tables.num_params,
        )
        tables = KernelTables(
            label=_np.concatenate([tables.label, dead.label]),
            w_self=_np.concatenate([tables.w_self, dead.w_self]),
            w_prev=_np.concatenate([tables.w_prev, dead.w_prev]),
            w_skip=_np.concatenate([tables.w_skip, dead.w_skip]),
            accept=_np.concatenate([tables.accept, dead.accept]),
            widx_self=_np.concatenate([tables.widx_self, dead.widx_self]),
            widx_prev=_np.concatenate([tables.widx_prev, dead.widx_prev]),
            widx_skip=_np.concatenate([tables.widx_skip, dead.widx_skip]),
            num_params=tables.num_params,
        )
    n_chunks = tables.label.shape[0] // _V_CHUNK

    chunks = [_slice_tables(tables, i * _V_CHUNK, _V_CHUNK) for i in range(n_chunks)]
    stacked = KernelTables(
        label=jnp.stack([jnp.asarray(c.label) for c in chunks]),
        w_self=jnp.stack([jnp.asarray(c.w_self) for c in chunks]),
        w_prev=jnp.stack([jnp.asarray(c.w_prev) for c in chunks]),
        w_skip=jnp.stack([jnp.asarray(c.w_skip) for c in chunks]),
        accept=jnp.stack([jnp.asarray(c.accept) for c in chunks]),
        widx_self=jnp.stack([jnp.asarray(c.widx_self) for c in chunks]),
        widx_prev=jnp.stack([jnp.asarray(c.widx_prev) for c in chunks]),
        widx_skip=jnp.stack([jnp.asarray(c.widx_skip) for c in chunks]),
        num_params=tables.num_params,
    )

    @jax.checkpoint
    def one_chunk(fields):
        t = KernelTables(*fields, num_params=tables.num_params)
        return conv_transduce_scores(windows, t, kernel_params, viterbi)

    out = jax.lax.map(
        one_chunk,
        (
            stacked.label, stacked.w_self, stacked.w_prev, stacked.w_skip,
            stacked.accept, stacked.widx_self, stacked.widx_prev,
            stacked.widx_skip,
        ),
    )  # [n_chunks, B, W, V_CHUNK]
    out = jnp.moveaxis(out, 0, 2).reshape(
        windows.shape[0], windows.shape[1], -1
    )
    return out[:, :, :V]


def make_windows(inputs, kernel_size, stride, padded=False):
    """Pad by K//2 on both sides and extract strided windows.

    inputs: [B, T, C] -> [B, W, K, C] with W = (T - 1)//stride + 1.

    With ``padded=True`` the input already carries the K//2 frames on each
    side (the layer pads before normalization, matching the reference's
    pad-then-log_softmax order at transducer.py:437-441) and only the
    window extraction happens here.
    """
    B, T, C = inputs.shape
    if padded:
        x, Tp = inputs, T
        if Tp < kernel_size:
            raise ValueError("input shorter than one kernel window")
    else:
        if T == 0:
            raise ValueError("zero-length input")
        pad = kernel_size // 2
        x = jnp.pad(inputs, ((0, 0), (pad, pad), (0, 0)))
        Tp = T + 2 * pad
    W = (Tp - kernel_size) // stride + 1
    idx = jnp.arange(W)[:, None] * stride + jnp.arange(kernel_size)[None, :]
    return x[:, idx, :]
