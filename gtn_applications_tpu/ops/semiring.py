"""Log and tropical semiring primitives for lattice dynamic programs.

These are the numeric building blocks that replace the GTN C++ library's
log-semiring ``forward_score`` / ``viterbi_score`` shortest-distance routines
(reference: gtn calls in /root/reference/criterions/ctc.py:50,
asg.py:111-115, stc.py:86, transducer.py:283-288).

Design notes (TPU-first):
  * All state values live in fp32.  We avoid true ``-inf`` and use a large
    finite negative constant ``NEG`` so that dead lattice states never produce
    NaNs in either the forward scan or its transpose (the backward scan XLA
    derives is exactly the beta recursion / posterior computation).
  * ``logsumexp`` is implemented with an explicit stop-gradient max shift so
    the derived gradient is the numerically stable softmax form.
"""

import jax
import jax.numpy as jnp

# Large finite stand-in for log(0).  exp(NEG - finite) == 0 in fp32 and
# NEG + NEG does not overflow to -inf, keeping gradients NaN-free.
NEG = -1e30

# Entries at or below this are semiring zero.  Reductions mask them with
# exact 0 weights: without the mask, a row whose entries are ALL dead has
# its max clamped to NEG, every exp(x - m) evaluates to exp(0) = 1, and
# the derived softmax gradient spreads uniform garbage weights over dead
# paths (e.g. an infeasible sample in a training batch would push real
# gradients into learned transition weights).  Live lattice scores are
# bounded by T * max|w + em| << 1e20, so the threshold is unambiguous.
DEAD = -1e28


def _stable_shift(m):
    # Keep the shift finite even when every input is NEG.
    return jax.lax.stop_gradient(jnp.maximum(m, NEG))


# Sum floor: keeps log() away from 0 when every input underflows (values far
# below the clamped max).  Must be a NORMAL fp32 number — subnormals are
# flushed to zero by XLA — and the resulting log-of-floor only shifts scores
# already at the NEG sentinel.  Without it the log's gradient at 0 is inf
# and inf * 0 contributions turn into NaN in the backward scan.
_FLOOR = 1e-30


def logaddexp(a, b):
    """Numerically stable log(exp(a) + exp(b)) safe at NEG (dead-masked)."""
    m = _stable_shift(jnp.maximum(a, b))
    s = jnp.where(a > DEAD, jnp.exp(a - m), 0.0) + jnp.where(
        b > DEAD, jnp.exp(b - m), 0.0
    )
    return jnp.where(s > 0.0, m + jnp.log(jnp.maximum(s, _FLOOR)), NEG)


def logsumexp_stack(xs):
    """Stable logsumexp over a list of same-shaped arrays (stacked axis 0)."""
    x = jnp.stack(xs, axis=0)
    m = _stable_shift(jnp.max(x, axis=0))
    s = jnp.sum(jnp.where(x > DEAD, jnp.exp(x - m), 0.0), axis=0)
    return jnp.where(s > 0.0, m + jnp.log(jnp.maximum(s, _FLOOR)), NEG)


def logsumexp(x, axis=-1, keepdims=False):
    """Stable logsumexp along ``axis`` safe when all entries are NEG."""
    m = _stable_shift(jnp.max(x, axis=axis, keepdims=True))
    s = jnp.sum(
        jnp.where(x > DEAD, jnp.exp(x - m), 0.0), axis=axis, keepdims=True
    )
    out = jnp.where(s > 0.0, m + jnp.log(jnp.maximum(s, _FLOOR)), NEG)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def segment_logsumexp(values, segment_ids, num_segments, indices_are_sorted=False):
    """logsumexp of ``values`` grouped by ``segment_ids`` -> [num_segments].

    Used by the generic sparse-arc lattice scan: combine all arc
    contributions entering the same destination state.  Works on batched
    values via vmap.  Stable: per-segment max shift.
    """
    seg_max = jax.ops.segment_max(
        values, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    seg_max = _stable_shift(jnp.maximum(seg_max, NEG))
    shifted = jnp.where(
        values > DEAD, jnp.exp(values - seg_max[segment_ids]), 0.0
    )
    sums = jax.ops.segment_sum(
        shifted, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    # Floor must stay a NORMAL fp32 number: subnormals (e.g. 1e-38) are
    # flushed to zero by XLA, turning the log into -inf and its gradient
    # into NaN for empty segments.
    return jnp.where(
        sums > 0.0, seg_max + jnp.log(jnp.maximum(sums, 1e-30)), NEG
    )


def gather_channels(x, idx, batched=True):
    """MXU-friendly channel gather: x[..., idx] via one-hot contraction.

    XLA lowers general gathers to a serial scalar loop on TPU (measured
    ~50 ms for a [32, 250, 89] gather), and it also pattern-matches a jnp
    ``dot(x, one_hot(idx))`` back into that gather — so on TPU this routes
    through an explicit Pallas matmul kernel (ops.gathers, ~0.1 ms);
    elsewhere it uses a plain dot_general.

    Args:
      x: [B, T, C] (batched=True) or [T, C].
      idx: [B, S] (batched) or [S] int labels into C.
    Returns: [B, T, S] or [T, S].
    """
    if jax.default_backend() == "tpu":
        from .gathers import gather_channels_mxu

        if batched:
            return gather_channels_mxu(x, idx)
        return gather_channels_mxu(x[None], idx[None])[0]

    C = x.shape[-1]
    onehot = jax.nn.one_hot(idx, C, dtype=x.dtype)
    if batched:
        return jax.lax.dot_general(
            x, onehot, (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )
    return jax.lax.dot_general(
        x, onehot, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def segment_max(values, segment_ids, num_segments, indices_are_sorted=False):
    out = jax.ops.segment_max(
        values, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    return jnp.maximum(out, NEG)
