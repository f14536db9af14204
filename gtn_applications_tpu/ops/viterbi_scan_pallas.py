"""Whole-scan MXU Pallas kernel for tropical (Viterbi) sparse decoding.

The per-step ``seg_max`` path (ops.segmax_pallas under ``lax.scan``) pays
one kernel dispatch per frame (~40-100 us) and does all segment work as
VPU one-hot masking.  This module runs the entire tropical scan as ONE
Pallas launch by laying the arc table out as a dense in-degree bucket
grid: slot ``d`` of destination state ``s`` lives at column
``d * S_pad + s``, so

    asrc[b, :]    = (alpha @ P_src)[b, :]          (MXU one-hot gather)
    contrib       = asrc + w + em                  [B, D * S_pad]
    new[b, s]     = max_d contrib[b, d * S_pad + s]   (D static slices)
    slot[b, s]    = argmax_d ...                   (backpointer)

``P_src`` is the ``[S_pad, D * S_pad]`` f32 one-hot of the bucketed
source states (built in-jit from the integer plan, fused by XLA).  Empty
slots carry weight NEG so they can never win.  The time axis is the grid
dimension with a VMEM scratch alpha carry; per-frame emissions stream in
and per-frame backpointer slots stream out as grid-indexed blocks.
Ties break to the lowest slot ``d``; buckets are filled in increasing
original-arc-id order, so this matches the per-step path's lowest-arc-id
tie-break (ops/sparse.py viterbi, reference transducer.py:199-234 via
``gtn.viterbi_path``).

The backtrace is a second reverse-grid launch that carries the state as
a one-hot row (``_backtrace_kernel``) — no serial scalar gathers anywhere
in the decode.  ``dense_backtrace`` exposes the same walk for dense
prev-state tables (ASG).  Forward-only (decode path).
"""

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import NEG, gather_channels

_DEAD = 2**30  # backpointer sentinel: unreachable / beyond-length frame
_VMEM_BUDGET = 64 * 1024 * 1024
# dense bucket layout may blow A up to D_max * S_pad; beyond this ratio
# the padding waste outweighs the dispatch savings — use the step path
_MAX_BLOWUP = 16


def _interpret():
    return jax.default_backend() != "tpu"


def _compiler_params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


class _Plan:
    """Host-side dense bucket layout of a shared epsilon-free arc table."""

    __slots__ = (
        "src_bucket", "label_bucket", "w_bucket", "start_p", "accept_p",
        "S_pad", "D", "table_ref",
    )


_PLAN_CACHE = collections.OrderedDict()
_PLAN_CACHE_MAX = 8


def build_plan(table):
    """Bucket ``table``'s arcs by destination into a [D, S_pad] slot grid.

    Returns a cached ``_Plan`` (keyed by table array identity) or ``None``
    when the dense layout does not fit the VMEM/blow-up budget.
    """
    # the plan derives from six table fields; a cache hit requires ALL of
    # them to be the same array objects (a _replace of any one field must
    # miss), so compare identity field by field against the cached table
    fields = ("src", "dst", "label", "weight", "start", "accept")
    key = id(table.src)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and all(
        getattr(hit.table_ref, f) is getattr(table, f) for f in fields
    ):
        _PLAN_CACHE.move_to_end(key)
        return hit

    src = np.asarray(table.src)
    dst = np.asarray(table.dst)
    label = np.asarray(table.label)
    weight = np.asarray(table.weight)
    start = np.asarray(table.start)
    accept = np.asarray(table.accept)
    A = src.shape[0]
    S = start.shape[0]
    S_pad = S + (-S) % 128

    # drop padding arcs (weight == NEG) before computing the degree bound
    real = weight > NEG / 2
    src, dst, label, weight = src[real], dst[real], label[real], weight[real]
    if src.size == 0:
        return None
    deg = np.bincount(dst, minlength=S)
    D = int(deg.max())
    A_dense = D * S_pad
    # the 8 * S_pad floor keeps small graphs (where lane padding to 128
    # dominates any in-degree skew) on the whole-scan path
    if A_dense > max(_MAX_BLOWUP * A, 8 * S_pad):
        return None
    # resident VMEM: P_src + contrib/asrc/w rows (B unknown here; assume 64)
    resident = 4 * (S_pad * A_dense + 4 * 64 * A_dense)
    if resident > _VMEM_BUDGET:
        return None

    src_b = np.zeros((A_dense,), np.int32)
    label_b = np.zeros((A_dense,), np.int32)
    w_b = np.full((A_dense,), NEG, np.float32)
    # increasing-arc-id fill per destination => lowest slot == lowest arc id
    order = np.argsort(dst, kind="stable")
    sorted_dst = dst[order]
    _, first = np.unique(sorted_dst, return_index=True)
    group_sizes = np.diff(np.append(first, len(sorted_dst)))
    d_sorted = np.arange(len(sorted_dst)) - np.repeat(first, group_sizes)
    d_idx = np.empty((len(sorted_dst),), np.int64)
    d_idx[order] = d_sorted
    pos = d_idx * S_pad + dst
    src_b[pos] = src
    label_b[pos] = label
    w_b[pos] = weight

    start_p = np.full((S_pad,), NEG, np.float32)
    start_p[:S] = start
    accept_p = np.full((S_pad,), NEG, np.float32)
    accept_p[:S] = accept

    plan = _Plan()
    plan.src_bucket = jnp.asarray(src_b)
    plan.label_bucket = jnp.asarray(label_b)
    plan.w_bucket = jnp.asarray(w_b)
    plan.start_p = jnp.asarray(start_p)
    plan.accept_p = jnp.asarray(accept_p)
    plan.S_pad = S_pad
    plan.D = D
    plan.table_ref = table
    _PLAN_CACHE[key] = plan
    if len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
        _PLAN_CACHE.popitem(last=False)
    return plan


def _vit_kernel(D, S_pad,
                alpha0_ref, em_ref, p_src_ref, w_ref, len_ref,
                slots_ref, final_ref, alpha_scr):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        alpha_scr[...] = alpha0_ref[...]
        slots_ref[0] = jnp.full(slots_ref.shape[1:], _DEAD, jnp.int32)

    @pl.when(i > 0)
    def _():
        alpha = alpha_scr[...]
        asrc = jax.lax.dot_general(
            alpha, p_src_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        contrib = asrc + w_ref[...] + em_ref[0]  # [B, D * S_pad]
        best = contrib[:, :S_pad]
        best_d = jnp.zeros(best.shape, jnp.int32)
        for d in range(1, D):
            cur = contrib[:, d * S_pad:(d + 1) * S_pad]
            take = cur > best
            best_d = jnp.where(take, jnp.int32(d), best_d)
            best = jnp.maximum(best, cur)
        best = jnp.maximum(best, NEG)
        valid = best > NEG
        t = i - 1
        live = (t * jnp.ones_like(len_ref[...])) < len_ref[...]  # [B, 1]
        alpha_scr[...] = jnp.where(live, best, alpha)
        slots_ref[0] = jnp.where(
            live & valid, best_d, jnp.int32(_DEAD)
        )

    final_ref[...] = alpha_scr[...]


def _backtrace_kernel(D, S_pad,
                      state0_ref, slots_ref, srcb_ref, labb_ref,
                      lab_ref, state_scr):
    """Reverse walk of the backpointer slots without host-visible gathers.

    The current state is carried as a one-hot f32 row [B, S_pad]; the slot
    lookup, the bucketed source/label selection, and the state update are
    all one-hot reductions / a tiny [B, D] x [D, S_pad] matmul, which stay
    on the VPU/MXU instead of XLA's serial scalar gather loops.  Grid step
    ``i`` processes frame ``t = T - 1 - i`` and writes ``lab[t]`` directly.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state_scr[...] = state0_ref[...]

    state_oh = state_scr[...]                       # [B, S_pad] one-hot
    slots = slots_ref[0].astype(jnp.float32)        # [B, S_pad]
    d = jnp.sum(state_oh * slots, axis=1, keepdims=True)  # [B, 1]
    valid = d < float(_DEAD)
    # Mosaic's tpu.iota is integer-only; build i32 and convert
    d_iota = jax.lax.broadcasted_iota(
        jnp.int32, (state_oh.shape[0], D), 1).astype(jnp.float32)
    d_oh = jnp.where(d_iota == d, 1.0, 0.0)         # [B, D]
    # rows of the [D, S_pad] bucket tables for each sample's winning slot
    src_rows = jax.lax.dot_general(
        d_oh, srcb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    lab_rows = jax.lax.dot_general(
        d_oh, labb_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    prev = jnp.sum(state_oh * src_rows, axis=1, keepdims=True)  # [B, 1]
    lab = jnp.sum(state_oh * lab_rows, axis=1, keepdims=True)
    lab = jnp.where(valid, lab, -1.0)
    s_iota = jax.lax.broadcasted_iota(
        jnp.int32, state_oh.shape, 1).astype(jnp.float32)
    prev_oh = jnp.where(s_iota == prev, 1.0, 0.0)
    state_scr[...] = jnp.where(valid, prev_oh, state_oh)
    lab_ref[0] = jnp.broadcast_to(
        lab.astype(jnp.int32), lab_ref.shape[1:]
    )


def _dense_bt_kernel(state0_ref, bp_ref, path_ref, first_ref, state_scr):
    """Dense backpointer walk (ASG-style [T-1, B, C] prev-state tables).

    Grid step ``i`` consumes bp[T-2-i] and writes path[T-1-i]; the final
    carry (the frame-0 state) lands in ``first_ref``.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state_scr[...] = state0_ref[...]

    state_oh = state_scr[...]  # [B, C_pad] one-hot f32
    # Mosaic's tpu.iota is integer-only; build i32 and convert
    iota = jax.lax.broadcasted_iota(
        jnp.int32, state_oh.shape, 1
    ).astype(jnp.float32)
    s_idx = jnp.sum(state_oh * iota, axis=1, keepdims=True)  # [B, 1]
    path_ref[0] = jnp.broadcast_to(
        s_idx.astype(jnp.int32), path_ref.shape[1:]
    )
    bp = bp_ref[0].astype(jnp.float32)
    prev = jnp.sum(state_oh * bp, axis=1, keepdims=True)
    state_scr[...] = jnp.where(iota == prev, 1.0, 0.0)
    first_ref[...] = jnp.broadcast_to(
        prev.astype(jnp.int32), first_ref.shape
    )


def dense_backtrace(backptrs, last_state, num_classes):
    """Walk dense prev-state backpointers without serial scalar gathers.

    Args:
      backptrs: [T-1, B, C] int32 — prev state entering each frame.
      last_state: [B] int32 — argmax state at the final frame.
      num_classes: C (static).
    Returns path [B, T] int32.
    """
    Tm1, B, C = backptrs.shape
    T = Tm1 + 1
    if Tm1 == 0:
        return last_state[:, None]
    C_pad = C + (-C) % 128
    bp_p = jnp.pad(backptrs, ((0, 0), (0, 0), (0, C_pad - C)))
    state0_oh = jax.nn.one_hot(last_state, C_pad, dtype=jnp.float32)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec(
        (1, B, C_pad), lambda i: (Tm1 - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    path_spec = pl.BlockSpec(
        (1, B, 128), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    path, first = pl.pallas_call(
        _dense_bt_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ),
        grid=(Tm1,),
        in_specs=[full((B, C_pad)), bp_spec],
        out_specs=(path_spec, full((B, 128))),
        scratch_shapes=[pltpu.VMEM((B, C_pad), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(state0_oh, bp_p)
    path = path[:, :, 0].transpose(1, 0)  # [B, T]; column 0 is garbage
    return jnp.concatenate([first[:, :1], path[:, 1:]], axis=1)


def _viterbi_whole(em, src_bucket, label_bucket, w_bucket, start_p,
                   accept_p, lens):
    """Jittable whole-scan Viterbi.  Shapes carry the static plan params:
    S_pad = start_p.shape[0], D = src_bucket.shape[0] // S_pad."""
    B, T, C = em.shape
    S_pad = start_p.shape[0]
    A_dense = src_bucket.shape[0]
    D = A_dense // S_pad

    label_full = jnp.broadcast_to(label_bucket[None], (B, A_dense))
    em_arc = gather_channels(em, label_full).transpose(1, 0, 2)  # [T,B,A]
    p_src = jax.nn.one_hot(src_bucket, S_pad, axis=0, dtype=jnp.float32)
    w_full = jnp.broadcast_to(w_bucket[None], (B, A_dense))
    alpha0 = jnp.broadcast_to(start_p[None], (B, S_pad))
    lens_f = lens.astype(jnp.float32)[:, None]

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    em_spec = pl.BlockSpec(
        (1, B, A_dense), lambda i: (jnp.maximum(i, 1) - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )
    slot_spec = pl.BlockSpec(
        (1, B, S_pad), lambda i: (jnp.maximum(i, 1) - 1, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_vit_kernel, D, S_pad)
    slots, final = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, S_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, S_pad), jnp.float32),
        ),
        grid=(T + 1,),
        in_specs=[
            full((B, S_pad)), em_spec, full((S_pad, A_dense)),
            full((B, A_dense)), full((B, 1)),
        ],
        out_specs=(slot_spec, full((B, S_pad))),
        scratch_shapes=[pltpu.VMEM((B, S_pad), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(alpha0, em_arc, p_src, w_full, lens_f)

    scored = final + accept_p[None]
    state = jnp.argmax(scored, axis=-1).astype(jnp.int32)
    score = jnp.max(scored, axis=-1)

    state0_oh = jax.nn.one_hot(state, S_pad, dtype=jnp.float32)
    srcb2d = src_bucket.reshape(D, S_pad).astype(jnp.float32)
    labb2d = label_bucket.reshape(D, S_pad).astype(jnp.float32)
    rev_slot = pl.BlockSpec(
        (1, B, S_pad), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    lab_spec = pl.BlockSpec(
        (1, B, 128), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    bt_kernel = functools.partial(_backtrace_kernel, D, S_pad)
    labels = pl.pallas_call(
        bt_kernel,
        out_shape=jax.ShapeDtypeStruct((T, B, 128), jnp.int32),
        grid=(T,),
        in_specs=[
            full((B, S_pad)), rev_slot, full((D, S_pad)), full((D, S_pad)),
        ],
        out_specs=lab_spec,
        scratch_shapes=[pltpu.VMEM((B, S_pad), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(state0_oh, slots, srcb2d, labb2d)
    return labels[:, :, 0].transpose(1, 0), score


_viterbi_whole_jit = jax.jit(_viterbi_whole)


def viterbi_scan(em, plan: _Plan, input_lengths=None):
    """Decode ``em [B, T, C]`` against a bucketed plan.  Returns
    (labels [B, T] int32 with -1 beyond length, score [B])."""
    B, T, _ = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)
    labels, score = _viterbi_whole_jit(
        em, plan.src_bucket, plan.label_bucket, plan.w_bucket,
        plan.start_p, plan.accept_p, jnp.asarray(input_lengths),
    )
    # infeasible samples (no accepting path) decode to the empty path —
    # the backtrace from an arbitrary argmax state is meaningless there
    labels = jnp.where((score > NEG / 2)[:, None], labels, -1)
    return labels, score
