"""Generic sparse-arc lattice scan: forward score and Viterbi over compiled WFSTs.

Any acceptor WFST (token/alignment/transition graphs from the transducer
criterion, STC label graphs, pruned n-gram transition models with epsilon
backoff arcs) is compiled host-side into fixed-shape arc tables (see
``gtn_applications_tpu.wfst.compile``), then scored against a ``[T, C]``
emission stream entirely on device.  This replaces GTN's runtime
``compose`` + ``forward_score`` (reference /root/reference/criterions/
transducer.py:260-296) with "gather emission channels along arcs, then
scan".

Epsilon (backoff) arcs do not consume a frame; they are handled by a
bounded-depth closure unrolled inside the scan (depth = longest epsilon
chain, computed at compile time — backoff chains are strictly
order-decreasing so the bound is small).

Arc table convention (all int32 / float32, padded to fixed length):
  src[A], dst[A], label[A]  : arc endpoints and emission channel
  weight[A]                 : arc weight (NEG for padding arcs)
  start[S]                  : initial state potentials (0 or NEG)
  accept[S]                 : accepting-state mask potentials (0 or NEG)
  eps_src[E], eps_dst[E], eps_weight[E], eps_depth : epsilon closure tables
"""

import dataclasses
import jax
import jax.numpy as jnp

from .semiring import NEG, gather_channels, logaddexp, logsumexp, segment_logsumexp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ArcTable:
    """Device-ready compiled acceptor.

    ``eps_depth`` is static metadata (the unroll bound of the epsilon
    closure), so tables can cross jit boundaries as pytrees.
    """

    src: jnp.ndarray       # [A] int32
    dst: jnp.ndarray       # [A] int32
    label: jnp.ndarray     # [A] int32
    weight: jnp.ndarray    # [A] float32 (NEG on padding)
    start: jnp.ndarray     # [S] float32 (0 / NEG)
    accept: jnp.ndarray    # [S] float32 (0 / NEG)
    eps_src: jnp.ndarray   # [E] int32
    eps_dst: jnp.ndarray   # [E] int32
    eps_weight: jnp.ndarray  # [E] float32 (NEG on padding)
    eps_depth: int = dataclasses.field(metadata={"static": True}, default=0)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def num_states(self):
        return self.start.shape[0]

    def array_fields(self):
        return (
            self.src, self.dst, self.label, self.weight, self.start,
            self.accept, self.eps_src, self.eps_dst, self.eps_weight,
        )

    @staticmethod
    def from_arrays(fields, eps_depth):
        return ArcTable(*fields, eps_depth=eps_depth)


def _eps_closure(alpha, table: ArcTable):
    """Combine epsilon-path extensions of alpha, paths of length <= eps_depth."""
    if table.eps_depth == 0:
        return alpha
    S = table.num_states
    acc = alpha
    cur = alpha
    for _ in range(table.eps_depth):
        contrib = cur[..., table.eps_src] + table.eps_weight
        cur = segment_logsumexp(contrib, table.eps_dst, S)
        acc = logaddexp(acc, cur)
    return acc


def forward_score(em, table: ArcTable, input_length=None):
    """Log-semiring forward score of emissions ``em [T, C]`` through ``table``.

    Each non-epsilon arc consumes one frame and scores
    ``weight + em[t, label]``.  Equivalent to
    ``gtn.forward_score(gtn.intersect(linear_graph(em), graph))``.
    """
    T = em.shape[0]
    S = table.num_states
    if input_length is None:
        input_length = T

    alpha = _eps_closure(table.start, table)
    # Pre-gather emissions along arcs with a one-hot contraction: [T, A]
    em_arc = gather_channels(em, table.label, batched=False)

    def step(alpha, xs):
        em_t, t = xs
        contrib = alpha[table.src] + table.weight + em_t
        new = segment_logsumexp(contrib, table.dst, S)
        new = _eps_closure(new, table)
        new = jnp.where(t < input_length, new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, alpha, (em_arc, jnp.arange(T)))
    return logsumexp(alpha + table.accept, axis=0)


def _as2d(x):
    x = jnp.asarray(x)
    return x[None] if x.ndim == 1 else x


import os

def _norm_impl(value):
    # accept on/off as aliases for the canonical whole/step
    return {"on": "whole", "off": "step"}.get(value, value)


# "whole": the entire scan as one Pallas launch with MXU one-hot-projection
# matmuls (ops.sparse_scan_pallas); "step": per-frame seg_lse kernels under
# lax.scan; "auto": whole when the projection matrices fit the VMEM budget.
_SCAN_IMPL = _norm_impl(os.environ.get("GTN_SPARSE_SCAN", "auto"))

_logged_whole_dispatch = set()


def _whole_scan_plan(B, S, A, E, per_sample, eps_per_sample, eps_depth):
    """Tile plan for the whole-scan kernel: the largest (batch, arc-chunk)
    tiles whose BACKWARD footprint (the binding constraint — see
    sparse_scan_pallas.predict_vmem_bytes for the probe-backed model) fits
    the scoped-VMEM budget.  Returns (batch_tile, arc_tile); batch_tile
    None means no tiling fits (huge shared graphs, or per-sample eps
    closures past the budget) and the per-step kernel must be used.  Logs
    the predicted demand once per shape so a Mosaic OOM at dispatch time
    is diagnosable."""
    import logging

    from .sparse_scan_pallas import choose_tiles

    bt, at, demand = choose_tiles(
        B, S, A, E, per_sample, eps_per_sample, eps_depth
    )
    key = (B, S, A, E, per_sample, eps_per_sample, eps_depth)
    if key not in _logged_whole_dispatch:
        _logged_whole_dispatch.add(key)
        if bt is not None:
            logging.info(
                "whole-scan sparse kernel: B=%d S=%d A=%d E=%d -> "
                "batch_tile=%d arc_tile=%s, predicted backward VMEM "
                "%.1f MB", B, S, A, E, bt, at, demand / 1e6,
            )
        else:
            logging.info(
                "whole-scan sparse kernel does not fit at B=%d S=%d A=%d "
                "E=%d (smallest tiling predicts %.1f MB); using the "
                "per-step kernel", B, S, A, E, demand / 1e6,
            )
    return bt, at


def _whole_scan_fits(B, S, A, E, per_sample, eps_per_sample, eps_depth):
    """Back-compat predicate: True when some batch tile fits."""
    from .sparse_scan_pallas import choose_batch_tile

    return choose_batch_tile(
        B, S, A, E, per_sample, eps_per_sample, eps_depth
    )[0] is not None


def _forward_batched_pallas(em, table: ArcTable, input_lengths=None):
    """Batched scan over [B, S] state vectors on Pallas kernels.

    Arc fields may be shared (leading dim 1 / 1-D) or per-sample ([B, ...]).
    XLA's segment ops lower to serial scatters on TPU (~0.1 ms per scan
    step); in-kernel one-hot masking replaces them, and the whole scan runs
    as a single launch (ops.sparse_scan_pallas) so the per-frame
    kernel-dispatch overhead (~40-100 us) is paid once, not T times.
    """
    from .seglse_pallas import seg_lse
    from .semiring import gather_channels

    B, T, C = em.shape
    src = _as2d(table.src)
    dst = _as2d(table.dst)
    weight = _as2d(table.weight)
    label = _as2d(table.label)
    start = _as2d(table.start)
    accept = _as2d(table.accept)
    S = start.shape[-1]
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    label_b = jnp.broadcast_to(label, (B, label.shape[-1]))
    em_arc = gather_channels(em, label_b)  # [B, T, A]

    impl = _norm_impl(_SCAN_IMPL)
    per_sample = src.shape[0] > 1
    batch_tile, arc_tile = _whole_scan_plan(
        B, S, src.shape[-1], table.eps_src.shape[-1],
        per_sample=per_sample,
        eps_per_sample=_as2d(table.eps_src).shape[0] > 1,
        eps_depth=table.eps_depth,
    )
    use_whole = impl == "whole" or (impl == "auto" and batch_tile is not None)
    if use_whole:
        if batch_tile is None:
            # pinned "whole" past the gate: smallest Mosaic-legal tiles
            batch_tile = 8 if B % 8 == 0 else B
            arc_tile = 128 if per_sample else None
        from . import sparse_scan_pallas

        eps_src = _as2d(table.eps_src)
        eps_dst = _as2d(table.eps_dst)
        eps_w = _as2d(table.eps_weight)
        alpha0 = jnp.broadcast_to(start, (B, S))
        if table.eps_depth > 0:
            eps_zero = jnp.zeros_like(eps_w)

            def closure0(alpha):
                acc = cur = alpha
                for _ in range(table.eps_depth):
                    cur = seg_lse(cur, eps_src, eps_dst, eps_w, eps_zero)
                    acc = logaddexp(acc, cur)
                return acc

            alpha0 = closure0(alpha0)
        return sparse_scan_pallas.scan_scores(
            em_arc, (src, dst, weight, eps_src, eps_dst, eps_w),
            alpha0, accept, input_lengths, table.eps_depth,
            batch_tile=batch_tile, arc_tile=arc_tile,
        )

    em_arc = em_arc.transpose(1, 0, 2)     # [T, B, A]

    if table.eps_depth > 0:
        eps_src = _as2d(table.eps_src)
        eps_dst = _as2d(table.eps_dst)
        eps_w = _as2d(table.eps_weight)
        eps_zero = jnp.zeros_like(eps_w)

        def closure(alpha):
            acc = cur = alpha
            for _ in range(table.eps_depth):
                cur = seg_lse(cur, eps_src, eps_dst, eps_w, eps_zero)
                acc = logaddexp(acc, cur)
            return acc
    else:
        def closure(alpha):
            return alpha

    alpha0 = closure(jnp.broadcast_to(start, (B, S)))

    def step(alpha, xs):
        em_t, t = xs
        new = closure(seg_lse(alpha, src, dst, weight, em_t))
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, alpha0, (em_arc, jnp.arange(T)))
    return logsumexp(alpha + accept, axis=-1)


def forward_score_batch(em, table: ArcTable, input_lengths=None):
    """Batched forward score with a shared table over ``em [B, T, C]``."""
    if jax.default_backend() == "tpu":
        return _forward_batched_pallas(em, table, input_lengths)
    if input_lengths is None:
        return jax.vmap(lambda e: forward_score(e, table))(em)
    return jax.vmap(lambda e, l: forward_score(e, table, l))(em, input_lengths)


def forward_score_batch_tables(em, tables: ArcTable, input_lengths=None):
    """Per-sample arc tables: fields are [B, ·] (stacked per-sample) or
    [·] (shared across the batch — e.g. union-skeleton src/dst endpoints
    from wfst.compile.union_stack_arc_tables, with per-sample
    labels/weights).

    Used when the lattice depends on the target (transducer alignment
    graphs, STC label graphs): tables are stacked/padded host-side.
    """
    if jax.default_backend() == "tpu":
        return _forward_batched_pallas(em, tables, input_lengths)
    eps_depth = tables.eps_depth
    B = em.shape[0]
    fields = tuple(
        f if f.ndim == 2 else jnp.broadcast_to(f, (B,) + f.shape)
        for f in tables.array_fields()
    )

    if input_lengths is None:
        def one(*f):
            return forward_score(f[0], ArcTable(*f[1:], eps_depth=eps_depth))
        return jax.vmap(one)(em, *fields)

    def one_len(*f):
        return forward_score(f[0], ArcTable(*f[2:], eps_depth=eps_depth), f[1])
    return jax.vmap(one_len)(em, input_lengths, *fields)


def viterbi(em, table: ArcTable, input_length=None):
    """Tropical scan with backpointers over an epsilon-free table.

    Returns (labels [T] int32, score).  ``labels[t]`` is the emission label
    of the best arc taken at frame t; frames at t >= input_length emit -1.
    Epsilon arcs must have been removed at compile time (see
    wfst.compile.compile_acceptor(remove_eps=True)); the emitted label
    sequence is then exactly ``gtn.remove(gtn.viterbi_path(...))``'s labels
    (reference transducer.py:221).
    """
    if table.eps_depth != 0:
        raise ValueError("viterbi requires an epsilon-free arc table")
    T = em.shape[0]
    S = table.num_states
    A = table.src.shape[0]
    if input_length is None:
        input_length = T

    alpha = table.start
    em_arc = gather_channels(em, table.label, batched=False)

    def step(alpha, xs):
        em_t, t = xs
        contrib = alpha[table.src] + table.weight + em_t
        best = jax.ops.segment_max(contrib, table.dst, S)
        best = jnp.maximum(best, NEG)
        # argmax arc per destination state
        is_best = (contrib >= best[table.dst] - 1e-6)
        arc_ids = jnp.arange(A, dtype=jnp.int32)
        cand = jnp.where(is_best, arc_ids, A)
        best_arc = jax.ops.segment_min(cand, table.dst, S)
        live = t < input_length
        new = jnp.where(live, best, alpha)
        best_arc = jnp.where(live, best_arc, A)
        return new, best_arc

    alpha, backarcs = jax.lax.scan(step, alpha, (em_arc, jnp.arange(T)))
    final = alpha + table.accept
    state = jnp.argmax(final)
    score = jnp.max(final)

    pad_src = jnp.concatenate([table.src, jnp.zeros((1,), jnp.int32)])
    pad_label = jnp.concatenate([table.label, -jnp.ones((1,), jnp.int32)])

    def backstep(state, arcs_t):
        arc = arcs_t[state]
        lab = pad_label[arc]
        prev = jnp.where(arc < A, pad_src[arc], state)
        return prev, lab

    _, labels_rev = jax.lax.scan(backstep, state, backarcs, reverse=True)
    # infeasible lattice (no accepting path): emit the empty path, matching
    # the whole-scan kernel and gtn.viterbi_path on an empty composition
    labels_rev = jnp.where(score > NEG / 2, labels_rev, -1)
    return labels_rev, score


def _viterbi_batched_pallas(em, table: ArcTable, input_lengths=None):
    """Batched tropical scan with the Pallas seg_max step (shared,
    epsilon-free decode tables)."""
    from .segmax_pallas import seg_max
    from .semiring import gather_channels

    B, T, C = em.shape
    src = _as2d(table.src)
    dst = _as2d(table.dst)
    weight = _as2d(table.weight)
    label = _as2d(table.label)
    start = _as2d(table.start)
    accept = _as2d(table.accept)
    S = start.shape[-1]
    A = src.shape[-1]
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    label_b = jnp.broadcast_to(label, (B, A))
    em_arc = gather_channels(em, label_b).transpose(1, 0, 2)  # [T, B, A]

    DEAD = jnp.int32(2**30)

    def step(alpha, xs):
        em_t, t = xs
        new, arc = seg_max(alpha, src, dst, weight, em_t)
        live = (t < input_lengths)[:, None]
        new = jnp.where(live, new, alpha)
        arc = jnp.where(live, arc, DEAD)
        return new, arc

    alpha0 = jnp.broadcast_to(start, (B, S))
    alpha, backarcs = jax.lax.scan(step, alpha0, (em_arc, jnp.arange(T)))

    final = alpha + accept
    state = jnp.argmax(final, axis=-1).astype(jnp.int32)
    score = jnp.max(final, axis=-1)

    pad_src = jnp.concatenate([src[0], jnp.zeros((1,), jnp.int32)])
    pad_label = jnp.concatenate([label[0], -jnp.ones((1,), jnp.int32)])
    A_clamp = jnp.int32(A)

    def backstep(state, arcs_t):
        arc = jnp.take_along_axis(arcs_t, state[:, None], axis=1)[:, 0]
        valid = arc < A
        arc_c = jnp.minimum(arc, A_clamp)
        lab = jnp.where(valid, pad_label[arc_c], -1)
        prev = jnp.where(valid, pad_src[arc_c], state)
        return prev, lab

    _, labels_rev = jax.lax.scan(backstep, state, backarcs, reverse=True)
    labels = labels_rev.transpose(1, 0)
    # infeasible samples decode to the empty path (parity with the
    # whole-scan kernel's DEAD-slot masking)
    labels = jnp.where((score > NEG / 2)[:, None], labels, -1)
    return labels, score


# "whole": the entire tropical scan as one Pallas launch over a dense
# in-degree bucket layout (ops.viterbi_scan_pallas); "step": per-frame
# seg_max kernels; "auto": whole when the table is concrete and fits.
# on/off alias whole/step.
_VIT_IMPL = _norm_impl(os.environ.get("GTN_VITERBI_SCAN", "auto"))


def _viterbi_batch_impl(em, table: ArcTable, input_lengths=None):
    if (
        jax.default_backend() == "tpu"
        and table.eps_depth == 0
        and jnp.asarray(table.src).ndim == 1
    ):
        return _viterbi_batched_pallas(em, table, input_lengths)
    if input_lengths is None:
        return jax.vmap(lambda e: viterbi(e, table))(em)
    return jax.vmap(lambda e, l: viterbi(e, table, l))(em, input_lengths)


_viterbi_impl_jit = jax.jit(_viterbi_batch_impl)


def viterbi_batch(em, table: ArcTable, input_lengths=None):
    """Batched Viterbi dispatcher.  Self-jitting: call it with concrete
    arrays (outside jit) and it routes shared epsilon-free tables to the
    whole-scan bucket kernel, everything else to the jitted per-step path.
    Under an enclosing jit (tracer table) it falls through to the per-step
    implementation inline."""
    global _VIT_IMPL
    concrete = not isinstance(table.src, jax.core.Tracer)
    vit_impl = _norm_impl(_VIT_IMPL)
    if (
        table.eps_depth == 0
        and concrete
        and jnp.asarray(table.src).ndim == 1
        and (
            vit_impl == "whole"
            or (vit_impl == "auto" and jax.default_backend() == "tpu")
        )
    ):
        from . import viterbi_scan_pallas

        plan = viterbi_scan_pallas.build_plan(table)
        if plan is not None:
            try:
                return viterbi_scan_pallas.viterbi_scan(
                    em, plan, input_lengths
                )
            except Exception:  # pragma: no cover - compile-failure escape
                import logging

                logging.warning(
                    "whole-scan Viterbi kernel failed; using the per-step "
                    "path for this process", exc_info=True
                )
                _VIT_IMPL = "step"
    if isinstance(table.src, jax.core.Tracer) or isinstance(
        em, jax.core.Tracer
    ):
        return _viterbi_batch_impl(em, table, input_lengths)
    return _viterbi_impl_jit(em, table, input_lengths)
