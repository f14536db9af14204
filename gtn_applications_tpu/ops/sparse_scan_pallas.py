"""Whole-scan MXU Pallas kernel for generic sparse-arc lattice scoring.

The per-step ``seg_lse`` path (ops.seglse_pallas under ``lax.scan``) is
compute-bound on VPU one-hot masking: every scan step materializes
O(B*A*S) boolean masks to gather sources and combine destinations, which
costs ~50-80 us per frame at recipe scale (ngram2 letters: 63 ms/iter
fwd+bwd).  This module runs the *entire* scan as ONE kernel with the
segment ops recast as MXU matmuls against precomputed one-hot projection
matrices (the same max-shifted exp-matmul recipe as the ASG free-energy
scan in ops/asg_scan.py):

    c[b, a]   = (alpha @ P_src)[b, a] + w[b, a] + em[b, a]
    m[b]      = max_a c[b, a]                      (global row shift)
    new[b, s] = m[b] + log( (exp(c - m) @ P_dst^T)[b, s] )

``P_src/P_dst`` are ``[S, A]`` (shared graph) or ``[B, S, A]``
(per-sample graphs, batched dot_general) f32 one-hots built once on the
host from the compiled arc tables.  The global row shift differs from the
per-destination shift of the step kernel only in rounding: destinations
whose total mass is more than ~80 nats below the row max underflow to the
semiring zero, which is below fp32 resolution of the final score.  The
time axis is the grid dimension (sequential on TPU), the state vector
lives in a VMEM scratch carry, per-frame emission blocks stream in via
double-buffered DMA, and the bounded epsilon (backoff) closure is
unrolled inside the kernel.  Behavioral spec: reference
criterions/transducer.py:260-296 (GTN compose + forward_score) without
the per-step dispatch.

The backward kernel replays the grid time-reversed: it recomputes each
step's contributions from the saved alpha trajectory (O(T*S) residual
memory, not O(T*A)), applies the exact softmax-posterior VJP through the
unrolled closure chain as the transposed matmuls, streams per-frame
emission grads out, and accumulates arc/epsilon weight grads in output
blocks that persist across grid steps.

Batch tiling: the binding VMEM constraint is the backward kernel's
per-sample projection residency (~10 x B*S_pad*A_pad floats measured).
When the full batch exceeds the budget the grid gains a leading batch
axis — grid (nb, T), each tile scanning B/nb samples with its own
scratch carry re-initialized at its first time step — so bench/recipe
shapes (e.g. B32/S256/A384) dispatch the whole-scan kernel instead of
falling back to the per-step path.  Total FLOPs and DMA bytes are
unchanged; only peak VMEM residency shrinks by nb.

Arc-chunked per-sample mode (``arc_tile``): per-sample f32 projections
are the footprint that kept the reference's heaviest protocol
(word-decomposition transducers, S~380/A~1400 PER SAMPLE — no union
skeleton exists for decomposition sausages) off this kernel entirely.
In idx mode the kernel takes the int32 arc endpoints ``[B, A]`` instead
of materialized projections and rebuilds one-hot chunks of ``arc_tile``
arcs in-kernel (a broadcasted-iota compare, ~us on the VPU) per time
step, folding them with an online-logsumexp accumulation (running row
max + rescaled destination sums — the standard streaming-softmax
recurrence).  Peak residency drops from ~10 x Bt*S*A_pad floats to
~8 x Bt*S*arc_tile, and the [B, S, A] HBM projection arrays disappear
altogether.  The chunked accumulation differs from the global-row-shift
result only in fp rounding order.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import DEAD, NEG

_FLOOR = 1e-30
# states below this are unreachable (NEG-dominated); grads are masked
_DEAD = DEAD  # single source: semiring.DEAD


def _interpret():
    return jax.default_backend() != "tpu"


# Scoped-VMEM budget handed to Mosaic (v5e has 128 MiB/core).  The
# backward kernel's scoped demand GROWS with the budget (Mosaic sizes
# its buffering to what is available) but caps out: AOT probes at
# B8/S384/A1024 showed demand 100.5 MB under a 64 MiB budget, 124.6 MB
# under 112 MiB, and a successful compile at 127 MiB — i.e. the capped
# demand is ~9.9 x B*S_pad*A_pad floats with per-sample projections.
# Hand Mosaic the full practical budget; ops.sparse._whole_scan_fits
# gates dispatch against the same measured ratio so larger shapes fall
# back to the per-step kernel instead of failing to compile.
VMEM_LIMIT_BYTES = 127 * 1024 * 1024


def _compiler_params():
    # projection matrices + trajectory blocks exceed Mosaic's default 16 MB
    # scoped VMEM budget at realistic (B, S, A)
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _pad_axis(x, mult, fill, axis=-1):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=fill)


# One-hot projection matmul precision.  The projections are exactly 0/1
# (bf16-representable), so only the f32 alpha/exp operand needs
# decomposing: x = hi + mid + lo (three bf16 terms, residuals computed
# exactly in f32) recovers >= 24 mantissa bits, and each term multiplies
# the EXACT bf16 projection with f32 accumulation.  Net: f32-grade
# results at 3 single-pass bf16 MXU dots — half of HIGHEST's x6 passes
# (Mosaic rejects Precision.HIGH outright, and x6 measured ~4.5 ms/iter
# on the ngram0 protocol).  Selections through one-hot columns (one
# nonzero per column) are exactly f32.
def _split3(x):
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot3(x, p, dims):
    pb = p.astype(jnp.bfloat16)
    out = None
    for term in _split3(x):
        d = jax.lax.dot_general(
            term, pb, dims, preferred_element_type=jnp.float32
        )
        out = d if out is None else out + d
    return out


def _mm(x, p):
    """x [B, S] x p ([S, A] shared | [B, S, A] per-sample) -> [B, A].

    The batched form keeps a singleton non-contracting dim on the lhs
    ([B, 1, S]): Mosaic's TPU dot attr rejects an empty
    lhs_non_contracting_dims list."""
    if p.ndim == 2:
        return _dot3(x, p, (((1,), (0,)), ((), ())))
    return _dot3(x[:, None, :], p, (((2,), (1,)), ((0,), (0,))))[:, 0, :]


def _mm_t(x, p):
    """x [B, A] x p^T -> [B, S] (contract the arc axis)."""
    if p.ndim == 2:
        return _dot3(x, p, (((1,), (1,)), ((), ())))
    return _dot3(x[:, None, :], p, (((2,), (2,)), ((0,), (0,))))[:, 0, :]


def _onehot_chunk(idx_c, S_pad):
    """[Bt, Ac] int32 endpoints -> [Bt, S_pad, Ac] f32 one-hot chunk.

    Built in-kernel (VPU compare against an iota), so the only resident
    projection state is one chunk; padding arcs carry idx -1 and match no
    state (all-zero column).  Keep the build in f32 even though every
    consumer casts to bf16 for the dots: a direct bf16 select fails
    Mosaic's i1 relayout to (16, 128) tiling, and f32-select-then-convert
    measured a 40x SLOWDOWN on chip (17.5 -> 704 ms/iter word-decomps
    fwd+bwd) — the per-chunk (8, 128) -> (16, 128) retiling lowers to a
    pathological path."""
    Bt, Ac = idx_c.shape
    i = jax.lax.broadcasted_iota(jnp.int32, (Bt, S_pad, Ac), 1)
    return jnp.where(i == idx_c[:, None, :], 1.0, 0.0)


def _mm_k(x, p):
    """x [Bt, k, S] x p [Bt, S, A] -> [Bt, k, A] (batched, bf16x3)."""
    return _dot3(x, p, (((2,), (1,)), ((0,), (0,))))


def _seg_fwd_idx(alpha, src_idx, dst_idx, w, em, S_pad, Ac):
    """One lse step with in-kernel chunked one-hots (per-sample arcs).

    alpha [Bt, S]; src/dst [Bt, A_pad] int32; w/em [Bt, A_pad] with
    A_pad a multiple of Ac.  Streams arc chunks through an online
    logsumexp: running row max ``m`` with rescaled destination sums.
    Returns (out [Bt, S], cs) where cs is the per-chunk contribution
    list (saved by the depth>0 backward recompute)."""
    Bt, A_pad = w.shape
    m_run = jnp.full((Bt, 1), NEG, jnp.float32)
    acc = jnp.zeros((Bt, S_pad), jnp.float32)
    cs = []
    for a0 in range(0, A_pad, Ac):
        sl = slice(a0, a0 + Ac)
        p_src_c = _onehot_chunk(src_idx[:, sl], S_pad)
        c = _mm(alpha, p_src_c) + w[:, sl]
        if em is not None:
            c = c + em[:, sl]
        cs.append(c)
        m_new = jnp.maximum(
            m_run, jnp.maximum(jnp.max(c, axis=1, keepdims=True), NEG)
        )
        e = jnp.exp(jnp.minimum(c - m_new, 0.0))
        e = jnp.where(c > _DEAD, e, 0.0)
        p_dst_c = _onehot_chunk(dst_idx[:, sl], S_pad)
        sums_c = _mm_t(e, p_dst_c)
        acc = acc * jnp.exp(m_run - m_new) + sums_c
        m_run = m_new
    out = jnp.where(
        (acc > 0.0) & (m_run > _DEAD),
        m_run + jnp.log(jnp.maximum(acc, _FLOOR)),
        NEG,
    )
    return out, cs


def _seg_vjp_idx(src_idx, dst_idx, g_out, out, cs, S_pad, Ac):
    """Chunked VJP of ``_seg_fwd_idx``.  Returns (dalpha [Bt, S],
    dcs — per-chunk dc list in arc order, for the caller to store)."""
    g_eff = jnp.where(out > _DEAD, g_out, 0.0)
    both = jnp.stack([out, g_eff], axis=1)  # [Bt, 2, S]
    dalpha = jnp.zeros_like(out)
    dcs = []
    for k, c in enumerate(cs):
        sl = slice(k * Ac, (k + 1) * Ac)
        p_dst_c = _onehot_chunk(dst_idx[:, sl], S_pad)
        od_gd = _mm_k(both, p_dst_c)  # [Bt, 2, Ac]
        out_dst, g_dst = od_gd[:, 0, :], od_gd[:, 1, :]
        ratio = jnp.exp(jnp.minimum(c - out_dst, 0.0))
        dc = jnp.where((c > _DEAD) & (out_dst > _DEAD), ratio * g_dst, 0.0)
        p_src_c = _onehot_chunk(src_idx[:, sl], S_pad)
        dalpha = dalpha + _mm_t(dc, p_src_c)
        dcs.append(dc)
    return dalpha, dcs


def _seg_fwd(alpha, p_src, p_dst, w, em):
    """One lse step.  alpha [B,S]; w/em [B,A] (em may be None).

    Returns (out [B,S], c [B,A]) with the global-row-max shift."""
    c = _mm(alpha, p_src) + w
    if em is not None:
        c = c + em
    m = jnp.maximum(jnp.max(c, axis=1, keepdims=True), NEG)  # [B, 1]
    e = jnp.exp(jnp.minimum(c - m, 0.0))
    e = jnp.where(c > _DEAD, e, 0.0)
    sums = _mm_t(e, p_dst)  # [B, S]
    out = jnp.where(
        (sums > 0.0) & (m > _DEAD),
        m + jnp.log(jnp.maximum(sums, _FLOOR)),
        NEG,
    )
    return out, c


def _seg_vjp(p_src, p_dst, g_out, out, c):
    """VJP of one lse step.  Returns (dalpha [B,S], dc [B,A]).

    dc[a] = exp(c[a] - out[dst[a]]) * g_out[dst[a]] — the exact softmax
    posterior weights; grads of unreachable (NEG) states are masked.
    """
    g_eff = jnp.where(out > _DEAD, g_out, 0.0)
    out_dst = _mm(out, p_dst)   # out[dst[a]]
    g_dst = _mm(g_eff, p_dst)   # g[dst[a]]
    ratio = jnp.exp(jnp.minimum(c - out_dst, 0.0))
    dc = jnp.where((c > _DEAD) & (out_dst > _DEAD), ratio * g_dst, 0.0)
    dalpha = _mm_t(dc, p_src)
    return dalpha, dc


def _fwd_kernel(
    depth, arc_tile,
    # refs
    alpha0_ref, em_ref, p_src_ref, p_dst_ref, w_ref,
    p_esrc_ref, p_edst_ref, eps_w_ref, len_ref,
    traj_ref, alpha_scr,
):
    i = pl.program_id(1)  # time; program_id(0) is the batch tile

    @pl.when(i == 0)
    def _():
        alpha_scr[...] = alpha0_ref[...]

    @pl.when(i > 0)
    def _():
        alpha = alpha_scr[...]
        em = em_ref[0]
        if arc_tile is not None:
            # idx mode: p_src/p_dst refs hold int32 endpoints [Bt, A_pad]
            new, _ = _seg_fwd_idx(
                alpha, p_src_ref[...], p_dst_ref[...], w_ref[...], em,
                alpha.shape[-1], arc_tile,
            )
        else:
            new, _ = _seg_fwd(alpha, p_src_ref[...], p_dst_ref[...],
                              w_ref[...], em)
        if depth > 0:
            p_esrc = p_esrc_ref[...]
            p_edst = p_edst_ref[...]
            eps_w = eps_w_ref[...]
            cur = new
            for _d in range(depth):
                cur, _ = _seg_fwd(cur, p_esrc, p_edst, eps_w, None)
                new = _lae(new, cur)
        t = i - 1
        live = (t * jnp.ones_like(len_ref[...])) < len_ref[...]  # [B, 1]
        alpha_scr[...] = jnp.where(live, new, alpha)

    traj_ref[0] = alpha_scr[...]


def _lae(a, b):
    m = jnp.maximum(jnp.maximum(a, b), NEG)
    r = jnp.exp(a - m) + jnp.exp(b - m)
    return m + jnp.log(jnp.maximum(r, _FLOOR))


def _bwd_kernel(
    depth, arc_tile,
    em_ref, ain_ref, aout_ref, p_src_ref, p_dst_ref, w_ref,
    p_esrc_ref, p_edst_ref, eps_w_ref, len_ref, g_ref,
    dem_ref, dw_ref, deps_ref, dalpha0_ref, gal_scr,
):
    T = pl.num_programs(1)
    i = pl.program_id(1)  # time; program_id(0) is the batch tile
    t = T - 1 - i

    @pl.when(i == 0)
    def _():
        gal_scr[...] = g_ref[...]
        dw_ref[...] = jnp.zeros(dw_ref.shape, jnp.float32)
        if depth > 0:
            deps_ref[...] = jnp.zeros(deps_ref.shape, jnp.float32)

    alpha_in = ain_ref[0]
    em = em_ref[0]
    p_src = p_src_ref[...]
    p_dst = p_dst_ref[...]
    S_pad = alpha_in.shape[-1]

    if depth == 0:
        # Epsilon-free steps skip the forward recompute entirely: the
        # saved trajectory already holds this step's output (traj[t+1] ==
        # y0 on live rows; dead rows' incoming grads are masked to zero
        # below, so their slots never contribute).  c0 is one matmul, and
        # out[dst]/g[dst] fuse into a single stacked matmul when the
        # projections are shared — 3 matmuls/step vs the naive 5.
        y0 = aout_ref[0]
        g = gal_scr[...]
        live = (t * jnp.ones_like(len_ref[...])) < len_ref[...]  # [B, 1]
        g_eff = jnp.where(live, g, 0.0)
        g_eff = jnp.where(y0 > _DEAD, g_eff, 0.0)
        if arc_tile is not None:
            # idx mode: stream arc chunks; only one chunk's one-hots and
            # dc are ever resident
            both = jnp.stack([y0, g_eff], axis=1)  # [Bt, 2, S]
            dalpha_in = jnp.zeros_like(y0)
            w = w_ref[...]
            for a0 in range(0, w.shape[-1], arc_tile):
                sl = slice(a0, a0 + arc_tile)
                p_src_c = _onehot_chunk(p_src[:, sl], S_pad)
                c0 = _mm(alpha_in, p_src_c) + w[:, sl] + em[:, sl]
                p_dst_c = _onehot_chunk(p_dst[:, sl], S_pad)
                od_gd = _mm_k(both, p_dst_c)
                out_dst, g_dst = od_gd[:, 0, :], od_gd[:, 1, :]
                ratio = jnp.exp(jnp.minimum(c0 - out_dst, 0.0))
                dc = jnp.where(
                    (c0 > _DEAD) & (out_dst > _DEAD), ratio * g_dst, 0.0
                )
                dalpha_in = dalpha_in + _mm_t(dc, p_src_c)
                dem_ref[0, :, sl] = dc
                dw_ref[:, sl] = dw_ref[:, sl] + dc
        else:
            c0 = _mm(alpha_in, p_src) + w_ref[...] + em
            if p_dst.ndim == 2:
                both = _mm(jnp.concatenate([y0, g_eff], axis=0), p_dst)
                out_dst, g_dst = jnp.split(both, 2, axis=0)
            else:
                out_dst = _mm(y0, p_dst)
                g_dst = _mm(g_eff, p_dst)
            ratio = jnp.exp(jnp.minimum(c0 - out_dst, 0.0))
            dc = jnp.where(
                (c0 > _DEAD) & (out_dst > _DEAD), ratio * g_dst, 0.0
            )
            dalpha_in = _mm_t(dc, p_src)
            dem_ref[0] = dc
            dw_ref[...] = dw_ref[...] + dc
        gal_scr[...] = jnp.where(live, dalpha_in, g)
        dalpha0_ref[...] = gal_scr[...]
        return

    # recompute the forward chain of this step
    if arc_tile is not None:
        y0, c0_chunks = _seg_fwd_idx(
            alpha_in, p_src, p_dst, w_ref[...], em, S_pad, arc_tile
        )
    else:
        y0, c0 = _seg_fwd(alpha_in, p_src, p_dst, w_ref[...], em)
    if depth > 0:
        p_esrc = p_esrc_ref[...]
        p_edst = p_edst_ref[...]
        eps_w = eps_w_ref[...]
        curs = [y0]
        accs = [y0]
        eps_cs = []
        for _d in range(depth):
            cur, cc = _seg_fwd(curs[-1], p_esrc, p_edst, eps_w, None)
            eps_cs.append(cc)
            curs.append(cur)
            accs.append(_lae(accs[-1], cur))

    g = gal_scr[...]
    live = (t * jnp.ones_like(len_ref[...])) < len_ref[...]  # [B, 1]
    g_eff = jnp.where(live, g, 0.0)

    if depth > 0:
        # reverse through acc_d = lae(acc_{d-1}, cur_d), cur_d = eps(cur_{d-1})
        g_cur = [jnp.zeros_like(y0) for _ in range(depth + 1)]
        g_acc = g_eff
        for d in range(depth, 0, -1):
            out_d = accs[d]
            g_acc_masked = jnp.where(out_d > _DEAD, g_acc, 0.0)
            g_cur[d] = g_cur[d] + g_acc_masked * jnp.exp(
                jnp.minimum(curs[d] - out_d, 0.0)
            )
            g_acc = g_acc_masked * jnp.exp(
                jnp.minimum(accs[d - 1] - out_d, 0.0)
            )
            dprev, deps_c = _seg_vjp(
                p_esrc, p_edst, g_cur[d], curs[d], eps_cs[d - 1]
            )
            g_cur[d - 1] = g_cur[d - 1] + dprev
            deps_ref[...] = deps_ref[...] + deps_c
        g_y0 = g_acc + g_cur[0]
    else:
        g_y0 = g_eff

    if arc_tile is not None:
        dalpha_in, dcs = _seg_vjp_idx(
            p_src, p_dst, g_y0, y0, c0_chunks, S_pad, arc_tile
        )
        for k, dc in enumerate(dcs):
            sl = slice(k * arc_tile, (k + 1) * arc_tile)
            dem_ref[0, :, sl] = dc
            dw_ref[:, sl] = dw_ref[:, sl] + dc
    else:
        dalpha_in, dc = _seg_vjp(p_src, p_dst, g_y0, y0, c0)
        dem_ref[0] = dc
        dw_ref[...] = dw_ref[...] + dc

    gal_scr[...] = jnp.where(live, dalpha_in, g)
    dalpha0_ref[...] = gal_scr[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def sparse_scan(alpha0, em_tba, p_src, p_dst, w, p_esrc, p_edst, eps_w,
                lens, eps_depth, batch_tile, arc_tile=None):
    """Final alpha [B, S] of the whole lattice scan as one Pallas launch.

    Args (already padded/layouted by ``scan_scores``):
      alpha0: [B, S_pad] f32 — start potentials after initial eps closure.
      em_tba: [T, B, A_pad] f32 — per-arc emissions, time-major.
      p_src/p_dst: [S_pad, A_pad] (shared) or [B, S_pad, A_pad] f32
        one-hot projections — or, in idx mode (arc_tile set), [B, A_pad]
        int32 arc endpoints (one-hots built in-kernel per chunk).
      w: [B, A_pad] f32 (NEG on padding).
      p_esrc/p_edst/eps_w: epsilon projections (ignored if eps_depth == 0).
      lens: [B, 1] f32 — frames beyond a sample's length carry alpha through.
      eps_depth: static closure unroll bound.
      batch_tile: static samples per grid tile (None = whole batch); must
        divide B.  Shrinks peak VMEM residency by B/batch_tile.
      arc_tile: static arcs per in-kernel one-hot chunk (None = full
        projections); must divide A_pad.  Per-sample tables only.
    """
    final, _ = _scan_fwd(alpha0, em_tba, p_src, p_dst, w, p_esrc, p_edst,
                         eps_w, lens, eps_depth, batch_tile, arc_tile)
    return final


def _specs(B, Bt, S_pad, A_pad, p_src, p_dst, p_esrc, p_edst, eps_w,
           idx_mode=False):
    """Common BlockSpecs for the (batch-tile, time) grid: batch-tiled
    time-constant blocks for state/arc vectors, shared or per-sample
    projections, all VMEM-resident per tile.  In idx mode p_src/p_dst are
    per-sample [B, A_pad] int32 endpoints (batch-tiled like ``w``)."""

    def tile(shape_full):
        block = (Bt,) + shape_full[1:]
        nd = len(block)
        return pl.BlockSpec(
            block, lambda b, i: (b,) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )

    def proj(p):
        if p.ndim == 2:  # shared projection: same block every tile
            return pl.BlockSpec(
                p.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM
            )
        return tile(p.shape)

    main = (lambda p: tile(p.shape)) if idx_mode else proj
    return {
        "alpha": tile((B, S_pad)),
        "w": tile((B, A_pad)),
        "len": tile((B, 1)),
        "p_src": main(p_src), "p_dst": main(p_dst),
        "p_esrc": proj(p_esrc), "p_edst": proj(p_edst),
        "eps_w": tile(eps_w.shape),
    }


def _scan_fwd(alpha0, em_tba, p_src, p_dst, w, p_esrc, p_edst, eps_w, lens,
              eps_depth, batch_tile, arc_tile=None):
    T, B, A_pad = em_tba.shape
    S_pad = alpha0.shape[-1]
    Bt = batch_tile or B
    assert B % Bt == 0, (B, Bt)
    assert arc_tile is None or A_pad % arc_tile == 0, (A_pad, arc_tile)
    sp = _specs(B, Bt, S_pad, A_pad, p_src, p_dst, p_esrc, p_edst, eps_w,
                idx_mode=arc_tile is not None)

    em_spec = pl.BlockSpec(
        (1, Bt, A_pad), lambda b, i: (jnp.maximum(i, 1) - 1, b, 0),
        memory_space=pltpu.VMEM,
    )
    traj_spec = pl.BlockSpec(
        (1, Bt, S_pad), lambda b, i: (i, b, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_fwd_kernel, eps_depth, arc_tile)
    traj = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T + 1, B, S_pad), jnp.float32),
        grid=(B // Bt, T + 1),
        in_specs=[
            sp["alpha"], em_spec,
            sp["p_src"], sp["p_dst"], sp["w"],
            sp["p_esrc"], sp["p_edst"], sp["eps_w"], sp["len"],
        ],
        out_specs=traj_spec,
        scratch_shapes=[pltpu.VMEM((Bt, S_pad), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(alpha0, em_tba, p_src, p_dst, w, p_esrc, p_edst, eps_w, lens)
    final = traj[T]
    res = (traj, em_tba, p_src, p_dst, w, p_esrc, p_edst, eps_w, lens)
    return final, res


def _scan_bwd(eps_depth, batch_tile, arc_tile, res, g):
    traj, em_tba, p_src, p_dst, w, p_esrc, p_edst, eps_w, lens = res
    T, B, A_pad = em_tba.shape
    S_pad = traj.shape[-1]
    E_pad = eps_w.shape[-1]
    Bt = batch_tile or B
    sp = _specs(B, Bt, S_pad, A_pad, p_src, p_dst, p_esrc, p_edst, eps_w,
                idx_mode=arc_tile is not None)

    rev_em = pl.BlockSpec(
        (1, Bt, A_pad), lambda b, i: (T - 1 - i, b, 0),
        memory_space=pltpu.VMEM,
    )
    # traj[t] is the alpha *entering* step t (traj[0] == alpha0); the
    # same trajectory streams in twice — entering (t) and leaving (t+1)
    # alphas — so the eps-free backward never recomputes the step output
    rev_ain = pl.BlockSpec(
        (1, Bt, S_pad), lambda b, i: (T - 1 - i, b, 0),
        memory_space=pltpu.VMEM,
    )
    rev_aout = pl.BlockSpec(
        (1, Bt, S_pad), lambda b, i: (T - i, b, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_bwd_kernel, eps_depth, arc_tile)
    dem, dw, deps, dalpha0 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, A_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, A_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, E_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, S_pad), jnp.float32),
        ),
        grid=(B // Bt, T),
        in_specs=[
            rev_em, rev_ain, rev_aout,
            sp["p_src"], sp["p_dst"], sp["w"],
            sp["p_esrc"], sp["p_edst"], sp["eps_w"], sp["len"],
            sp["alpha"],
        ],
        out_specs=(rev_em, sp["w"], sp["eps_w"], sp["alpha"]),
        scratch_shapes=[pltpu.VMEM((Bt, S_pad), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(em_tba, traj, traj, p_src, p_dst, w, p_esrc, p_edst, eps_w, lens, g)

    if eps_depth == 0:
        deps = jnp.zeros_like(eps_w)
    return (dalpha0, dem, None, None, dw, None, None, deps, None)


sparse_scan.defvjp(_scan_fwd, _scan_bwd)


def predict_vmem_bytes(Bt, S, A, E, per_sample, eps_per_sample, eps_depth,
                       arc_tile=None):
    """Backward-kernel scoped-VMEM demand model for one batch tile of Bt
    samples (the binding constraint; the forward is strictly smaller).
    Coefficients from AOT probes on chip (docs/chip_verification.md):
    demand caps at ~9.9 x Bt*S_pad*A_pad floats with per-sample streamed
    projections — modeled as 10x; the 4x shared-projection coefficient is
    provisional (not probe-backed) pending the staged chip session.
    In idx mode (arc_tile set) the resident projection state is one
    in-kernel-built chunk pair: modeled 8 x Bt*S_pad*arc_tile (2 f32
    one-hots + bf16 copies + Mosaic headroom; conservative until the
    phase-1 chip probes calibrate it), plus the endpoint int blocks and
    the depth>0 saved chunk contributions (~2 x Bt*A_pad)."""
    pad = lambda n: n + (-n) % 128
    S_pad, A_pad, E_pad = pad(S), pad(max(A, 1)), pad(max(E, 1))
    if per_sample and arc_tile is not None:
        A_pad = A + (-A) % arc_tile
        floats = 8.0 * Bt * S_pad * arc_tile + 2.0 * Bt * A_pad
    else:
        floats = (10.0 * Bt if per_sample else 4.0) * S_pad * A_pad
    if eps_depth > 0:
        floats += (10.0 * Bt if eps_per_sample else 4.0) * S_pad * E_pad
    floats += 3 * Bt * (3 * A_pad + E_pad + 4 * S_pad)
    return 4.0 * floats


def _legal_batch_tiles(B):
    """Mosaic-tileable batch tiles, largest first: the batch axis is the
    second-to-last dim of the [Bt, X] state/arc blocks and the [1, Bt, A]
    streaming blocks, so a partial tile must be a multiple of 8 sublanes
    (the full batch is always legal: full-array blocks are exempt)."""
    return [B] + sorted(
        (bt for bt in range(8, B, 8) if B % bt == 0), reverse=True
    )


def choose_tiles(B, S, A, E, per_sample, eps_per_sample, eps_depth):
    """(batch_tile, arc_tile, predicted_bytes) for the largest-tile plan
    whose backward footprint fits the scoped-VMEM budget (3% margin).

    Shared projections never chunk (arc_tile None; one [B,S]x[S,A] MXU
    matmul per step is the whole point).  Per-sample tables use idx mode:
    prefer the full batch with the largest arc chunk, shrinking the chunk
    before the batch tile (chunking costs only VPU one-hot rebuilds;
    batch tiles add grid legs).  batch_tile None means nothing fits and
    the caller must fall back to the per-step kernel."""
    budget = 0.97 * VMEM_LIMIT_BYTES
    legal = _legal_batch_tiles(B)
    if not per_sample:
        for bt in legal:
            demand = predict_vmem_bytes(
                bt, S, A, E, per_sample, eps_per_sample, eps_depth
            )
            if demand <= budget:
                return bt, None, demand
        return None, None, predict_vmem_bytes(
            legal[-1], S, A, E, per_sample, eps_per_sample, eps_depth
        )
    pad128 = A + (-A) % 128
    cand = {c for c in (1024, 512, 256, 128) if c <= pad128}
    if pad128 <= 1024:
        cand.add(pad128)  # small graphs: a single full-width chunk
    # padded arc count sets the per-step matmul cost — least waste first,
    # largest chunk (fewest VPU one-hot rebuilds) as the tiebreak
    chunks = sorted(cand, key=lambda c: (A + (-A) % c, -c))
    for bt in legal:
        for ac in chunks:
            demand = predict_vmem_bytes(
                bt, S, A, E, per_sample, eps_per_sample, eps_depth, ac
            )
            if demand <= budget:
                return bt, ac, demand
    return None, None, predict_vmem_bytes(
        legal[-1], S, A, E, per_sample, eps_per_sample, eps_depth,
        chunks[-1],
    )


def choose_batch_tile(B, S, A, E, per_sample, eps_per_sample, eps_depth):
    """Back-compat wrapper over ``choose_tiles``: (batch_tile, bytes)."""
    bt, _, demand = choose_tiles(
        B, S, A, E, per_sample, eps_per_sample, eps_depth
    )
    return bt, demand


def _projections(idx, S_pad, A_mult=128):
    """[Ba, A] int arc endpoints -> one-hot projection [S_pad, A_pad]
    (shared, Ba == 1) or [Ba, S_pad, A_pad] (per-sample)."""
    idx_p = _pad_axis(idx.astype(jnp.int32), A_mult, -1)
    oh = jax.nn.one_hot(idx_p, S_pad, axis=1, dtype=jnp.float32)
    return oh[0] if idx.shape[0] == 1 else oh


def scan_scores(em_arc, table_fields, alpha0, accept, input_lengths,
                eps_depth, batch_tile=None, arc_tile=None):
    """Convenience wrapper: build projections, pad + layout inputs, run the
    whole-scan kernel, and reduce to per-sample scores.

    Args:
      em_arc: [B, T, A] per-arc emissions (post gather_channels).
      table_fields: (src, dst, weight, eps_src, eps_dst, eps_weight),
        each [Ba, ·] with Ba in {1, B}.
      alpha0: [B, S] start potentials after the initial eps closure.
      accept: [Ba, S] accepting potentials.
      input_lengths: [B] int.
      eps_depth: static closure bound.
      batch_tile: static samples per grid tile (see sparse_scan).
      arc_tile: static in-kernel one-hot chunk width for per-sample main
        arcs (idx mode); ignored for shared (1-D / [1, A]) tables.
    """
    from .semiring import logsumexp

    src, dst, weight, eps_src, eps_dst, eps_w = table_fields
    B, T, A = em_arc.shape
    S = alpha0.shape[-1]
    S_pad = S + (-S) % 128
    per_sample = src.shape[0] > 1
    if not per_sample:
        arc_tile = None
    arc_mult = arc_tile if arc_tile is not None else 128

    # shared weights are materialized to [B, A] on the host: Mosaic rejects
    # in-kernel [1, n] -> [B, n] broadcasts, and jnp.broadcast_to's AD
    # transpose sums the per-sample dw back to the shared table for free
    bcast = lambda x: jnp.broadcast_to(x, (B,) + x.shape[1:])

    alpha0_p = _pad_axis(alpha0, 128, NEG)
    em_p = _pad_axis(em_arc, arc_mult, 0.0).transpose(1, 0, 2)
    if arc_tile is not None:
        # idx mode: ship int32 endpoints; the kernel builds one-hot
        # chunks in-kernel (padding arcs are -1: all-zero columns)
        p_src = _pad_axis(src.astype(jnp.int32), arc_mult, -1)
        p_dst = _pad_axis(dst.astype(jnp.int32), arc_mult, -1)
    else:
        p_src = _projections(src, S_pad)
        p_dst = _projections(dst, S_pad)
    w_p = bcast(_pad_axis(weight, arc_mult, NEG))
    if eps_depth > 0 and eps_src.shape[-1] > 0:
        p_esrc = _projections(eps_src, S_pad)
        p_edst = _projections(eps_dst, S_pad)
        eps_w_p = bcast(_pad_axis(eps_w, 128, NEG))
    else:
        p_esrc = jnp.zeros((S_pad, 128), jnp.float32)
        p_edst = jnp.zeros((S_pad, 128), jnp.float32)
        eps_w_p = jnp.full((B, 128), NEG, jnp.float32)
        eps_depth = 0

    final = sparse_scan(
        alpha0_p, em_p, p_src, p_dst, w_p, p_esrc, p_edst, eps_w_p,
        input_lengths.astype(jnp.float32)[:, None], eps_depth, batch_tile,
        arc_tile,
    )[:, :S]
    return logsumexp(final + accept, axis=-1)
