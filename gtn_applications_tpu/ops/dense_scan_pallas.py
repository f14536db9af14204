"""Whole-scan Pallas kernel for the dense-adjacency lattice recursion.

ops.factored.alignment_lattice_score runs T sequential lax.scan steps of
tiny batched matvecs ([B, S] x [B, S, S]); on this chip each while-loop
iteration costs ~26-30 us regardless of the ~2 us of math in it
(docs/captures_r04: word-decomps 3 ms/iter, ngram-2 numerator 6.6 ms
fwd+bwd at T=250), so the scorer is scan-LATENCY-bound.  This kernel
runs the whole recursion as ONE Pallas launch — grid (batch-tile, T),
alpha carried in VMEM scratch, trajectory streamed to HBM — the same
shape as ops/sparse_scan_pallas (chip-verified r3) with a dense [S, S]
exp-adjacency instead of arc projections.

CHIP VERDICT (round 4, tools/chip/chip_dense_scan_verify.py): exact
parity with the oracle (plain dloss = 0.0, max dgrad 1e-8 at the
word-decomps protocol) but SLOWER — plain 4.45 vs 2.11 ms/iter, ngram-2
8.93 vs 6.95.  Mosaic's per-grid-step overhead (~40 us at these tiny
frame bodies) exceeds XLA's while-loop overhead (~20 us), the opposite
balance from the per-arc sparse case where the r3 whole-scan kernel won
7.6x.  Kept opt-in (GTN_DENSE_SCAN=on) with full differential tests:
the negative result bounds what kernel fusion can buy on latency-bound
scans on this stack.

Forward recursion (exact oracle semantics, factored.py:86-133):

    t = 0 : e = exp(min(start, 0)) * (start > NEG/2)
    t > 0 : sh = max(alpha) (stop-grad), e = exp(alpha - sh)
    z[u]  = sum_s adj_exp[u, s] * e[s]                       (MXU)
    new   = em_state[t] + sh + log(max(z, floor))  where (z > 0) & has_lab
            else NEG;   alpha = new if t < len else alpha

custom_vjp: cotangents flow to ``em_state`` and ``adj_exp`` (the
backward kernel replays the trajectory in reverse, recomputing z).
``start`` / ``has_lab`` / ``lengths`` are prepared DATA (never model
params) and receive zero cotangents — asserted by the dispatch gate in
ops.factored, and differential-tested in tests/test_dense_scan.py.

In-kernel dots use Precision.HIGHEST (Mosaic lowers it to 6 bf16
passes); the per-step dot is ~2 MFLOP so the x6 is noise here, unlike
the arc-projection kernels that needed manual bf16x3.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .semiring import NEG

# Same floor as the oracle these kernels must stay semantically
# identical to (ops/factored.py _FLOOR) — a 1e-30 floor here would clamp
# log z at -69 instead of -85 for underflow-adjacent lattices, a silent
# divergence in the deep-underflow regime.  1e-37 is a NORMAL fp32
# (min normal 1.18e-38), so XLA's subnormal flush cannot zero it.
_FLOOR = 1e-37
_HI = jax.lax.Precision.HIGHEST


def _interpret():
    return jax.default_backend() != "tpu"


def _compiler_params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)


def _bmv(adj, e):
    """z[b, u] = sum_s adj[b, u, s] * e[b, s].

    VPU multiply+reduce, NOT a dot: Mosaic lowers a per-sample matvec
    (M=1) to a loop of tiny MXU passes — measured 2x SLOWER than the
    XLA scan at word-decomps scale (6.2 vs 3.1 ms/iter).  The
    elementwise product over the VMEM-resident [Bt, S, S] tile is exact
    f32 and ~Bt*S^2 FMAs per frame."""
    return jnp.sum(adj * e[:, None, :], axis=2)


def _bmv_t(adj, g):
    """w[b, s] = sum_u adj[b, u, s] * g[b, u] (transposed contraction)."""
    return jnp.sum(adj * g[:, :, None], axis=1)


def _start_e(start):
    return jnp.exp(jnp.minimum(start, 0.0)) * (start > NEG / 2)


def _fwd_kernel(em_ref, adj_ref, start_ref, lab_ref, len_ref,
                traj_ref, alpha_scr):
    i = pl.program_id(1)
    adj = adj_ref[...]
    lab = lab_ref[...] > 0.0
    em = em_ref[0]

    @pl.when(i == 0)
    def _():
        z = _bmv(adj, _start_e(start_ref[...]))
        alpha_scr[...] = jnp.where(
            (z > 0.0) & lab, em + jnp.log(jnp.maximum(z, _FLOOR)), NEG)

    @pl.when(i > 0)
    def _():
        alpha = alpha_scr[...]
        sh = jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        z = _bmv(adj, jnp.exp(alpha - sh))
        new = jnp.where(
            (z > 0.0) & lab,
            em + sh + jnp.log(jnp.maximum(z, _FLOOR)),
            NEG,
        )
        live = (i * jnp.ones_like(len_ref[...])) < len_ref[...]  # [Bt, 1]
        alpha_scr[...] = jnp.where(live, new, alpha)

    traj_ref[0] = alpha_scr[...]


def _bwd_kernel(T, adj_ref, start_ref, lab_ref, len_ref,
                traj_prev_ref, g_final_ref,
                dem_ref, dadj_ref, g_scr, dadj_scr):
    j = pl.program_id(1)
    t = T - 1 - j
    adj = adj_ref[...]
    lab = lab_ref[...] > 0.0

    @pl.when(j == 0)
    def _():
        g_scr[...] = g_final_ref[...]
        dadj_scr[...] = jnp.zeros_like(dadj_scr)

    g = g_scr[...]
    # e: the exp-domain input of frame t (previous alpha, or the start row)
    prev = traj_prev_ref[0]  # traj[t-1]; garbage at t == 0 (unused)
    sh = jnp.maximum(jnp.max(prev, axis=1, keepdims=True), NEG)
    e = jnp.where(t > 0, jnp.exp(prev - sh), _start_e(start_ref[...]))
    z = _bmv(adj, e)
    # frame 0 is always applied; Mosaic cannot legalize select over i1
    # vectors, so express the t==0 case with | instead of jnp.where
    live = ((t * jnp.ones_like(len_ref[...])) < len_ref[...]) | (t == 0)
    applied = live & (z > 0.0) & lab  # [Bt, S]
    ga = jnp.where(applied, g, 0.0)
    dem_ref[0] = ga
    dz = ga / jnp.maximum(z, _FLOOR)
    dadj_scr[...] += dz[:, :, None] * e[:, None, :]
    dadj_ref[...] = dadj_scr[...]
    # propagate to alpha_{t-1}: the applied branch via the contraction,
    # the frozen branch (not live) passes g through; at t == 0 the chain
    # ends (start potentials get no cotangent by contract)
    g_prev = _bmv_t(adj, dz) * e + jnp.where(live, 0.0, g)
    g_scr[...] = jnp.where(t > 0, g_prev, g)


def _tiles(B):
    return 8 if (B % 8 == 0 and B > 8) else B


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def dense_scan(em_state, adj_exp, start, has_lab, lengths_f):
    alpha, _ = _fwd(em_state, adj_exp, start, has_lab, lengths_f)
    return alpha


def _fwd(em_state, adj_exp, start, has_lab, lengths_f):
    B, T, S = em_state.shape
    Bt = _tiles(B)
    grid = (B // Bt, T)
    # time-major blocks: Mosaic requires the last two block dims to be
    # (div 8, div 128) or whole-array — a [Bt, 1, S] block is illegal
    em_tbs = em_state.transpose(1, 0, 2)
    traj = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bt, S), lambda b, t: (t, b, 0)),
            pl.BlockSpec((Bt, S, S), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Bt, S), lambda b, t: (b, 0)),
            pl.BlockSpec((Bt, S), lambda b, t: (b, 0)),
            pl.BlockSpec((Bt, 1), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bt, S), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, S), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(em_tbs, adj_exp, start, has_lab,
      lengths_f.reshape(B, 1))
    return traj[T - 1], traj


def _fwd_vjp(em_state, adj_exp, start, has_lab, lengths_f):
    alpha, traj = _fwd(em_state, adj_exp, start, has_lab, lengths_f)
    return alpha, (traj, adj_exp, start, has_lab, lengths_f)


def _bwd_vjp(res, g_final):
    traj, adj_exp, start, has_lab, lengths_f = res
    T, B, S = traj.shape
    Bt = _tiles(B)
    grid = (B // Bt, T)
    # traj_prev block t-1 (clamped at 0; the t==0 value is never read)
    dem, dadj = pl.pallas_call(
        functools.partial(_bwd_kernel, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, S, S), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
            pl.BlockSpec((Bt, 1), lambda b, j: (b, 0)),
            pl.BlockSpec((1, Bt, S),
                         lambda b, j, T=T: (jnp.maximum(T - 2 - j, 0), b, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, S), lambda b, j, T=T: (T - 1 - j, b, 0)),
            pl.BlockSpec((Bt, S, S), lambda b, j: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, S), jnp.float32),
            jax.ShapeDtypeStruct((B, S, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, S), jnp.float32),
            pltpu.VMEM((Bt, S, S), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(adj_exp, start, has_lab, lengths_f.reshape(B, 1), traj, g_final)
    return (dem.transpose(1, 0, 2), dadj, jnp.zeros_like(start),
            jnp.zeros_like(has_lab), jnp.zeros_like(lengths_f))


dense_scan.defvjp(_fwd_vjp, _bwd_vjp)


def fits(B, S_pad, budget_bytes=100 * 1024 * 1024):
    """Dispatch gate: the backward tile holds adj + dadj accumulator +
    Mosaic double-buffering (~4x Bt*S^2 floats observed headroom)."""
    Bt = _tiles(B)
    return 6 * Bt * S_pad * S_pad * 4 <= budget_bytes


# ---------------------------------------------------------------------
# Full-ngram factored recursion (factored.factored_lattice_score): the
# bigram-selected variant — per frame one batched [S, S] x [S, N]
# exp-matmul instead of the plain matvec.  Same launch structure;
# cotangents flow to em_state, adj_exp, wsel (the lab_oh @ W selection,
# which carries the learnable transition rows) and ws_state (init row).
# ---------------------------------------------------------------------


def _bmm(adj, E):
    """z[b, u, l] = sum_s adj[b, u, s] * E[b, s, l]."""
    return jax.lax.dot_general(
        adj, E, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _bmm_tA(adj, dz):
    """dE[b, s, l] = sum_u adj[b, u, s] * dz[b, u, l]."""
    return jax.lax.dot_general(
        adj, dz, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _bmm_tB(dz, E):
    """dadj[b, u, s] = sum_l dz[b, u, l] * E[b, s, l]."""
    return jax.lax.dot_general(
        dz, E, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _fact_fwd_kernel(em_ref, adj_ref, wsel_ref, lab_ref, ws_ref,
                     start_ref, len_ref, traj_ref, alpha_scr):
    i = pl.program_id(1)
    adj = adj_ref[...]
    lab = lab_ref[...]
    has = jnp.sum(lab, axis=-1) > 0.0
    em = em_ref[0]

    @pl.when(i == 0)
    def _():
        z = _bmv(adj, _start_e(start_ref[...]))
        alpha_scr[...] = jnp.where(
            (z > 0.0) & has,
            em + ws_ref[...] + jnp.log(jnp.maximum(z, _FLOOR)),
            NEG,
        )

    @pl.when(i > 0)
    def _():
        alpha = alpha_scr[...]
        v = alpha[:, :, None] + wsel_ref[...]              # [Bt, S, N]
        sh = jnp.maximum(jnp.max(v, axis=1, keepdims=True), NEG)
        z = _bmm(adj, jnp.exp(v - sh))                     # [Bt, S, N]
        m = jnp.where(z > 0.0, sh + jnp.log(jnp.maximum(z, _FLOOR)), NEG)
        pick = jnp.sum(m * lab, axis=-1)                   # [Bt, S]
        new = jnp.where(has, em + pick, NEG)
        live = (i * jnp.ones_like(len_ref[...])) < len_ref[...]
        alpha_scr[...] = jnp.where(live, new, alpha)

    traj_ref[0] = alpha_scr[...]


def _fact_bwd_kernel(T, adj_ref, wsel_ref, lab_ref, ws_ref, start_ref,
                     len_ref, traj_prev_ref, g_final_ref,
                     dem_ref, dadj_ref, dwsel_ref, dws_ref,
                     g_scr, dadj_scr, dwsel_scr):
    j = pl.program_id(1)
    t = T - 1 - j
    adj = adj_ref[...]
    lab = lab_ref[...]
    has = jnp.sum(lab, axis=-1) > 0.0

    @pl.when(j == 0)
    def _():
        g_scr[...] = g_final_ref[...]
        dadj_scr[...] = jnp.zeros_like(dadj_scr)
        dwsel_scr[...] = jnp.zeros_like(dwsel_scr)

    g = g_scr[...]
    prev = traj_prev_ref[0]

    @pl.when(t > 0)
    def _():
        v = prev[:, :, None] + wsel_ref[...]
        sh = jnp.maximum(jnp.max(v, axis=1, keepdims=True), NEG)
        E = jnp.exp(v - sh)
        z = _bmm(adj, E)
        live = (t * jnp.ones_like(len_ref[...])) < len_ref[...]
        ga = jnp.where(live & has, g, 0.0)                 # [Bt, S]
        dem_ref[0] = ga
        dm = ga[:, :, None] * lab                          # [Bt, S, N]
        dz = jnp.where(z > 0.0, dm / jnp.maximum(z, _FLOOR), 0.0)
        dadj_scr[...] += _bmm_tB(dz, E)
        dv = _bmm_tA(adj, dz) * E                          # [Bt, S, N]
        dwsel_scr[...] += dv
        g_prev = jnp.sum(dv, axis=-1) + jnp.where(live, 0.0, g)
        g_scr[...] = g_prev
        dws_ref[...] = jnp.zeros_like(ws_ref[...])

    @pl.when(t == 0)
    def _():
        z1 = _bmv(adj, e := _start_e(start_ref[...]))
        valid0 = (z1 > 0.0) & has
        ga = jnp.where(valid0, g, 0.0)
        dem_ref[0] = ga
        dws_ref[...] = ga
        dz1 = ga / jnp.maximum(z1, _FLOOR)
        dadj_scr[...] += dz1[:, :, None] * e[:, None, :]

    dadj_ref[...] = dadj_scr[...]
    dwsel_ref[...] = dwsel_scr[...]


@jax.custom_vjp
def factored_scan(em_state, adj_exp, wsel, lab_oh, ws_state, start,
                  lengths_f):
    alpha, _ = _fact_fwd(em_state, adj_exp, wsel, lab_oh, ws_state,
                         start, lengths_f)
    return alpha


def _fact_fwd(em_state, adj_exp, wsel, lab_oh, ws_state, start, lengths_f):
    B, T, S = em_state.shape
    N = wsel.shape[-1]
    Bt = _tiles(B)
    grid = (B // Bt, T)
    em_tbs = em_state.transpose(1, 0, 2)
    traj = pl.pallas_call(
        _fact_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Bt, S), lambda b, t: (t, b, 0)),
            pl.BlockSpec((Bt, S, S), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Bt, S, N), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Bt, S, N), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Bt, S), lambda b, t: (b, 0)),
            pl.BlockSpec((Bt, S), lambda b, t: (b, 0)),
            pl.BlockSpec((Bt, 1), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bt, S), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, S), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(em_tbs, adj_exp, wsel, lab_oh, ws_state, start,
      lengths_f.reshape(B, 1))
    return traj[T - 1], traj


def _fact_fwd_vjp(em_state, adj_exp, wsel, lab_oh, ws_state, start,
                  lengths_f):
    alpha, traj = _fact_fwd(em_state, adj_exp, wsel, lab_oh, ws_state,
                            start, lengths_f)
    return alpha, (traj, adj_exp, wsel, lab_oh, ws_state, start, lengths_f)


def _fact_bwd_vjp(res, g_final):
    traj, adj_exp, wsel, lab_oh, ws_state, start, lengths_f = res
    T, B, S = traj.shape
    N = wsel.shape[-1]
    Bt = _tiles(B)
    grid = (B // Bt, T)
    dem, dadj, dwsel, dws = pl.pallas_call(
        functools.partial(_fact_bwd_kernel, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, S, S), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((Bt, S, N), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((Bt, S, N), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
            pl.BlockSpec((Bt, 1), lambda b, j: (b, 0)),
            pl.BlockSpec((1, Bt, S),
                         lambda b, j, T=T: (jnp.maximum(T - 2 - j, 0), b, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bt, S), lambda b, j, T=T: (T - 1 - j, b, 0)),
            pl.BlockSpec((Bt, S, S), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((Bt, S, N), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((Bt, S), lambda b, j: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, S), jnp.float32),
            jax.ShapeDtypeStruct((B, S, S), jnp.float32),
            jax.ShapeDtypeStruct((B, S, N), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bt, S), jnp.float32),
            pltpu.VMEM((Bt, S, S), jnp.float32),
            pltpu.VMEM((Bt, S, N), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(adj_exp, wsel, lab_oh, ws_state, start, lengths_f.reshape(B, 1),
      traj, g_final)
    return (dem.transpose(1, 0, 2), dadj, dwsel, jnp.zeros_like(lab_oh),
            dws, jnp.zeros_like(start), jnp.zeros_like(lengths_f))


factored_scan.defvjp(_fact_fwd_vjp, _fact_bwd_vjp)


def fits_factored(B, S_pad, N_pad, budget_bytes=100 * 1024 * 1024):
    Bt = _tiles(B)
    return (4 * Bt * S_pad * (2 * S_pad + 4 * N_pad)) * 4 <= budget_bytes
