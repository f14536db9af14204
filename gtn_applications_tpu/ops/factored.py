"""Transition-factored transducer scoring for full n-gram models.

The generic transducer path composes the n-gram transition WFST into each
per-sample alignment graph on the host (reference transducer.py:260-280),
multiplying states by the context count and arcs by the token count, then
scores the product with the sparse scan.  On TPU this is wasteful: the
product graph is *structured*.  Every alignment-graph state has a unique
in-label (each token state of the token graph only receives arcs carrying
its own token — verified at prepare time), so a bigram transition factor
w(l_prev, l_cur) depends only on (source state, destination state) of each
alignment arc, and the composed forward recursion factorizes as

    v[b, s, l']  = alpha[b, s] + (lab_oh[b, s] @ W)[l']          (MXU)
    M[b, s', l'] = lse over predecessors s of v[b, s, l']
                 = shift + log(adj_exp[b] @ exp(v - shift))      (MXU)
    alpha'[b,s'] = em[b, t, L(s')] + M[b, s', L(s')]         (one-hot pick)

with ``adj_exp[b, s', s] = sum over arcs s->s' of exp(arc weight)``
(lse-merging parallel arcs exactly) and ``lab_oh`` the one-hot in-label
table.  All contractions are batched matmuls against host-built opaque
0/1 matrices — nothing lowers to XLA's serial gather loops.  The start
row ws(l) and the end row we(l) absorb the n-gram graph's root arcs and
final-epsilon arcs.  The normalizer over the transitions alone is the
same recursion on the dense label lattice (``dense_ngram_norm``).

Numerics: the same max-shifted exp-matmul recipe as the ASG free-energy
scan (ops/lattice.py asg_fcc_score); shifts are stop-gradiented, exact
selections (one-hot rows) carry no rounding.

Precision envelope: the exp-matmul contraction shares ONE shift per
(batch, state) row, so terms more than ~88 nats (fp32 exp underflow)
below the row max flush to zero — unlike the composed per-arc scan,
whose per-destination shifts keep every state exact.  Measured: all
tiers agree to <5e-4 for emission scales up to ~±25 nats/frame
(log-softmax outputs are ≤0 and far tighter); at synthetic ±45-nat
frames the dense and destination-factored tiers deviate identically
from the fp64 oracle (~1.4 nats at T=4) while the composed path stays
exact.  The composed path (`GTN_TRANSDUCER_FACTORED=off`) remains the
full-dynamic-range fallback.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .semiring import DEAD, NEG, logaddexp, logsumexp

_FLOOR = 1e-37
# frame-scan unroll factor: each factored scorer runs a T-step lax.scan
# of small batched matmuls, where per-iteration while-loop overhead can
# rival the math; unrolling fuses several frames per loop iteration.
# A/B'd on chip via GTN_FACTORED_UNROLL (tools/chip/chip_ngram2_profile).
_SCAN_UNROLL = int(os.environ.get("GTN_FACTORED_UNROLL", "1"))
# rematerialize the frame step in the backward pass: stores only the
# [B, S] carry and recomputes the step's intermediates.  Measured on
# chip: helps the ngram-2 XLA scan ~10% alone (6.95 -> 6.22 ms/iter)
# but HURTS the plain path (2.11 -> 3.12) and explodes with unroll=4
# (10.4) — the scans are latency-bound with path-dependent residual
# shapes.  Default off (the r3-parity configuration).
_SCAN_REMAT = os.environ.get("GTN_FACTORED_REMAT", "0") not in ("0", "off")


def _maybe_remat(step):
    return jax.checkpoint(step) if _SCAN_REMAT else step


# whole-scan Pallas dispatch for the dense-adjacency / full-ngram
# scorers (ops/dense_scan_pallas.py).  Chip-measured verdict (round 4,
# tools/chip/chip_dense_scan_verify.py): the kernels LOSE to the XLA
# lax.scan at both protocols — plain word-decomps 4.45 vs 2.11 ms/iter,
# ngram-2 8.93 vs 6.95 — Mosaic's per-grid-step overhead (~40 us)
# exceeds XLA's while-loop overhead (~20 us) for these tiny frame
# bodies, the opposite of the sparse per-arc case the r3 whole-scan
# kernel won.  Default OFF everywhere; "on" keeps the kernels reachable
# (differential-tested in tests/test_dense_scan.py) for stacks where
# the loop-overhead balance differs.
_DENSE_SCAN_IMPL = os.environ.get("GTN_DENSE_SCAN", "off")

# analytic alpha-beta custom VJP for the dense scans (ops/factored_vjp):
# the backward becomes ONE reverse scan of forward-frame cost instead of
# XLA's scan transpose (~2.4 forward-equivalents, chip-measured).  The
# full-ngram scorer additionally folds its bigram factor into a fixed
# [B, S, S] exp-matrix, collapsing the per-frame [B, S, N] einsum to a
# one-time build.  "off" keeps the original autodiffed scans as the
# differential oracle (tests/test_factored_vjp.py).
_VJP_IMPL = os.environ.get("GTN_FACTORED_VJP", "auto")


def _use_vjp():
    return _VJP_IMPL not in ("off", "0")


def _use_dense_scan(B, S):
    if _DENSE_SCAN_IMPL != "on":
        return False
    from . import dense_scan_pallas as dsp

    return dsp.fits(B, S + (-S) % 128)


def _use_factored_scan(B, S, N):
    if _DENSE_SCAN_IMPL != "on":
        return False
    from . import dense_scan_pallas as dsp

    return dsp.fits_factored(B, S + (-S) % 128, N + (-N) % 128)


def _f32_matmuls(fn):
    """Pin every contraction traced inside ``fn`` to float32 MXU passes.

    The TPU default matmul precision is bf16: each exp-matmul step then
    rounds its operands to ~2^-8 relative, and the recursion accumulates
    that over T frames into whole-nat loss errors (measured 0.28 nats vs
    the composed path at T=250 on chip, N(0,1) emissions).  The Pallas
    scan kernels pin Precision.HIGHEST for the same reason; this module's
    XLA einsums need the same treatment.  CPU matmuls are always f32, so
    the interpret-mode differential tests cannot catch a regression here
    — keep the decorator on every public scoring/decode entry point."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped


@_f32_matmuls
def alignment_lattice_score(em, adj_exp, lab_oh, start, accept,
                            input_lengths=None):
    """Forward score of per-sample alignment lattices with NO transition
    factor (``transitions=None`` transducers — e.g. the 1k-wordpiece
    decomposition marginalizer).  The dense exp-adjacency recursion of
    ``factored_lattice_score`` with the bigram machinery dropped: one
    [B, S] x [B, S, S] exp-matmul per frame instead of a per-arc scan —
    on chip the sparse whole-scan's per-sample one-hot chunk builds
    (Bt x S x A VPU writes per frame) dominate at exactly these shapes.
    Behavioral spec: reference transducer.py:260-296 with
    transitions=None (score term only; the caller log_softmaxes the
    emissions, so no separate normalizer exists).

    Args:
      em: [B, T, N] emissions (N = alignment channels incl. blank).
      adj_exp: [B, S, S] f32 — adj_exp[b, s', s] = sum_{arcs s->s'} e^w
        (parallel arcs lse-merge exactly).
      lab_oh: [B, S, N] f32 — one-hot of each state's unique in-label.
      start, accept: [B, S] f32 potentials (0 / NEG).
    Returns [B] scores.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    em_state = jnp.einsum("btn,bsn->bts", em, lab_oh)         # [B, T, S]
    has_lab = jnp.sum(lab_oh, axis=-1) > 0.0                  # [B, S]

    if _use_dense_scan(B, em_state.shape[-1]):
        # whole-scan Pallas kernel (opt-in; chip-measured slower than
        # the XLA scan here — see _DENSE_SCAN_IMPL note).  Cotangents
        # flow to emissions and adjacency only; start/lab/lengths are
        # prepared data, never parameters.
        from . import dense_scan_pallas as dsp

        S = em_state.shape[-1]
        pad = (-S) % 128
        if pad:
            em_p = jnp.pad(em_state, ((0, 0), (0, 0), (0, pad)))
            adj_p = jnp.pad(adj_exp, ((0, 0), (0, pad), (0, pad)))
            start_p = jnp.pad(start, ((0, 0), (0, pad)),
                              constant_values=NEG)
            lab_p = jnp.pad(has_lab.astype(jnp.float32),
                            ((0, 0), (0, pad)))
            acc_p = jnp.pad(accept, ((0, 0), (0, pad)),
                            constant_values=NEG)
        else:
            em_p, adj_p, start_p = em_state, adj_exp, start
            lab_p, acc_p = has_lab.astype(jnp.float32), accept
        alpha = dsp.dense_scan(
            em_p, adj_p, start_p, lab_p,
            input_lengths.astype(jnp.float32),
        )
        score = logsumexp(alpha + acc_p, axis=1)
        base0 = logsumexp(start + accept, axis=1)
        score0 = jnp.where(base0 > DEAD, base0, NEG)
        return jnp.where(input_lengths > 0, score, score0)

    # frame 1: enter via an arc from a start state
    z1 = jnp.einsum("bus,bs->bu", adj_exp, jnp.exp(
        jnp.minimum(start, 0.0)) * (start > NEG / 2))
    alpha = jnp.where(
        (z1 > 0.0) & has_lab,
        em_state[:, 0] + jnp.log(jnp.maximum(z1, _FLOOR)),
        NEG,
    )

    if _use_vjp():
        from . import factored_vjp as fvjp

        alpha = fvjp.lattice_scan(
            em_state[:, 1:], adj_exp, alpha,
            fvjp.live_mask(T, input_lengths),
            has_lab.astype(jnp.float32), jnp.zeros((), jnp.float32),
        )
    else:
        def step(alpha, xs):
            em_s_t, t = xs
            sh = jax.lax.stop_gradient(
                jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
            )
            z = jnp.einsum("bus,bs->bu", adj_exp, jnp.exp(alpha - sh))
            new = jnp.where(
                (z > 0.0) & has_lab,
                em_s_t + sh + jnp.log(jnp.maximum(z, _FLOOR)),
                NEG,
            )
            live = (t < input_lengths)[:, None]
            return jnp.where(live, new, alpha), None

        alpha, _ = jax.lax.scan(
            _maybe_remat(step), alpha,
            (em_state.transpose(1, 0, 2)[1:], jnp.arange(1, T)),
            unroll=_SCAN_UNROLL,
        )
    score = logsumexp(alpha + accept, axis=1)
    # zero-frame samples: the empty path (start ∩ accept), if any
    base0 = logsumexp(start + accept, axis=1)
    score0 = jnp.where(base0 > DEAD, base0, NEG)
    return jnp.where(input_lengths > 0, score, score0)


@_f32_matmuls
def factored_lattice_score(em, adj_exp, lab_oh, start, accept, ws, W, we,
                           input_lengths=None, we0=0.0):
    """Forward score of per-sample alignment lattices under a bigram
    transition factor.

    Args:
      em: [B, T, N] emissions (N = alignment channels incl. blank).
      adj_exp: [B, S, S] f32 — adj_exp[b, s', s] = sum_{arcs s->s'} e^w.
      lab_oh: [B, S, N] f32 — one-hot of each state's unique in-label
        (zero rows for padding / pure-start states).
      start, accept: [B, S] f32 potentials (0 / NEG).
      ws, W, we: [N], [N, N] (W[l_prev, l_cur]), [N] transition rows.
      input_lengths: [B] int or None.
      we0: scalar end weight of the empty path (the n-gram root's final
        epsilon); only reachable when a sample's input_length is 0.
    Returns [B] scores.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    # per-state emission/transition rows via exact one-hot contraction
    em_state = jnp.einsum("btn,bsn->bts", em, lab_oh)         # [B, T, S]
    ws_state = jnp.einsum("n,bsn->bs", ws, lab_oh)
    we_state = jnp.einsum("n,bsn->bs", we, lab_oh)
    wsel = jnp.einsum("bsn,nl->bsl", lab_oh, W)               # [B, S, N]
    has_lab = jnp.sum(lab_oh, axis=-1) > 0.0                  # [B, S]

    S = em_state.shape[-1]
    if _use_factored_scan(B, S, N):
        # whole-scan Pallas kernel (dense_scan_pallas.factored_scan):
        # one launch for the T-frame recursion; grads flow to em_state /
        # adj_exp / wsel / ws_state, which autodiff routes back to em,
        # W, ws through the einsums above.
        from . import dense_scan_pallas as dsp

        ps, pn = (-S) % 128, (-N) % 128
        em_p = jnp.pad(em_state, ((0, 0), (0, 0), (0, ps)))
        adj_p = jnp.pad(adj_exp, ((0, 0), (0, ps), (0, ps)))
        wsel_p = jnp.pad(wsel, ((0, 0), (0, ps), (0, pn)))
        lab_p = jnp.pad(lab_oh, ((0, 0), (0, ps), (0, pn)))
        ws_p = jnp.pad(ws_state, ((0, 0), (0, ps)))
        start_p = jnp.pad(start, ((0, 0), (0, ps)), constant_values=NEG)
        alpha = dsp.factored_scan(
            em_p, adj_p, wsel_p, lab_p, ws_p, start_p,
            input_lengths.astype(jnp.float32),
        )[:, :S]
        final = alpha + accept + we_state
        score = logsumexp(final, axis=1)
        base0 = logsumexp(start + accept, axis=1)
        score0 = jnp.where(base0 > DEAD, base0 + we0, NEG)
        return jnp.where(input_lengths > 0, score, score0)

    # frame 1: enter via an arc from a start state, paying ws(l)
    z1 = jnp.einsum("bus,bs->bu", adj_exp, jnp.exp(
        jnp.minimum(start, 0.0)) * (start > NEG / 2))
    alpha = jnp.where(
        (z1 > 0.0) & has_lab,
        em_state[:, 0] + ws_state + jnp.log(jnp.maximum(z1, _FLOOR)),
        NEG,
    )

    if _use_vjp():
        from . import factored_vjp as fvjp

        # fold the bigram factor into a frame-invariant exp-matrix:
        # K[b, u, s] = adj[b, u, s] * e^{W[l_s, l_u] - k_shift} — the
        # per-frame [B, S, N] einsum collapses to this one-time build
        # (cost of a single old frame).  Envelope: one global shift for
        # W (vs the old per-frame per-label shift); entries > ~88 nats
        # below max(W) flush — within this module's documented envelope,
        # with GTN_TRANSDUCER_FACTORED=off the full-range fallback.
        k_shift = jax.lax.stop_gradient(jnp.maximum(jnp.max(W), 0.0))
        src_rows = jnp.einsum(
            "bsn,nl->bsl", lab_oh, jnp.exp(W - k_shift))      # e^W[l_s, :]
        K_exp = adj_exp * jnp.einsum("bsl,bul->bus", src_rows, lab_oh)
        alpha = fvjp.lattice_scan(
            em_state[:, 1:], K_exp, alpha,
            fvjp.live_mask(T, input_lengths),
            has_lab.astype(jnp.float32), k_shift,
        )
    else:
        def step(alpha, xs):
            em_s_t, t = xs
            v = alpha[:, :, None] + wsel                      # [B, S, N]
            shift = jax.lax.stop_gradient(
                jnp.max(v, axis=1, keepdims=True))            # [B, 1, N]
            shift = jnp.maximum(shift, NEG)
            z = jnp.einsum(
                "bus,bsl->bul", adj_exp, jnp.exp(v - shift))  # [B, S, N]
            m = jnp.where(
                z > 0.0,
                shift + jnp.log(jnp.maximum(z, _FLOOR)),
                NEG,
            )
            pick = jnp.sum(m * lab_oh, axis=-1)               # [B, S]
            new = jnp.where(has_lab, em_s_t + pick, NEG)
            live = (t < input_lengths)[:, None]
            return jnp.where(live, new, alpha), None

        alpha, _ = jax.lax.scan(
            _maybe_remat(step), alpha,
            (em_state.transpose(1, 0, 2)[1:], jnp.arange(1, T)),
            unroll=_SCAN_UNROLL,
        )
    final = alpha + accept + we_state
    score = logsumexp(final, axis=1)
    # zero-frame samples: only paths that consume nothing (start ∩ accept
    # in the alignment lattice, the root's final epsilon in the n-gram);
    # we0 joins only when the empty path exists, else its grad would leak
    base0 = logsumexp(start + accept, axis=1)
    score0 = jnp.where(base0 > DEAD, base0 + we0, NEG)
    return jnp.where(input_lengths > 0, score, score0)


@_f32_matmuls
def dense_ngram_norm(em, ws, W, we, input_lengths=None, we0=0.0):
    """Normalizer: forward score of emissions through the full n-gram
    transition lattice alone (dense over label contexts).

    alpha_1[l] = ws[l] + em[0, l];  alpha_t[l'] = em[t, l'] +
    lse_l(alpha[l] + W[l, l']);  score = lse_l(alpha_T[l] + we[l]).
    Zero-frame samples score the empty path: ``we0``.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    alpha = ws[None, :] + em[:, 0]
    # NOTE (round 5): the analytic custom VJP was tried here and
    # REVERTED after a chip A/B (0.802 vs 0.741 ms fwd+bwd at the
    # ngram-2 protocol shape, tools/chip/drives/drive_norm.py): like
    # the ASG free-energy scan, this step is one small SHARED
    # [B, N] @ [N, N] matmul whose transpose is the same matmul — XLA's
    # backward is already near-optimal and the custom path's recompute
    # bookkeeping nets a small loss.  The VJP stays on the per-sample
    # scorers above, where it removes real per-frame work.
    mt = jax.lax.stop_gradient(jnp.max(W, axis=0))            # [N]
    exp_W = jnp.exp(W - mt[None, :])

    def step(alpha, xs):
        em_t, t = xs
        ma = jax.lax.stop_gradient(
            jnp.max(alpha, axis=1, keepdims=True))
        z = jnp.exp(alpha - ma) @ exp_W                       # MXU
        new = em_t + ma + mt[None, :] + jnp.log(jnp.maximum(z, _FLOOR))
        return jnp.where(
            (t < input_lengths)[:, None], new, alpha), None

    alpha, _ = jax.lax.scan(
        _maybe_remat(step), alpha,
        (em.transpose(1, 0, 2)[1:], jnp.arange(1, T)),
        unroll=_SCAN_UNROLL,
    )
    final = alpha + we[None, :]
    return jnp.where(
        input_lengths > 0, logsumexp(final, axis=1), jnp.asarray(we0, em.dtype)
    )


def _ctx_closure(x, E_exp, e_shift, depth):
    """Bounded epsilon (backoff) closure along the trailing context axis.

    ``x [..., S_c]`` in log space; ``E_exp[c, c'] = sum_{eps arcs c->c'}
    e^(w - e_shift)``.  Mirrors sparse._eps_closure's acc/cur recursion."""
    acc = x
    cur = x
    for _ in range(depth):
        m = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(cur, axis=-1, keepdims=True), NEG)
        )
        z = jnp.einsum("...c,cd->...d", jnp.exp(cur - m), E_exp)
        cur = jnp.where(
            z > 0.0, m + e_shift + jnp.log(jnp.maximum(z, _FLOOR)), NEG
        )
        acc = logaddexp(acc, cur)
    return acc


def eps_chain_struct(eps_src, eps_dst, num_states, eps_depth,
                     max_paths=32):
    """Host-static low-rank structure of a backoff automaton's epsilon
    closure.

    In the n-gram automata the offline builder emits, epsilon paths
    from any context land in a TINY set of states — the backoff
    (lower-order context) chain plus the merged ``</s>`` accept state
    (its arcs are epsilon too, so states have fan-out ~2).  ``Mc - I``
    (the off-identity part of the closure matrix ``sum_k E^k``) is
    then rank-K with K = |union of landing states| (a bigram LM: 2 of
    ~1000), and the per-frame closure matmul ``Z @ Mc``
    ([.., S_c] @ [S_c, S_c]) collapses to ``Z + (Z @ U) @ C`` with
    U [S_c, K], C [K, S_c] — ~250x fewer FLOPs at 1k-wordpiece scale
    (chip numbers in docs/chip_verification.md).

    Enumerates ALL epsilon paths of length 1..eps_depth per state
    (fan-out safe).  Returns None (callers keep the dense closure) if
    there are no epsilon arcs, some state has more than ``max_paths``
    paths, or 2K > num_states (no win).  Otherwise
    (path_arcs [S, P, depth] int32 — arc ids of each path, -1 pad
    (unused path slots have path_arcs[s, p, 0] == -1);
    path_col_oh [S, P, K] f32 — one-hot of each path's landing
    column; col_onehot [K, S] f32).  Weights stay learnable: the
    device-side companion ``eps_lowrank_build`` folds per-step
    effective arc weights into U.
    """
    eps_src = np.asarray(eps_src)
    eps_dst = np.asarray(eps_dst)
    if len(eps_src) == 0 or eps_depth == 0:
        return None
    arcs_of = [[] for _ in range(num_states)]
    for i, s in enumerate(eps_src):
        arcs_of[s].append(i)
    paths = []  # per state: list of (arc_id_tuple, end_state)
    for s in range(num_states):
        got = []
        frontier = [((), s)]
        for _ in range(eps_depth):
            nxt = []
            for chain, at in frontier:
                for a in arcs_of[at]:
                    p = (chain + (a,), int(eps_dst[a]))
                    got.append(p)
                    nxt.append(p)
            frontier = nxt
            if len(got) > max_paths:
                return None
        paths.append(got)
    P = max((len(g) for g in paths), default=0)
    if P == 0:
        return None
    cols = np.unique([e for g in paths for _, e in g])
    K = len(cols)
    if 2 * K > num_states:
        return None
    col_of = np.full((num_states,), -1, np.int64)
    col_of[cols] = np.arange(K)
    path_arcs = np.full((num_states, P, eps_depth), -1, np.int32)
    path_col_oh = np.zeros((num_states, P, K), np.float32)
    for s, g in enumerate(paths):
        for p, (chain, end) in enumerate(g):
            path_arcs[s, p, : len(chain)] = chain
            path_col_oh[s, p, col_of[end]] = 1.0
    col_onehot = np.zeros((K, num_states), np.float32)
    col_onehot[np.arange(K), cols] = 1.0
    return path_arcs, path_col_oh, col_onehot


def eps_lowrank_build(ew_eff, struct):
    """Device-side companion of ``eps_chain_struct``: fold the per-step
    effective epsilon arc weights ``ew_eff [E]`` (static graph weight +
    learnable offset, NO shift) into the low-rank closure factors.
    Returns (U [S, K], C [K, S]): closure(z) = z + (z @ U) @ C, exactly
    ``z @ (I + sum_k E^k)`` with E[c, d] = e^{ew_eff(arc c->d)} — each
    path's weight is the product of its arcs' exp-weights, i.e. exp of
    the sum along the path.  Overflow envelope matches the dense
    exp-domain closure: a path-sum above ~+80 nats (far outside any
    trainable regime) overflows f32."""
    path_arcs, path_col_oh, col_onehot = struct
    w = jnp.where(path_arcs >= 0,
                  ew_eff[np.maximum(path_arcs, 0)], 0.0)      # [S, P, D]
    valid = path_arcs[:, :, 0] >= 0                           # np [S, P]
    pathw = jnp.where(valid, jnp.exp(jnp.sum(w, axis=2)), 0.0)
    U = jnp.einsum("sp,spk->sk", pathw, path_col_oh,
                   precision=jax.lax.Precision.HIGHEST)
    return U, col_onehot


def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _lowrank_close_exp(z2d, eps_lowrank):
    """closure(z) = z + (z @ U) @ C on a [rows, S_c] exp-domain matrix."""
    U, C = eps_lowrank
    return z2d + _mm(_mm(z2d, U), C)


@_f32_matmuls
def backoff_factored_score(em, adj_exp, lab_oh, a_start, a_accept,
                           ctx_start, ctx_accept, T_exp, t_shift,
                           E_exp, e_shift, eps_depth, input_lengths=None):
    """Forward score of alignment lattices composed with an arbitrary
    (pruned / backoff) transition WFST over contexts — WITHOUT composing.

    The product state is (alignment state, context state); because every
    alignment state has a unique in-label, one frame factorizes into
      U[b, a, c]  = lse over align preds s of alpha[b, s, c]   (adjacency)
      V[b, a, d]  = lse over contexts c of U + w_real[c, d, L(a)]
                    (per-label exp-matrices, one einsum + one-hot pick)
      alpha'      = em[t, L(a)] + V, then backoff closure on the context
                    axis (depth-bounded, matching the composed table's
                    epsilon closure).
    Behavioral spec: reference transducer.py:260-296 with a loaded
    transition graph (scripts/build_transitions.py output).

    Args:
      em: [B, T, N] emissions.
      adj_exp / lab_oh / a_start / a_accept: alignment-side tables as in
        ``factored_lattice_score``.
      ctx_start, ctx_accept: [S_c] transition-state potentials (0 / NEG).
      T_exp: [N, S_c, S_c] — T_exp[l, c, d] = sum over real transition
        arcs c->d labeled l of e^(w - t_shift); t_shift a scalar.
      E_exp: [S_c, S_c] backoff epsilon matrix (shifted by e_shift).
      eps_depth: static closure bound of the transition graph.
    Returns [B] scores.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    em_state = jnp.einsum("btn,bsn->bts", em, lab_oh)         # [B, T, S_a]
    has_lab = jnp.sum(lab_oh, axis=-1) > 0.0                  # [B, S_a]

    ctx0 = _ctx_closure(ctx_start[None], E_exp, e_shift, eps_depth)[0]
    alpha0 = a_start[:, :, None] + ctx0[None, None, :]        # [B,S_a,S_c]

    def step(alpha, xs):
        em_s_t, t = xs
        # alignment adjacency contraction (shift constant over sources)
        sh1 = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        )
        z1 = jnp.einsum("bus,bsc->buc", adj_exp, jnp.exp(alpha - sh1))
        U = jnp.where(
            z1 > 0.0, sh1 + jnp.log(jnp.maximum(z1, _FLOOR)), NEG
        )
        # transition application per destination label, picked by L(a)
        sh2 = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(U, axis=2, keepdims=True), NEG)
        )
        Z = jnp.einsum("bac,lcd->bald", jnp.exp(U - sh2), T_exp)
        Y = jnp.einsum("bald,bal->bad", Z, lab_oh)
        V = jnp.where(
            Y > 0.0, sh2 + t_shift + jnp.log(jnp.maximum(Y, _FLOOR)), NEG
        )
        new = em_s_t[:, :, None] + V
        new = jnp.where(has_lab[:, :, None], new, NEG)
        new = _ctx_closure(new, E_exp, e_shift, eps_depth)
        live = (t < input_lengths)[:, None, None]
        return jnp.where(live, new, alpha), None

    alpha, _ = jax.lax.scan(
        _maybe_remat(step), alpha0,
        (em_state.transpose(1, 0, 2), jnp.arange(T)),
        unroll=_SCAN_UNROLL,
    )
    final = alpha + a_accept[:, :, None] + ctx_accept[None, None, :]
    score = logsumexp(final.reshape(B, -1), axis=1)
    # zero-frame samples: separable empty-path score; the context half
    # joins only when the alignment admits the empty path, else its
    # gradient (through learned eps/accept weights) would leak
    base0 = logsumexp(a_start + a_accept, axis=1)
    score0 = jnp.where(
        base0 > DEAD, base0 + logsumexp(ctx0 + ctx_accept, axis=0), NEG
    )
    return jnp.where(input_lengths > 0, score, score0)


@_f32_matmuls
def backoff_dst_factored_score(em, adj_exp, lab_oh, a_start, a_accept,
                               ctx_start, ctx_accept, W_adv_exp, D_exp_t,
                               P_dst, t_shift, E_exp, e_shift, eps_depth,
                               input_lengths=None, eps_lowrank=None):
    """``backoff_factored_score`` for transition graphs whose non-self
    arcs have a label-determined destination (every n-gram automaton from
    scripts/build_transitions.py: label l advances to l's context state,
    blank/self-loop arcs stay).  The [N, S_c, S_c] per-label tensor then
    collapses to three [S_c, N]-sized matrices and the per-frame cost
    drops from O(S_a * N * S_c^2) to O(S_a * S_c * N) — the regime where
    1k-wordpiece LMs (S_c ~ N ~ 1000) are dense-scoreable at all.

        Z[b,a,l,d] = sum_c eU[b,a,c] * T_exp[l,c,d]
                   = (eU @ W_adv_exp)[b,a,l] * [d == dst_l]
                     + eU[b,a,d] * D_exp[d,l]
        Y[b,a,d]   = (lab_oh * adv) @ P_dst + eU * (lab_oh @ D_exp_t)

    Args (beyond ``backoff_factored_score``):
      W_adv_exp: [S_c, N] — sum over non-self arcs c->dst_l labeled l of
        e^(w - t_shift).
      D_exp_t: [N, S_c] — transpose of the self-loop matrix D_exp[c, l].
      P_dst: [N, S_c] f32 one-hot of each label's advance destination
        (zero rows for labels with no non-self arcs).
    Returns [B] scores.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    if _use_vjp():
        # exp-linear tier (one folded matmul per stage, single closure
        # matmul): chip-measured 3.06x on the recipe-scale protocol,
        # 5.82x with the low-rank closure (eps_lowrank).
        # The staged path below stays as the full-range oracle.
        return backoff_dst_exp_score(
            em, adj_exp, lab_oh, a_start, a_accept, ctx_start,
            ctx_accept, W_adv_exp, D_exp_t, P_dst, t_shift, E_exp,
            e_shift, eps_depth, input_lengths, eps_lowrank=eps_lowrank,
        )

    em_state = jnp.einsum("btn,bsn->bts", em, lab_oh)         # [B, T, S_a]
    has_lab = jnp.sum(lab_oh, axis=-1) > 0.0                  # [B, S_a]

    ctx0 = _ctx_closure(ctx_start[None], E_exp, e_shift, eps_depth)[0]
    alpha0 = a_start[:, :, None] + ctx0[None, None, :]        # [B,S_a,S_c]

    def step(alpha, xs):
        em_s_t, t = xs
        sh1 = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        )
        z1 = jnp.einsum("bus,bsc->buc", adj_exp, jnp.exp(alpha - sh1))
        U = jnp.where(
            z1 > 0.0, sh1 + jnp.log(jnp.maximum(z1, _FLOOR)), NEG
        )
        sh2 = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(U, axis=2, keepdims=True), NEG)
        )
        eU = jnp.exp(U - sh2)                                  # [B,S_a,S_c]
        adv = eU @ W_adv_exp                                   # [B,S_a,N]
        Y = (lab_oh * adv) @ P_dst + eU * (lab_oh @ D_exp_t)
        V = jnp.where(
            Y > 0.0, sh2 + t_shift + jnp.log(jnp.maximum(Y, _FLOOR)), NEG
        )
        new = em_s_t[:, :, None] + V
        new = jnp.where(has_lab[:, :, None], new, NEG)
        new = _ctx_closure(new, E_exp, e_shift, eps_depth)
        live = (t < input_lengths)[:, None, None]
        return jnp.where(live, new, alpha), None

    alpha, _ = jax.lax.scan(
        _maybe_remat(step), alpha0,
        (em_state.transpose(1, 0, 2), jnp.arange(T)),
        unroll=_SCAN_UNROLL,
    )
    final = alpha + a_accept[:, :, None] + ctx_accept[None, None, :]
    score = logsumexp(final.reshape(B, -1), axis=1)
    base0 = logsumexp(a_start + a_accept, axis=1)
    score0 = jnp.where(
        base0 > DEAD, base0 + logsumexp(ctx0 + ctx_accept, axis=0), NEG
    )
    return jnp.where(input_lengths > 0, score, score0)


@_f32_matmuls
def backoff_dst_exp_score(em, adj_exp, lab_oh, a_start, a_accept,
                          ctx_start, ctx_accept, W_adv_exp, D_exp_t,
                          P_dst, t_shift, E_exp, e_shift, eps_depth,
                          input_lengths=None, eps_lowrank=None):
    """Exp-linear reformulation of ``backoff_dst_factored_score``.

    The dst-factored frame is LINEAR in exp(alpha): with
    E = adj_exp @ exp(alpha), the advance term is a per-state dot
    against W_adv_exp's label column, the self-loop term an elementwise
    product with D's label row, and the backoff closure a fixed matrix
    Mc = sum_k (E_eps * e^{e_shift})^k.  Folding the label selection
    into three per-sample [S_a, S_c] matrices ONCE (WlT, Dl, Pd — the
    same one-time-build trick as the ngram K-fold) turns every frame
    into one batched [S_a, S_a] @ [S_a, S_c] matmul, a VPU
    multiply-reduce, and one shared [*, S_c] @ [S_c, S_c] closure
    matmul — no per-frame N-sized contraction and no depth-times
    shift/log/exp closure ladder.  Chip-measured 3.06x on the recipe-
    scale protocol — a 1k-wordpiece pruned bigram backoff LM
    (S_c=1004, 7.8k arcs) at the word-decomps shapes, fwd+bwd 60.2 vs
    184.3 ms/iter readback-closed, grad parity <= 6.4e-6 — and 5.82x
    with the low-rank closure (``eps_lowrank``, 31.7 ms; see
    eps_chain_struct) (tools/chip/drives/drive_backoff.py;
    docs/captures_r05/drive_backoff.json; ledger rows).

    Envelope: one dynamic shift per frame (max over the whole [S_a,
    S_c] carry) instead of the staged per-axis shifts — terms more than
    ~88 nats below the frame max flush, the same documented envelope as
    the other dense tiers; ``GTN_FACTORED_VJP=off`` keeps the staged
    path (the full-range oracle).  Behavioral spec unchanged
    (reference transducer.py:239-309 with a loaded transition graph).
    """
    B, T, N = em.shape
    S_c = ctx_start.shape[0]
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    em_state = jnp.einsum("btn,bsn->bts", em, lab_oh)         # [B, T, S_a]
    has_lab = jnp.sum(lab_oh, axis=-1) > 0.0                  # [B, S_a]

    # per-sample folded operators (one einsum each, outside the scan)
    WlT = jnp.einsum("bal,cl->bac", lab_oh, W_adv_exp)        # W_adv[c,l_a]
    Dl = jnp.einsum("bal,lc->bac", lab_oh, D_exp_t)           # D[c,l_a]
    Pd = jnp.einsum("bal,lc->bac", lab_oh, P_dst)             # dst one-hot
    # closure: low-rank ``z + (z @ U) @ C`` when the host found the
    # backoff chain structure (eps_chain_struct — ~500x fewer FLOPs per
    # frame at 1k-wordpiece scale), else the dense exp-domain power
    # series (exact either way: E is nilpotent at eps_depth+1 for
    # backoff graphs)
    if eps_lowrank is not None:
        close2d = lambda z: _lowrank_close_exp(z, eps_lowrank)  # noqa: E731
    else:
        E_sh = E_exp * jnp.exp(e_shift)
        Mc = jnp.eye(S_c, dtype=jnp.float32)
        cur = jnp.eye(S_c, dtype=jnp.float32)
        for _ in range(eps_depth):
            cur = cur @ E_sh
            Mc = Mc + cur
        close2d = lambda z: _mm(z, Mc)  # noqa: E731

    # init: alpha0[a, c] = a_start[a] + closure(ctx_start)[c]
    z0 = close2d((jnp.exp(jnp.minimum(ctx_start, 0.0))
                  * (ctx_start > NEG / 2))[None])[0]          # [S_c]
    ctx0 = jnp.where(z0 > 0.0, jnp.log(jnp.maximum(z0, _FLOOR)), NEG)
    alpha0 = a_start[:, :, None] + ctx0[None, None, :]

    def step(alpha, xs):
        em_s_t, t = xs
        sh = jax.lax.stop_gradient(jnp.maximum(
            jnp.max(alpha, axis=(1, 2), keepdims=True), NEG))
        X = jnp.exp(alpha - sh)                               # [B,S_a,S_c]
        Eu = jnp.matmul(adj_exp, X,
                        precision=jax.lax.Precision.HIGHEST)
        advv = jnp.sum(Eu * WlT, axis=2)                      # [B, S_a]
        me = jax.lax.stop_gradient(jnp.maximum(
            jnp.max(em_s_t, axis=1, keepdims=True), NEG))
        w = jnp.exp(em_s_t - me)                              # [B, S_a]
        Z = (advv[:, :, None] * Pd + Eu * Dl) * w[:, :, None]
        Zc = close2d(Z.reshape(B * Z.shape[1], S_c)).reshape(Z.shape)
        new = jnp.where(
            (Zc > 0.0) & has_lab[:, :, None],
            sh + me[:, :, None] + t_shift
            + jnp.log(jnp.maximum(Zc, _FLOOR)),
            NEG,
        )
        live = (t < input_lengths)[:, None, None]
        return jnp.where(live, new, alpha), None

    alpha, _ = jax.lax.scan(
        step, alpha0, (em_state.transpose(1, 0, 2), jnp.arange(T)),
    )
    final = alpha + a_accept[:, :, None] + ctx_accept[None, None, :]
    score = logsumexp(final.reshape(B, -1), axis=1)
    base0 = logsumexp(a_start + a_accept, axis=1)
    score0 = jnp.where(
        base0 > DEAD, base0 + logsumexp(ctx0 + ctx_accept, axis=0), NEG
    )
    return jnp.where(input_lengths > 0, score, score0)


@_f32_matmuls
def backoff_dense_norm(em, ctx_start, ctx_accept, T_exp, t_shift,
                       E_exp, e_shift, eps_depth, input_lengths=None):
    """Normalizer companion of ``backoff_factored_score``: emissions
    through the transition WFST alone as a dense [B, S_c] recursion with
    the per-label exp-matrices — no per-arc segment ops anywhere in the
    backoff-factored loss.

        new[b, d] = lse_{c,l}(alpha[b, c] + w(c, l, d) + em[t, l])

    with the same eps-closure cadence as sparse.forward_score.  Returns
    [B] scores.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    alpha0 = _ctx_closure(
        jnp.broadcast_to(ctx_start[None], (B, ctx_start.shape[0])),
        E_exp, e_shift, eps_depth,
    )

    def step(alpha, xs):
        em_t, t = xs                                           # [B, N]
        sh = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        )
        me = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(em_t, axis=1, keepdims=True), NEG)
        )
        eA = jnp.exp(alpha - sh)
        e_em = jnp.exp(em_t - me)
        z = jnp.einsum("bc,lcd,bl->bd", eA, T_exp, e_em)
        new = jnp.where(
            z > 0.0,
            sh + t_shift + me + jnp.log(jnp.maximum(z, _FLOOR)),
            NEG,
        )
        new = _ctx_closure(new, E_exp, e_shift, eps_depth)
        live = (t < input_lengths)[:, None]
        return jnp.where(live, new, alpha), None

    alpha, _ = jax.lax.scan(
        _maybe_remat(step), alpha0, (em.transpose(1, 0, 2), jnp.arange(T)),
        unroll=_SCAN_UNROLL,
    )
    return logsumexp(alpha + ctx_accept[None, :], axis=1)


@_f32_matmuls
def backoff_dst_norm(em, ctx_start, ctx_accept, W_adv_exp, D_exp_t, P_dst,
                     t_shift, E_exp, e_shift, eps_depth,
                     input_lengths=None, eps_lowrank=None):
    """Normalizer companion of ``backoff_dst_factored_score``: forward
    score of the emissions through the transition WFST alone as a dense
    [B, S_c] recursion (the sparse per-arc scan over a 1k-wordpiece LM's
    arc table would reintroduce exactly the segment ops the factoring
    exists to avoid).

        adv[b, l]  = lse_c(alpha[b, c] + W_adv[c, l])
        new[b, d]  = lse( lse_{l: dst_l = d}(adv[b, l] + em[t, l]),
                          alpha[b, d] + lse_l(D[d, l] + em[t, l]) )

    with the same eps-closure cadence as sparse.forward_score (closure at
    init and after every frame).  Returns [B] scores.
    """
    B, T, N = em.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    # Epsilon closures in the exp domain throughout:
    # closure(base + log z) = base + log(sum_k z @ E_sh^k) with
    # E_sh[c,d] = sum_{eps arcs} e^w — exact (E is nilpotent at
    # eps_depth+1 for backoff graphs), and it removes the per-iteration
    # where/log/exp ladder of the generic log-domain closure.  Envelope:
    # unlike the re-shifting log-domain closure this overflows only if
    # a learned eps weight exceeds ~+80 nats (e^w inf in f32) — far
    # outside any trainable regime.
    #
    # The START closure is folded into the first scan step (gated on
    # t == 0) so the scan's initial carry is PARAMETER-INDEPENDENT:
    # the remote XLA compiler SIGILLs in TpuPriorityFusionQueue's cost
    # model whenever grad-wrt-params flows through an epsilon closure
    # feeding the scan's initial carry with the tables as traced jit
    # arguments (the real training config) — chip-bisected; closures
    # inside the scan body compile fine.
    if eps_lowrank is not None:
        # low-rank chain closure (eps_chain_struct) — same exact series
        def _close(z):
            return _lowrank_close_exp(z, eps_lowrank)
    else:
        E_sh = E_exp * jnp.exp(e_shift)                        # [S_c, S_c]

        def _close(z):
            zc = z
            for _ in range(eps_depth):
                zc = zc @ E_sh
                z = z + zc
            return z

    alpha0 = jnp.broadcast_to(ctx_start[None], (B, ctx_start.shape[0]))
    if T == 0:
        z0 = _close(jnp.exp(alpha0))
        return logsumexp(
            jnp.where(z0 > 0.0, jnp.log(jnp.maximum(z0, _FLOOR)), NEG)
            + ctx_accept[None, :],
            axis=1,
        )

    def step(alpha, xs):
        em_t, t = xs                                           # [B, N]
        # start closure at t == 0; the untaken branch still computes,
        # so shift by a stop-grad max to keep it finite for any alpha
        sh0 = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        )
        z0 = _close(jnp.exp(alpha - sh0))
        closed = jnp.where(
            z0 > 0.0, sh0 + jnp.log(jnp.maximum(z0, _FLOOR)), NEG
        )
        alpha = jnp.where(t == 0, closed, alpha)
        sh = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        )
        me = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(em_t, axis=1, keepdims=True), NEG)
        )
        eA = jnp.exp(alpha - sh)                               # [B, S_c]
        e_em = jnp.exp(em_t - me)                              # [B, N]
        z_adv = eA @ W_adv_exp                                 # [B, N]
        # every term carries the common factor e^(x - sh - t_shift - me)
        z = _close((z_adv * e_em) @ P_dst + eA * (e_em @ D_exp_t))
        new = jnp.where(
            z > 0.0,
            sh + t_shift + me + jnp.log(jnp.maximum(z, _FLOOR)),
            NEG,
        )
        live = (t < input_lengths)[:, None]
        # dead (t >= length) samples keep the t==0-closed carry: their
        # readout is exactly closure(start) + accept, as before
        return jnp.where(live, new, alpha), None

    alpha, _ = jax.lax.scan(
        _maybe_remat(step), alpha0, (em.transpose(1, 0, 2), jnp.arange(T)),
        unroll=_SCAN_UNROLL,
    )
    return logsumexp(alpha + ctx_accept[None, :], axis=1)


def _first_hit_select(z, m, values, axis1_size):
    """values[b, argmin_c{c : z[b, c, x] == m[b, x]}] without gathers.

    Selection by exact-equality one-hot contraction (lowest index wins on
    ties) — on this TPU stack gathers lower to serial scalar loops, so
    every index lookup in the decode is an elementwise mask + reduction.
    ``z [B, C, X]``, ``m [B, X]``, ``values [B, C]`` (f32-exact ints ok).
    Returns [B, X].
    """
    hit = z >= m[:, None, :]                       # exact: m is max of z
    iota = jnp.arange(axis1_size, dtype=jnp.float32)[None, :, None]
    first = jnp.min(jnp.where(hit, iota, float(axis1_size)), axis=1)
    oh = jnp.where(iota == first[:, None, :], 1.0, 0.0)   # [B, C, X]
    return jnp.einsum("bcx,bc->bx", oh, values)


def _trop_closure(alpha, org, E_log, depth):
    """Tropical epsilon closure with origin tracking.

    ``alpha [B, S_c]`` scores, ``org [B, S_c]`` f32 origins (the state
    each entry's score was carried from before any eps hop; f32-exact
    ints).  Returns the closed (best-over-≤depth-hops) scores and their
    origins.  Bounded depth makes closure idempotent for acyclic backoff
    chains.  Gather-free: origins move by one-hot contractions.
    """
    S_c = alpha.shape[1]
    best, best_org = alpha, org
    cur, cur_org = alpha, org
    for _ in range(depth):
        z = cur[:, :, None] + E_log[None]              # [B, c, d]
        nxt = jnp.max(z, axis=1)
        nxt_org = _first_hit_select(z, nxt, cur_org, S_c)
        take = nxt > best
        best_org = jnp.where(take, nxt_org, best_org)
        best = jnp.maximum(best, nxt)
        cur, cur_org = nxt, nxt_org
    return best, best_org


@_f32_matmuls
def backoff_dst_viterbi(em, ctx_start, ctx_accept, W_adv_log, D_log,
                        dst_oh, E_log, eps_depth, input_lengths=None):
    """Tropical decode through a dst-invariant backoff transition WFST
    without materializing the eps-removed composed table (which has
    ~S_c * N arcs at wordpiece-LM scale — per-frame seg_max over it is
    the pathology this module avoids).

    Per frame, for each destination context d:
      advance: max over labels l with dst(l) = d of
               [ max_c(alpha_eps[c] + W_adv_log[c, l]) + em[t, l] ]
      stay:    alpha_eps[d] + max_l(D_log[d, l] + em[t, l])
    with the eps (backoff) closure folded into the frame step and its
    origins recorded, so the per-frame backpointer jumps over eps hops.

    Args:
      em: [B, T, N] emissions.
      ctx_start, ctx_accept: [S_c] potentials (0 / NEG).
      W_adv_log: [S_c, N] — max over non-self arcs c->dst_l labeled l of
        their weight; NEG where absent (parallel arcs tropical-merged).
      D_log: [S_c, N] — self-loop weights; NEG where absent.
      dst_oh: [N, S_c] f32 one-hot destination map (zero rows for labels
        with no advance arc).
      E_log: [S_c, S_c] eps (backoff) weights; NEG where absent.
      eps_depth: static closure bound.
    Returns (labels [B, T] int32, -1 beyond input_length and on
    infeasible samples, matching sparse.viterbi_batch; scores [B]).
    """
    B, T, N = em.shape
    S_c = ctx_start.shape[0]
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    iota_c = jnp.broadcast_to(
        jnp.arange(S_c, dtype=jnp.float32)[None], (B, S_c)
    )
    alpha0 = jnp.broadcast_to(ctx_start[None], (B, S_c))
    # advance destinations: dst_idx[l] = index of the one-hot row (0 for
    # labels with no advance arc — their W column is all NEG)
    dst_idx = jnp.argmax(dst_oh, axis=1).astype(jnp.int32)      # [N]
    lab_iota = jnp.arange(N, dtype=jnp.float32)

    def step(alpha, xs):
        em_t, t = xs                                            # [B, N]
        a_eps, org = _trop_closure(alpha, iota_c, E_log, eps_depth)
        # advance: best source context per label
        z = a_eps[:, :, None] + W_adv_log[None]                 # [B, c, l]
        adv = jnp.max(z, axis=1)                                # [B, N]
        adv_org = _first_hit_select(z, adv, org, S_c)           # [B, N]
        s_lab = adv + em_t                                      # [B, N]
        # per-destination best label among {l : dst(l) = d}
        cand1 = jax.ops.segment_max(
            s_lab.T, dst_idx, num_segments=S_c
        ).T                                                     # [B, S_c]
        cand1 = jnp.maximum(cand1, NEG)
        # winning label per destination: lowest label id among ties
        hit = (s_lab[:, :, None] >= cand1[:, None, :]) & (dst_oh[None] > 0.0)
        l1 = jnp.min(
            jnp.where(hit, lab_iota[None, :, None], float(N)), axis=1
        )                                                       # [B, S_c]
        # source origin of the winning advance label (one-hot pick)
        l1_oh = jnp.where(lab_iota[None, :, None] == l1[:, None, :], 1.0, 0.0)
        p1 = jnp.einsum("bls,bl->bs", l1_oh, adv_org)           # [B, S_c]
        # stay: best self-loop label at d (argmax is a reduction, and its
        # result is the OUTPUT label, never a gather index)
        z2 = D_log[None] + em_t[:, None, :]                     # [B, d, l]
        cand2 = a_eps + jnp.max(z2, axis=2)
        l2 = jnp.argmax(z2, axis=2).astype(jnp.float32)
        take1 = cand1 >= cand2
        new = jnp.maximum(cand1, cand2)
        lab = jnp.where(take1, l1, l2)
        prev = jnp.where(take1, p1, org)
        dead = new <= NEG / 2
        lab = jnp.where(dead, -1.0, lab)
        prev = jnp.where(dead, iota_c, prev)
        live = (t < input_lengths)[:, None]
        new = jnp.where(live, jnp.maximum(new, NEG), alpha)
        lab = jnp.where(live, lab, -1.0)
        prev = jnp.where(live, prev, iota_c)
        return new, (lab, prev)

    alpha, (labs, prevs) = jax.lax.scan(
        step, alpha0, (em.transpose(1, 0, 2), jnp.arange(T))
    )
    a_fin, org_fin = _trop_closure(alpha, iota_c, E_log, eps_depth)
    final = a_fin + ctx_accept[None]
    score = jnp.max(final, axis=1)
    # start the walk at the pre-closure origin of the best final state,
    # carried as a one-hot row (gather-free)
    end_oh = jnp.where(
        iota_c
        == jnp.min(
            jnp.where(final >= score[:, None], iota_c, float(S_c)),
            axis=1, keepdims=True,
        ),
        1.0, 0.0,
    )                                                           # [B, S_c]
    state0 = jnp.sum(end_oh * org_fin, axis=1)                  # [B]

    def backstep(state, tables):
        lab_t, prev_t = tables                                  # [B, S_c]
        state_oh = jnp.where(iota_c == state[:, None], 1.0, 0.0)
        l = jnp.sum(state_oh * lab_t, axis=1)
        p = jnp.sum(state_oh * prev_t, axis=1)
        return p, l

    _, labels_rev = jax.lax.scan(
        backstep, state0, (labs, prevs), reverse=True
    )
    labels = jnp.round(labels_rev.transpose(1, 0)).astype(jnp.int32)
    # infeasible samples decode to the empty path (paths-identical
    # invariant with the other Viterbi implementations)
    labels = jnp.where((score > NEG / 2)[:, None], labels, -1)
    return labels, score


def ngram_rows(params, ngram, num_channels):
    """Split the flat learnable arc-weight vector of
    ``make_transitions_graph(ngram, num_channels)`` into (ws, W, we, we0)
    following its arc creation order (criterions/transducer.py:42-68):
    root arcs [0, N), full-order arcs [N, N + N^2) context-major, then one
    epsilon arc per state (root first) for ngram > 1.  ``we0`` is the
    root's final-epsilon weight (empty-path end weight)."""
    N = num_channels
    p = jnp.asarray(params)
    if ngram == 1:
        ws = p[:N]
        W = jnp.broadcast_to(p[None, :N], (N, N))
        we = jnp.zeros((N,), p.dtype)
        return ws, W, we, jnp.zeros((), p.dtype)
    if ngram == 2:
        ws = p[:N]
        W = p[N:N + N * N].reshape(N, N)
        we = p[N + N * N + 1:N + N * N + 1 + N]
        return ws, W, we, p[N + N * N]
    raise ValueError(f"factored path supports ngram in (1, 2), got {ngram}")
