"""Analytic alpha-beta custom VJP for the dense factored lattice scans.

``ops/factored.py``'s scorers are T-step ``lax.scan``s of exp-matmul
frames.  Left to autodiff, XLA's scan transpose runs a backward whose
per-frame body costs ~2.4x the forward (chip-measured on the ngram-2
protocol: fwd 1.93 ms vs fwd+bwd 6.57 ms at T=250 — the reverse pass
re-applies every transposed contraction and drags the per-step residual
pytree through HBM).  But the recursion is a log-semiring forward
algorithm, and its gradient has a closed form: one *backward* recursion
of the same per-frame cost (the beta pass), with all parameter
cotangents expressible as posterior outer products.  This module
implements that — the exact design ``ops/lattice_pallas.py`` uses for
CTC — for the shared shape all three dense scorers reduce to:

    alpha_t[b, u] = em[b, t, u]
                  + lse_s( log K[b, u, s] + alpha_{t-1}[b, s] )

with ``K`` a *frame-invariant* exp-domain transition matrix.  The
full-ngram scorer reaches this shape by folding its bigram factor into
K once (K[u, s] = adj[u, s] * e^{W[l_s, l_u] - shift}; the old per-frame
[B, S, N] einsum collapses to a one-time [B, S, S] build), the
dense-adjacency scorer has K = adj_exp already, and the dense n-gram
normalizer has K = e^{W^T - shift} shared across the batch.

Backward math (custom_vjp ``bwd``), cotangent lam_t := dL/d alpha_t:

    r_t[u]       = lam_t[u] / z_t[u]          (z_t recomputed from the
                                               stored alpha: exp(alpha_t
                                               - em_t - sh_t - k_shift))
    lam_{t-1}[s] = e^{alpha_{t-1}[s] - sh_t} * sum_u r_t[u] K[u, s]
    d em_t[u]    = lam_t[u]
    d K[u, s]    = sum_t r_t[u] * e^{alpha_{t-1}[s] - sh_t}

The lam recursion is one matvec per frame — the same cost as a forward
frame — and the d K sum is hoisted out of the scan entirely: the scan
stashes (r_t, e^{alpha_{t-1} - sh_t}) rows and one [S, T] @ [T, S]
batched MXU matmul finishes the job.  Total backward ~= 1 forward scan
plus O(T * S^2) matmul work, vs the transpose's ~2.4 forward scans.

Overflow discipline: ``r = lam / z`` can reach ~lam * 1e37 when z rides
the floor, and a raw ``K^T r`` intermediate would overflow f32 even
though the true pairing lam * p (p the predecessor softmax, <= 1) is
tame.  The matvec therefore runs on per-row *normalized* r (r / max|r|)
with the scale folded into the e^{alpha - sh} factor — every
intermediate is then bounded by the true value times S.  States with
underflowed e^{alpha_{t-1} - sh} are hard-zeroed so a saturated matvec
can never produce inf * 0 = NaN.

Dispatch: ``GTN_FACTORED_VJP`` = auto (default, custom path) | off
(XLA scan transpose — the differential oracle; see
tests/test_factored_vjp.py).  Behavioral spec unchanged from
ops/factored.py (reference transducer.py:239-309).
"""

import jax
import jax.numpy as jnp

from .semiring import NEG, DEAD

_FLOOR = 1e-37  # matches ops/factored.py


def _matmul(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@jax.custom_vjp
def lattice_scan(em_tail, K_exp, alpha0, live, valid, k_shift):
    """Run the dense lattice recursion over the trailing T-1 frames.

    Args:
      em_tail: [B, Ts, S] per-state emission rows for frames 1..T-1 (the
        caller computes the frame-0 entry into ``alpha0`` itself).
      K_exp: [B, S, S] or [1, S, S] exp-domain transition matrix,
        K_exp[b, u, s] = sum over arcs s->u of e^{w - k_shift}.
      alpha0: [B, S] frame-0 scores (NEG for dead states).
      live: [Ts, B] f32 0/1 — frame t updates sample b iff live[t, b]
        (ragged input_lengths; frozen frames pass the carry through).
      valid: [B, S] or [1, S] f32 0/1 — states that may ever hold mass
        (has_lab); invalid states stay NEG.
      k_shift: f32 scalar, added back each frame (callers pass it
        stop-gradiented, like every shift in this package).
    Returns alpha_final [B, S].
    """
    alpha, _ = _forward(em_tail, K_exp, alpha0, live, valid, k_shift)
    return alpha


def _forward(em_tail, K_exp, alpha0, live, valid, k_shift):
    valid_b = valid > 0.0
    # shared K (norm/fcc shapes): contract as a REAL [B, S] @ [S, S]
    # matmul — the [1, S, S] @ [B, S, 1] batched-matvec form lowers to a
    # loop of tiny per-sample MXU passes (chip-measured ~2x slower on
    # the ASG free-energy scan)
    shared = K_exp.shape[0] == 1
    KT = K_exp[0].T if shared else None

    def step(alpha, xs):
        em_t, live_t = xs
        sh = jnp.maximum(jnp.max(alpha, axis=1, keepdims=True), NEG)
        ea = jnp.exp(alpha - sh)
        if shared:
            z = _matmul(ea, KT)
        else:
            z = _matmul(K_exp, ea[..., None])[..., 0]
        new = jnp.where(
            (z > 0.0) & valid_b,
            em_t + sh + k_shift + jnp.log(jnp.maximum(z, _FLOOR)),
            NEG,
        )
        alpha = jnp.where(live_t[:, None] > 0.0, new, alpha)
        return alpha, alpha

    return jax.lax.scan(
        step, alpha0, (em_tail.transpose(1, 0, 2), live)
    )


def _fwd(em_tail, K_exp, alpha0, live, valid, k_shift):
    with jax.default_matmul_precision("float32"):
        alpha, alphas = _forward(
            em_tail, K_exp, alpha0, live, valid, k_shift
        )
    return alpha, (em_tail, K_exp, alpha0, live, valid, alphas, k_shift)


def _bwd(res, g):
    em_tail, K_exp, alpha0, live, valid, alphas, k_shift = res
    B, S = alpha0.shape
    shared_k = K_exp.shape[0] == 1
    # previous-frame carries, aligned with alphas: prevs[t] = alpha_{t-1}
    prevs = jnp.concatenate([alpha0[None], alphas], axis=0)[:-1]

    shared = K_exp.shape[0] == 1
    K0 = K_exp[0] if shared else None

    def bstep(lam, xs):
        alpha_t, prev, em_t, live_t = xs
        sh = jnp.maximum(jnp.max(prev, axis=1, keepdims=True), NEG)
        alive = (alpha_t > DEAD) & (live_t[:, None] > 0.0)
        lam_a = jnp.where(alive, lam, 0.0)
        # z as the forward saw it (max(z, floor), exactly recoverable
        # from the stored carry); floor-riding states get autodiff's
        # zero gradient through log(max(z, floor))
        zhat = jnp.exp(alpha_t - em_t - sh - k_shift)
        r = jnp.where(
            alive & (zhat > _FLOOR), lam_a / jnp.maximum(zhat, _FLOOR), 0.0
        )
        # normalized matvec: intermediates bounded by S * true value
        c = jnp.maximum(
            jnp.max(jnp.abs(r), axis=1, keepdims=True), _FLOOR
        )
        rn = r / c
        if shared:
            ktr = _matmul(rn, K0)  # [B, S] @ [S, S]: sum_u rn[u] K[u, s]
        else:
            ktr = _matmul(rn[:, None, :], K_exp)[:, 0, :]
        eprev = jnp.where(
            prev > DEAD, jnp.exp(prev - sh) * c, 0.0
        )
        lam_prev = eprev * ktr + jnp.where(
            live_t[:, None] > 0.0, 0.0, lam
        )
        return lam_prev, (lam_a, rn, eprev)

    with jax.default_matmul_precision("float32"):
        lam0, (d_em, rn_stk, eprev_stk) = jax.lax.scan(
            bstep, g, (alphas, prevs, em_tail.transpose(1, 0, 2), live),
            reverse=True,
        )
        # d K[b, u, s] = sum_t rn[t, b, u] * eprev[t, b, s] — one batched
        # [S, T] @ [T, S] MXU matmul instead of a per-frame accumulation
        if shared_k:
            dK = jnp.einsum(
                "tbu,tbs->us", rn_stk, eprev_stk,
                precision=jax.lax.Precision.HIGHEST,
            )[None]
        else:
            dK = jnp.einsum(
                "tbu,tbs->bus", rn_stk, eprev_stk,
                precision=jax.lax.Precision.HIGHEST,
            )
    d_em_tail = d_em.transpose(1, 0, 2)
    d_k_shift = jnp.sum(d_em)
    return (d_em_tail, dK, lam0, jnp.zeros_like(live),
            jnp.zeros_like(valid), d_k_shift)


lattice_scan.defvjp(_fwd, _bwd)


def live_mask(T, input_lengths, t0=1):
    """[T - t0, B] f32 live mask for frames t0..T-1 (t < input_length)."""
    return (
        jnp.arange(t0, T)[:, None] < input_lengths[None, :]
    ).astype(jnp.float32)
