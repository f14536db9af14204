"""Batched lattice dynamic programs for chain-structured criteria (CTC / ASG).

This module replaces the per-sample GTN pipeline
``gtn.forward_score(gtn.intersect(emissions, criterion_graph))`` (reference:
/root/reference/criterions/ctc.py:49-51, asg.py:111-115) with batched,
fixed-shape recursions over ``[B, S]`` state tensors driven by
``jax.lax.scan`` over time.  The criterion graphs here are chains with
self-loops and bounded skips, so the "composition" collapses to gathering
emission channels into lattice states; no runtime graph construction is
needed.  Gradients come from JAX AD through the scan, which produces exactly
the beta recursion / posterior arc marginals that ``gtn.backward`` computes.

Shapes use padded targets ``[B, L]`` with explicit ``target_lengths`` —
ragged Python lists die at this boundary.
"""

import jax
import jax.numpy as jnp

from .semiring import NEG, gather_channels, logaddexp, logsumexp, logsumexp_stack


# ---------------------------------------------------------------------------
# CTC
# ---------------------------------------------------------------------------


def ctc_state_tables(targets, blank):
    """Per-state label / skip tables for the 2L+1-state CTC lattice.

    The lattice is the intersection of the standard CTC criterion graph
    (reference builds it per sample at criterions/ctc.py:14-29) with a length
    T linear emission graph: state s has label blank for even s and
    ``targets[(s-1)//2]`` for odd s; a skip s-2 -> s is allowed for odd s >= 3
    when the two neighbouring labels differ.
    """
    B, L = targets.shape
    S = 2 * L + 1
    s = jnp.arange(S)
    tgt_idx = jnp.maximum((s - 1) // 2, 0)
    is_label = (s % 2) == 1
    labels = jnp.where(
        is_label[None, :], targets[:, tgt_idx], jnp.full((S,), blank)[None, :]
    )
    prev_tgt = jnp.take_along_axis(
        targets, jnp.maximum(tgt_idx - 1, 0)[None, :].repeat(B, 0), axis=1
    )
    skip_ok = (
        is_label[None, :]
        & (s >= 3)[None, :]
        & (targets[:, tgt_idx] != prev_tgt)
    )
    return labels, skip_ok


def ctc_forward_score(
    log_probs, targets, target_lengths, blank, input_lengths=None, impl="auto",
    chunk=None,
):
    """Log-semiring forward score of the CTC lattice.

    Args:
      log_probs: ``[B, T, C]`` log probabilities.
      targets: ``[B, L]`` padded target indices.
      target_lengths: ``[B]`` true target lengths.
      blank: blank index.
      input_lengths: optional ``[B]`` true input lengths (default: T).
      impl: 'auto' (Pallas kernel on TPU, scan elsewhere), 'pallas', 'scan',
        'assoc' (associative_scan over band operators — the
        sequence-sharding form; see ctc_forward_score_assoc), or 'chunked'
        (checkpointed sequential chunks, sqrt-memory).
      chunk: chunk size for impl='assoc' (per-chunk transfer operators,
        O(T/chunk·S²) memory — the memory-bounded long-context form) and
        impl='chunked'; None keeps each impl's default.

    Returns:
      ``[B]`` forward scores (log total path probability).
    """
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    labels, skip_ok = ctc_state_tables(targets, blank)

    if impl == "auto":
        # The one-level kernels keep the full [T, B, S] alpha trajectory as
        # backward residuals; past a few thousand frames route to the
        # checkpointed chunked scan (sqrt(T)-ish memory, same numerics).
        if T > 4096:
            impl = "chunked"
        else:
            impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl not in ("scan", "pallas", "assoc", "chunked"):
        raise ValueError(f"unknown CTC impl {impl!r}")
    if impl == "assoc":
        return ctc_forward_score_assoc(
            log_probs, targets, target_lengths, blank, input_lengths, chunk
        )
    if impl == "chunked":
        kw = {} if chunk is None else {"chunk": chunk}
        return ctc_forward_score_chunked(
            log_probs, targets, target_lengths, blank, input_lengths, **kw
        )
    if impl == "pallas":
        from . import lattice_pallas

        em_bts = gather_channels(log_probs, labels)  # [B, T, S]
        s_idx = jnp.arange(S)[None, :]
        start = jnp.where(
            (s_idx == 0)
            | ((s_idx == 1) & (target_lengths[:, None] > 0)),
            0.0,
            NEG,
        )
        accept = jnp.where(
            (s_idx == 2 * target_lengths[:, None])
            | (
                (s_idx == 2 * target_lengths[:, None] - 1)
                & (target_lengths[:, None] > 0)
            ),
            0.0,
            NEG,
        )
        return lattice_pallas.ctc_score_pallas(
            em_bts, start, accept, skip_ok, input_lengths
        )

    # Emissions gathered into lattice states: [T, B, S]
    em = gather_channels(log_probs, labels).transpose(1, 0, 2)

    alpha0 = jnp.full((B, S), NEG)
    alpha0 = alpha0.at[:, 0].set(em[0, :, 0])
    if L > 0:
        # state 1 only exists when the target is non-empty
        first = jnp.where(target_lengths > 0, em[0, :, 1], NEG)
        alpha0 = alpha0.at[:, 1].set(first)

    def shift(x, k):
        return jnp.concatenate([jnp.full((B, k), NEG), x[:, :-k]], axis=1)

    def step(alpha, inputs):
        em_t, t = inputs
        stay = alpha
        prev = shift(alpha, 1)
        skip = jnp.where(skip_ok, shift(alpha, 2), NEG)
        new = em_t + logsumexp_stack([stay, prev, skip])
        live = (t < input_lengths)[:, None]
        new = jnp.where(live, new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    alpha, _ = jax.lax.scan(step, alpha0, (em[1:], ts))

    # Accepting states are 2*len and 2*len - 1 (only 2*len == 0 when len == 0).
    last = jnp.take_along_axis(alpha, (2 * target_lengths)[:, None], axis=1)[:, 0]
    prev_idx = jnp.maximum(2 * target_lengths - 1, 0)
    prev = jnp.take_along_axis(alpha, prev_idx[:, None], axis=1)[:, 0]
    prev = jnp.where(target_lengths > 0, prev, NEG)
    return logaddexp(last, prev)


def ctc_loss(
    log_probs,
    targets,
    target_lengths,
    blank,
    reduction="mean",
    input_lengths=None,
    impl="auto",
    chunk=None,
):
    """Mean-over-batch negative CTC forward score.

    Matches the reference semantics (criterions/ctc.py:31-69): per-sample
    loss is scaled by 1/len(target) when reduction == 'mean', then the batch
    mean is taken.
    """
    scores = ctc_forward_score(
        log_probs, targets, target_lengths, blank, input_lengths, impl, chunk
    )
    losses = -scores
    if reduction == "mean":
        scale = jnp.where(target_lengths > 0, 1.0 / jnp.maximum(target_lengths, 1), 1.0)
        losses = losses * scale
    elif reduction != "none":
        raise ValueError(f"invalid value for reduction '{reduction}'")
    return jnp.mean(losses)


def ctc_greedy_decode(outputs):
    """Framewise argmax [B, T, C] -> per-frame predictions [B, T].

    Repeat/blank collapse (reference criterions/ctc.py:126-135) is ragged and
    happens host-side in the criterion wrapper.
    """
    return jnp.argmax(outputs, axis=2)


def ctc_forward_score_chunked(
    log_probs, targets, target_lengths, blank, input_lengths=None, chunk=128
):
    """Memory-bounded CTC forward: two-level scan with checkpointed chunks.

    The plain scan (and the Pallas kernel) saves the full alpha trajectory
    ``[T, B, S]`` as backward residuals; at long T that dominates memory.
    Here the time axis splits into T/chunk blocks: the outer scan carries
    only chunk-boundary alphas and each block is wrapped in
    ``jax.checkpoint``, so the backward pass keeps O(T/chunk · B · S)
    boundary slabs and recomputes the in-chunk alphas on the fly — the
    classic sqrt-memory tradeoff (chunk ≈ sqrt(T) minimizes the sum).
    Numerically identical to impl='scan'.
    """
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    labels, skip_ok = ctc_state_tables(targets, blank)
    em = gather_channels(log_probs, labels).transpose(1, 0, 2)  # [T, B, S]

    alpha0 = jnp.full((B, S), NEG)
    alpha0 = alpha0.at[:, 0].set(em[0, :, 0])
    if L > 0:
        first = jnp.where(target_lengths > 0, em[0, :, 1], NEG)
        alpha0 = alpha0.at[:, 1].set(first)

    def shift(x, k):
        return jnp.concatenate([jnp.full((B, k), NEG), x[:, :-k]], axis=1)

    def step(alpha, inputs):
        em_t, t = inputs
        stay = alpha
        prev = shift(alpha, 1)
        skip = jnp.where(skip_ok, shift(alpha, 2), NEG)
        new = em_t + logsumexp_stack([stay, prev, skip])
        live = (t < input_lengths)[:, None]
        return jnp.where(live, new, alpha), None

    n_steps = T - 1
    nc = max(-(-n_steps // chunk), 1)
    pad = nc * chunk - n_steps
    em_rest = jnp.concatenate(
        [em[1:], jnp.zeros((pad, B, S), em.dtype)], axis=0
    ).reshape(nc, chunk, B, S)
    # padded steps use t >= T so the live mask makes them identity
    ts = jnp.concatenate(
        [jnp.arange(1, T), jnp.full((pad,), T, jnp.int32)]
    ).reshape(nc, chunk)

    @jax.checkpoint
    def chunk_body(alpha, xs):
        em_c, ts_c = xs
        alpha, _ = jax.lax.scan(step, alpha, (em_c, ts_c))
        return alpha, None

    alpha, _ = jax.lax.scan(chunk_body, alpha0, (em_rest, ts))

    last = jnp.take_along_axis(alpha, (2 * target_lengths)[:, None], axis=1)[:, 0]
    prev_idx = jnp.maximum(2 * target_lengths - 1, 0)
    prev = jnp.take_along_axis(alpha, prev_idx[:, None], axis=1)[:, 0]
    prev = jnp.where(target_lengths > 0, prev, NEG)
    return logaddexp(last, prev)


def ctc_forward_score_assoc(
    log_probs, targets, target_lengths, blank, input_lengths=None, chunk=None
):
    """CTC forward score as a parallel prefix over band transition operators.

    The log-semiring scan is associative, so the time recursion can be
    computed as an ``associative_scan`` over per-step [S, S] operators
    ``M_t[s', s] = em[t, s'] + log(allowed(s -> s'))`` — O(T·S³) work and
    O(T·S²) memory versus the sequential scan's O(T·S), but with O(log T)
    depth.  This is the *sequence-sharding* form (SURVEY §5 long-context
    axis): sharding the leading T axis of the operator tensor across a mesh
    lets XLA parallelize the prefix combine across chips with boundary
    exchanges — profitable when chips x sequence length outweigh the S²
    overhead (small lattices / very long inputs).  Numerically identical to
    impl='scan' (tested); not the default on a single chip.

    ``chunk``: with a chunk size c, dense [S, S] operators materialize per
    *chunk* instead of per *frame* — each chunk's transfer matrix is built
    by a cheap banded in-chunk recursion (CTC transitions only reach 2
    states back, so the per-frame update is 3 shifted adds, not a matmul),
    then T/c dense operators combine by associative_scan.  Memory drops
    from O(T·S²) to O(T/c·S² + T·S), which is what makes the T-sharded
    long-context regime (T >= 4k) actually fit; the in-chunk recursion is
    checkpointed so backward recomputes it instead of saving [c, B, S, S].
    """
    if chunk is not None:
        return _ctc_assoc_chunked(
            log_probs, targets, target_lengths, blank, input_lengths, chunk
        )
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    labels, skip_ok = ctc_state_tables(targets, blank)
    em = gather_channels(log_probs, labels)  # [B, T, S]

    # allowed-transition mask [B, S, S]: stay, advance, skip
    eye = jnp.eye(S, dtype=bool)
    adv = jnp.eye(S, k=-1, dtype=bool)
    skp = jnp.eye(S, k=-2, dtype=bool) & skip_ok[:, :, None]
    allowed = jnp.where(eye[None] | adv[None] | skp, 0.0, NEG)

    # per-step operators, masked to identity for t >= input_length
    ident = jnp.where(eye, 0.0, NEG)[None, None]
    ops_t = em.transpose(1, 0, 2)[:, :, :, None] + allowed[None]  # [T,B,S,S]
    live = (jnp.arange(T)[:, None] < input_lengths[None, :])[..., None, None]
    ops_t = jnp.where(live, ops_t, ident)
    # frame 0 consumes its emission without a transition (the sequential
    # init alpha_0 = start + em[0]): a diagonal operator
    ops0 = jnp.where(eye[None], em[:, 0, :, None], NEG)
    ops_t = ops_t.at[0].set(ops0)

    def combine(a, b):
        # (b ∘ a)[i, j] = lse_k b[i, k] + a[k, j]  (a applied first)
        x = b[..., :, :, None] + a[..., None, :, :]
        m = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(x, axis=-2, keepdims=True), NEG)
        )
        return (
            m + jnp.log(jnp.maximum(jnp.sum(jnp.exp(x - m), axis=-2,
                                            keepdims=True), 1e-30))
        )[..., 0, :]

    prefix = jax.lax.associative_scan(combine, ops_t, axis=0)
    total = prefix[-1]  # [B, S, S]

    # alpha0 before the first step is the start potential; the t=0 operator
    # already consumes frame 0's emission, so fold start into the apply.
    start = jnp.where(
        (jnp.arange(S)[None, :] == 0)
        | ((jnp.arange(S)[None, :] == 1) & (target_lengths[:, None] > 0)),
        0.0,
        NEG,
    )
    alpha_final = logsumexp(total + start[:, None, :], axis=-1)  # [B, S]

    last = jnp.take_along_axis(alpha_final, (2 * target_lengths)[:, None], 1)[:, 0]
    prev_idx = jnp.maximum(2 * target_lengths - 1, 0)
    prev = jnp.take_along_axis(alpha_final, prev_idx[:, None], 1)[:, 0]
    prev = jnp.where(target_lengths > 0, prev, NEG)
    return logaddexp(last, prev)


def _ctc_assoc_chunked(
    log_probs, targets, target_lengths, blank, input_lengths, chunk
):
    """Chunk-transfer form of the associative CTC scan (see
    ctc_forward_score_assoc): banded in-chunk recursion builds one dense
    [S, S] transfer per chunk, associative_scan combines the T/chunk
    transfers.  Each chunk depends only on its own frames, so a T-sharded
    emissions array keeps the transfer construction local to its shard."""
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    labels, skip_ok = ctc_state_tables(targets, blank)
    em = gather_channels(log_probs, labels).transpose(1, 0, 2)  # [T, B, S]

    alpha0 = jnp.full((B, S), NEG)
    alpha0 = alpha0.at[:, 0].set(em[0, :, 0])
    if L > 0:
        first = jnp.where(target_lengths > 0, em[0, :, 1], NEG)
        alpha0 = alpha0.at[:, 1].set(first)

    n_steps = T - 1
    nc = max(-(-n_steps // chunk), 1)
    pad = nc * chunk - n_steps
    em_rest = jnp.concatenate(
        [em[1:], jnp.zeros((pad, B, S), em.dtype)], axis=0
    ).reshape(nc, chunk, B, S)
    ts = jnp.concatenate(
        [jnp.arange(1, T), jnp.full((pad,), T, jnp.int32)]
    ).reshape(nc, chunk)

    def shift_rows(M, k):
        # shift the s_out axis (-2) down by k, filling with NEG
        return jnp.concatenate(
            [jnp.full(M.shape[:-2] + (k, S), NEG), M[..., :-k, :]], axis=-2
        )

    @jax.checkpoint
    def chunk_transfer(em_c, ts_c):
        # M[b, i, j] = score of reaching state i from state j across the
        # frames seen so far in this chunk; identity to start
        eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, NEG)
        M0 = jnp.broadcast_to(eye, (B, S, S))

        def tstep(M, xs):
            em_t, t = xs
            stay = M
            prev = shift_rows(M, 1)
            skip = jnp.where(skip_ok[:, :, None], shift_rows(M, 2), NEG)
            new = em_t[:, :, None] + logsumexp_stack([stay, prev, skip])
            live = (t < input_lengths)[:, None, None]
            return jnp.where(live, new, M), None

        M, _ = jax.lax.scan(tstep, M0, (em_c, ts_c))
        return M

    transfers = jax.vmap(chunk_transfer)(em_rest, ts)  # [nc, B, S, S]

    def combine(a, b):
        # (b ∘ a)[i, j] = lse_k b[i, k] + a[k, j]  (a applied first)
        x = b[..., :, :, None] + a[..., None, :, :]
        m = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(x, axis=-2, keepdims=True), NEG)
        )
        return (
            m + jnp.log(jnp.maximum(jnp.sum(jnp.exp(x - m), axis=-2,
                                            keepdims=True), 1e-30))
        )[..., 0, :]

    prefix = jax.lax.associative_scan(combine, transfers, axis=0)
    total = prefix[-1]  # [B, S, S]
    alpha_final = logsumexp(total + alpha0[:, None, :], axis=-1)

    last = jnp.take_along_axis(alpha_final, (2 * target_lengths)[:, None], 1)[:, 0]
    prev_idx = jnp.maximum(2 * target_lengths - 1, 0)
    prev = jnp.take_along_axis(alpha_final, prev_idx[:, None], 1)[:, 0]
    prev = jnp.where(target_lengths > 0, prev, NEG)
    return logaddexp(last, prev)


# ---------------------------------------------------------------------------
# ASG
# ---------------------------------------------------------------------------


def asg_fcc_score(inputs, transitions, input_lengths=None):
    """Unconstrained ("fully connected") ASG forward score.

    ``gtn.forward_score(gtn.intersect(emissions, transitions))`` with the
    dense (N+1) x N transition graph of asg.py:54-69: entry [0, j] holds the
    start score of label j and entry [i+1, j] holds p(i | j) — the score of
    moving from label j to label i (destination-major, matching the arc
    creation order at asg.py:62-64); every state accepts.  Returns [B].
    """
    B, T, C = inputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)
    alpha0 = transitions[0][None, :] + inputs[:, 0]

    trans = transitions[1:].T  # [C, C], trans[i, j] = score of j after i

    # Log-semiring "matvec" as a real MXU matmul: with row shift ma and
    # column shift mt, lse_i(alpha_i + trans_ij) = ma + mt_j +
    # log(sum_i exp(alpha_i - ma) exp(trans_ij - mt_j)).  The shifted
    # factors are in (0, 1], the sum is exact up to fp32 accumulation,
    # and exp(trans - mt) is constant across the scan so it hoists out.
    # This turns the hot per-step op from a [B, C, C] broadcast
    # reduction (VPU) into a [B, C] @ [C, C] matmul (MXU).
    # NOTE (round 5): the analytic custom VJP (ops/factored_vjp.py) was
    # tried here and REVERTED after a chip A/B: this scan's step is one
    # small shared [B, C] @ [C, C] matmul whose transpose is the same
    # matmul, so XLA's backward is already near-optimal and the custom
    # path's recompute bookkeeping measured ~8% SLOWER (1.25 vs 1.16 ms
    # fwd+bwd at the bench protocol; tools/chip/drives/drive_asg.py).
    # The VJP wins where it removes per-frame [B, S, N] einsums or
    # per-sample batched matvec transposes (factored transducer, STC
    # dense) — not here.
    mt = jax.lax.stop_gradient(jnp.max(trans, axis=0))  # [C]
    exp_trans = jnp.exp(trans - mt[None, :])  # [C, C]

    def step(alpha, xs):
        em_t, t = xs
        ma = jax.lax.stop_gradient(jnp.max(alpha, axis=1, keepdims=True))
        z = jnp.exp(alpha - ma) @ exp_trans  # [B, C] on the MXU
        new = em_t + ma + mt[None, :] + jnp.log(jnp.maximum(z, 1e-37))
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(
        step, alpha0, (inputs.transpose(1, 0, 2)[1:], jnp.arange(1, T))
    )
    return logsumexp(alpha, axis=1)


def asg_fal_score(inputs, transitions, targets, target_lengths, input_lengths=None):
    """Force-aligned ASG score through the target chain.

    ``forward_score(intersect(intersect(fal, transitions), emissions))``
    (asg.py:108-113): position l emits targets[l-1]; staying pays the
    self transition p(tgt | tgt), advancing pays p(tgt_l | tgt_{l-1}),
    and the first emission pays the start score from row 0.  Returns [B].
    """
    B, T, C = inputs.shape
    L = targets.shape[1]
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)

    # Per-position emission streams: em_tgt[b, t, l] = inputs[b, t, targets[l]]
    em_tgt = gather_channels(inputs, targets).transpose(1, 0, 2)  # [T, B, L]

    # Transition costs per position (positions l = 1..L map to index l-1
    # here).  transitions[i+1, j] = score of label i following label j.
    self_cost = transitions[targets + 1, targets]  # [B, L]
    prev_targets = jnp.concatenate([jnp.zeros((B, 1), targets.dtype), targets[:, :-1]], 1)
    adv_cost = transitions[targets + 1, prev_targets]  # [B, L], l >= 2 entries
    start_cost = transitions[0, targets[:, 0]]  # [B]
    adv_cost = adv_cost.at[:, 0].set(start_cost)

    # alpha over positions 1..L (index l-1), after consuming t+1 frames
    alpha0 = jnp.full((B, L), NEG)
    alpha0 = alpha0.at[:, 0].set(adv_cost[:, 0] + em_tgt[0, :, 0])

    # NOTE (round 5): a custom-VJP form with a bidiagonal per-sample
    # [B, L, L] K was tried and REVERTED — the [B, 1, L] @ [B, L, L]
    # batched matvec lowers to a loop of tiny per-sample MXU passes and
    # loses to this banded VPU recursion (part of the chip-measured ASG
    # 1.03 -> 1.89 ms regression, with the shared-K orientation bug in
    # the fcc scan).  The scan transpose is cheap here: two shifted adds
    # and a logaddexp per frame.
    def step(alpha, xs):
        em_t, t = xs
        stay = alpha + self_cost
        prev = jnp.concatenate(
            [jnp.full((B, 1), NEG), alpha[:, :-1]], 1) + adv_cost
        new = em_t + logaddexp(stay, prev)
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, alpha0, (em_tgt[1:], jnp.arange(1, T)))
    idx = jnp.maximum(target_lengths - 1, 0)[:, None]
    score = jnp.take_along_axis(alpha, idx, axis=1)[:, 0]
    return jnp.where(target_lengths > 0, score, 0.0)


def asg_loss(
    inputs,
    transitions,
    targets,
    target_lengths,
    reduction="mean",
    input_lengths=None,
):
    """ASG criterion: free energy minus clamped (force-aligned) energy.

    Matches asg.py:84-139: loss_b = fcc_b - fal_b, optional 1/len scale,
    batch mean.
    """
    fcc = asg_fcc_score(inputs, transitions, input_lengths)
    fal = asg_fal_score(inputs, transitions, targets, target_lengths, input_lengths)
    losses = fcc - fal
    if reduction == "mean":
        scale = jnp.where(target_lengths > 0, 1.0 / jnp.maximum(target_lengths, 1), 1.0)
        losses = losses * scale
    elif reduction != "none":
        raise ValueError(f"invalid value for reduction '{reduction}'")
    return jnp.mean(losses)


def asg_viterbi(outputs, transitions, input_lengths=None,
                backtrace="kernel"):
    """Tropical (Viterbi) decode through the dense ASG transition graph.

    Returns (paths [B, T] int32, scores [B]).  Frames at t >= input_length
    repeat the previous state.  Host code collapses repeats / garbage /
    replabels (asg.py:211-237).  ``backtrace`` selects the Pallas one-hot
    walk ("kernel") or the plain take_along_axis scan ("xla", a fallback
    dispatchers can retry with if the kernel fails to compile).
    """
    B, T, C = outputs.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)
    alpha0 = transitions[0][None, :] + outputs[:, 0]
    trans = transitions[1:].T  # trans[i, j] = score of j after i

    def step(alpha, xs):
        em_t, t = xs
        scores = alpha[:, :, None] + trans[None, :, :]  # [B, C_from, C_to]
        best_prev = jnp.argmax(scores, axis=1)
        new = em_t + jnp.max(scores, axis=1)
        live = (t < input_lengths)[:, None]
        new = jnp.where(live, new, alpha)
        best_prev = jnp.where(
            live, best_prev, jnp.arange(C)[None, :].repeat(B, 0)
        )
        return new, best_prev

    alpha, backptrs = jax.lax.scan(
        step, alpha0, (outputs.transpose(1, 0, 2)[1:], jnp.arange(1, T))
    )
    last = jnp.argmax(alpha, axis=1)
    score = jnp.max(alpha, axis=1)

    if backtrace == "kernel":
        # the per-frame take_along_axis walk lowers to serial scalar
        # gathers on TPU; the Pallas kernel carries a one-hot row instead
        from .viterbi_scan_pallas import dense_backtrace

        path = dense_backtrace(
            backptrs.astype(jnp.int32), last.astype(jnp.int32), C
        )
        return path, score

    def backstep(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        return prev, state

    first, path_rev = jax.lax.scan(backstep, last, backptrs, reverse=True)
    path = jnp.concatenate([first[None, :], path_rev], axis=0).transpose(1, 0)
    return path, score
