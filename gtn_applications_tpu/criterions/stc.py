"""Star Temporal Classification criterion (TPU-native).

Capability parity with /root/reference/criterions/stc.py: training from
partially labeled sequences by appending a ``<star>`` channel (logsumexp of
all non-blank channels) and per-token ``<star>\\token`` channels
(log(exp(star) - exp(token))), then scoring a self-less-CTC-plus-star label
WFST with an annealed token insertion penalty
``p = plast + (p0 - plast) * 2^(-nstep / thalf)`` (stc.py:190-195).

The star channels are pure tensor code (stc.py:200-221) and run on device;
the per-sample label graph (stc.py:22-64) is built once per distinct target
on the host, compiled to arc tables, and scored with the batched sparse
lattice scan.  The insertion penalty enters as a traced scalar added to the
star arcs, so the annealing schedule never triggers recompilation.

Blank index is REQUIRED to be 0 (stc.py:13).
"""

import math
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from ..wfst import compile as wcompile
from ..wfst.graph import Graph
from .base import Criterion

# Dense-adjacency scoring tier (round 5): every STC graph state has a
# unique in-label (blank states take blank, token states their token,
# star states their gap's star channel), so the lattice qualifies for
# the transducer's dense scorer (ops/factored.alignment_lattice_score)
# with its analytic custom VJP.  The traced insertion penalty enters as
# adj = adj_base + e^penalty * adj_star — two host-built matrices, no
# recompilation across the annealing schedule.  "off" keeps the sparse
# arc-table path (the differential oracle, tests/test_stc_dense.py).
_DENSE_IMPL = os.environ.get("GTN_STC_DENSE", "auto")
# [B, S, S] adjacency + [B, S, C] label working-set gate (floats)
_DENSE_MAX_WORKSET = 48_000_000

STC_BLANK_IDX = 0

# Sentinel weight marking star arcs during host graph construction; replaced
# by the traced log-penalty on device.
_STAR_SENTINEL = 1.0


def logsubexp(a, b):
    """log(exp(a) - exp(b)) with the reference's 1e-7 guard (stc.py:157-172).

    a: [B, T, 1], b: [B, T, K] -> [B, T, K].  The difference is clamped at
    zero: semantically b <= a always (a token's mass is part of the star
    sum); the clamp only guards padded channels, where an unclamped exp
    overflows to inf and the NaN would poison the one-hot emission matmul
    (0 * NaN = NaN) even for unused channels.
    """
    return a + jnp.log1p(1e-7 - jnp.exp(jnp.minimum(b - a, 0.0)))


def make_stc_graph(target, star_idx):
    """STC label graph — behavioral spec: reference stc.py:22-64.

    Topology (pinned by the closed-form goldens in tests/test_stc.py and
    the NFA-spec oracle in tests/test_bruteforce.py): a *self-less* CTC
    chain over the target — blank states ``bk[0..L]`` interleaved with
    token states ``tk[0..L-1]``, only blanks self-loop, tokens may skip
    the intervening blank — plus one star state per inter-token gap.
    Gap ``i`` (before token i; gap L is the tail) accepts the channel
    ``<star>\\target[i]`` (star minus that token; plain ``<star>`` at the
    tail), reachable from the gap's chain neighbors, self-looping, and
    exiting either forward into token i or back to blank i.  Star arcs
    carry the sentinel weight that ``loss`` later swaps for the annealed
    log insertion penalty."""
    g = Graph()
    L = len(target)
    # chain states, interleaved so ids match the reference layout
    # (b0 t0 b1 t1 ... t_{L-1} bL, then the star states)
    bk, tk = [], []
    for i in range(L + 1):
        bk.append(g.add_node(i == 0, i == L))
        if i < L:
            tk.append(g.add_node(False, i == L - 1))
    for i, b in enumerate(bk):
        g.add_arc(b, b, STC_BLANK_IDX)
        if i > 0:
            g.add_arc(tk[i - 1], b, STC_BLANK_IDX)
    for i, t in enumerate(tk):
        g.add_arc(bk[i], t, target[i])
        if i > 0:
            g.add_arc(tk[i - 1], t, target[i])
    for i in range(L + 1):
        star = g.add_node(False, i == L)
        chan = star_idx if i == L else star_idx + target[i]
        into = ([] if i == 0 else [tk[i - 1]]) + [bk[i]]
        for src in into + [star]:
            g.add_arc(src, star, chan, chan, _STAR_SENTINEL)
        if i < L:
            g.add_arc(star, tk[i], target[i])
        g.add_arc(star, bk[i], STC_BLANK_IDX)
    return g


class STC(Criterion):
    """STC loss (stc.py:135-221).

    Args:
      blank_idx: must be 0.
      p0 / plast / thalf: insertion penalty annealing schedule.
      reduction: 'none' or 'mean' (divide per-sample loss by T).
    """

    def __init__(
        self,
        blank_idx=0,
        p0=1.0,
        plast=1.0,
        thalf=1.0,
        reduction="none",
        shift_targets=0,
    ):
        assert blank_idx == STC_BLANK_IDX
        self.p0 = p0
        self.plast = plast
        self.thalf = thalf
        self.nstep = 0
        self.reduction = reduction
        self.training = True
        # STC reserves channel 0 for blank, so token ids must be >= 1.
        # Dataset preprocessors emit 0-based ids; the factory sets
        # shift_targets=1 so targets move into the 1-based channel space.
        self.shift_targets = shift_targets
        self._graph_cache: Dict[tuple, tuple] = {}

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def _compiled(self, target, star_idx):
        key = (target, star_idx)
        hit = self._graph_cache.get(key)
        if hit is None:
            g = make_stc_graph(list(target), star_idx)
            cg = wcompile.compile_acceptor(g)
            star_mask = (cg.weight == _STAR_SENTINEL).astype(np.float32)
            hit = (cg._replace(weight=cg.weight * (1.0 - star_mask)), star_mask)
            if len(self._graph_cache) > 100000:
                self._graph_cache.clear()
            self._graph_cache[key] = hit
        return hit

    def prepare(self, targets, select_multiple=8):
        """Host: per-batch token subsetting (stc.py:204-214), target
        remapping, STC graph compilation, and the annealed penalty."""
        if self.training:
            self.nstep += 1
        prob = self.plast + (self.p0 - self.plast) * math.exp(
            -self.nstep * math.log(2) / self.thalf
        )

        targets = [
            [int(t) + self.shift_targets for t in np.asarray(tgt).reshape(-1)]
            for tgt in targets
        ]
        select = [STC_BLANK_IDX] + sorted(set(t for tgt in targets for t in tgt))
        target_map = {t: i for i, t in enumerate(select)}
        # pad the selection to a bucketed size with blank (harmless: the
        # graphs never reference padded channels)
        Csel = ((len(select) + select_multiple - 1) // select_multiple) * select_multiple
        select_padded = select + [STC_BLANK_IDX] * (Csel - len(select))
        star_idx = Csel

        remapped = [tuple(target_map[t] for t in tgt) for tgt in targets]
        compiled = [self._compiled(tgt, star_idx) for tgt in remapped]
        cgs = [c[0] for c in compiled]
        union = wcompile.union_stack_arc_tables(cgs)
        if union is not None:
            # shared-skeleton layout (see union_stack_arc_tables): the STC
            # label graphs share the criterion template, so the whole-scan
            # step is one MXU matmul instead of B matvecs
            table, positions, _ = union
            A = table.src.shape[0]
            star_mask = np.zeros((len(cgs), A), np.float32)
            for b, c in enumerate(compiled):
                star_mask[b, positions[b]] = c[1]
        else:
            table = wcompile.stack_arc_tables(cgs)
            A = table.src.shape[1]
            star_mask = np.stack(
                [
                    np.concatenate([c[1], np.zeros(A - len(c[1]), np.float32)])
                    for c in compiled
                ]
            )
        prepared = {
            "table": table,
            "star_mask": jnp.asarray(star_mask),
            "select": jnp.asarray(select_padded, dtype=jnp.int32),
            "log_penalty": jnp.asarray(math.log(prob), dtype=jnp.float32),
        }
        if _DENSE_IMPL not in ("off", "0"):
            dense = self._prepare_dense(compiled, Csel)
            if dense is not None:
                prepared["dense"] = dense
        return prepared

    def _prepare_dense(self, compiled, Csel):
        """Dense-adjacency tables for ops.factored.alignment_lattice_score.

        adj0 holds the non-star arcs (chain arcs, weight 0), adj_star the
        star arcs at unit base weight; the loss scales adj_star by
        e^{log_penalty} (star arc weight = 0 + penalty, so e^{0+p} =
        e^0 * e^p exactly).  Returns None when a sample violates the
        dense preconditions (epsilon arcs, mixed in-labels — neither
        occurs for make_stc_graph output) or the working set exceeds
        the gate."""
        C_em = 2 * Csel
        B = len(compiled)
        S = -(-max(len(c[0].start) for c in compiled) // 8) * 8
        if B * S * (S + C_em) > _DENSE_MAX_WORKSET:
            return None
        adj0 = np.zeros((B, S, S), np.float32)
        adj_star = np.zeros((B, S, S), np.float32)
        lab_oh = np.zeros((B, S, C_em), np.float32)
        start = np.full((B, S), wcompile.NEG, np.float32)
        accept = np.full((B, S), wcompile.NEG, np.float32)
        for b, (cg, smask) in enumerate(compiled):
            if len(cg.eps_src) > 0:
                return None
            lab = cg.label.astype(np.int64)
            n = len(cg.start)
            lo = np.full((n,), 2**31, np.int64)
            np.minimum.at(lo, cg.dst, lab)
            hi = np.full((n,), -1, np.int64)
            np.maximum.at(hi, cg.dst, lab)
            entered = hi >= 0
            if np.any(lo[entered] != hi[entered]) or (
                lab.size and lab.max() >= C_em
            ):
                return None
            ew = np.exp(cg.weight)
            np.add.at(adj0[b], (cg.dst, cg.src), ew * (1.0 - smask))
            np.add.at(adj_star[b], (cg.dst, cg.src), ew * smask)
            states = np.nonzero(entered)[0]
            lab_oh[b, states, hi[states]] = 1.0
            start[b, :n] = cg.start
            accept[b, :n] = cg.accept
        return {
            "adj0": jnp.asarray(adj0),
            "adj_star": jnp.asarray(adj_star),
            "lab_oh": jnp.asarray(lab_oh),
            "start": jnp.asarray(start),
            "accept": jnp.asarray(accept),
        }

    def star_channels(self, log_probs, select):
        """Append <star> and <star>\\token channels (stc.py:200-221)."""
        lse = jax.nn.logsumexp(log_probs[:, :, 1:], axis=2, keepdims=True)
        sel = jnp.take(log_probs, select, axis=2)
        neglse = logsubexp(lse, sel[:, :, 1:])
        return jnp.concatenate([sel, lse, neglse], axis=2)

    def loss(self, params, inputs, prepared, input_lengths=None):
        """inputs: [B, T, C] logits or log probabilities, blank at channel 0
        (log_softmax is idempotent, so already-normalized inputs pass
        through unchanged)."""
        B, T, C = inputs.shape
        inputs = jax.nn.log_softmax(inputs, axis=2)
        em = self.star_channels(inputs, prepared["select"])
        if "dense" in prepared and _DENSE_IMPL not in ("off", "0"):
            from ..ops import factored as _fact

            d = prepared["dense"]
            adj = d["adj0"] + jnp.exp(prepared["log_penalty"]) * d["adj_star"]
            scores = _fact.alignment_lattice_score(
                em, adj, d["lab_oh"], d["start"], d["accept"], input_lengths
            )
        else:
            table = prepared["table"]
            weight = (
                table.weight + prepared["star_mask"] * prepared["log_penalty"]
            )
            table = table._replace(weight=weight)
            scores = sparse.forward_score_batch_tables(
                em, table, input_lengths
            )
        losses = -scores
        if self.reduction == "mean":
            losses = losses / T
        elif self.reduction != "none":
            raise ValueError(f"invalid value for reduction '{self.reduction}'")
        return jnp.mean(losses)

    def viterbi(self, outputs, params=None, input_lengths=None):
        """Greedy decode with repeat/blank collapse (STC trains a standard
        emission model; decoding matches CTC greedy).  Predictions are
        shifted back into the dataset's 0-based id space."""
        from .ctc import CTC

        preds = CTC(blank=STC_BLANK_IDX).viterbi(outputs, None, input_lengths)
        if self.shift_targets:
            preds = [p - self.shift_targets for p in preds]
        return preds
