"""Generic WFST transducer criterion (TPU-native).

Capability parity with /root/reference/criterions/transducer.py:126-348.
The reference builds, per sample and per step, a chain-of-compositions of
GTN pointer graphs (target chain ∘ lexicon → wordpiece decompositions;
token graph ∘ decompositions → alignment graph; optional ∘ with an n-gram /
backoff transition graph) and scores it against a linear emission graph
with the C++ ``forward_score`` under a thread pool (transducer.py:260-296).

Here the same composition pipeline runs ONCE per distinct target on the
host graph compiler (wfst.ops), is cached, and is compiled into padded arc
tables; the per-step numeric work — log-semiring scans over
``[B, T, C]`` emissions — runs batched on device (ops.sparse).  Learnable
transition arc weights stay differentiable across the host composition via
arc provenance maps: device arc weight = static weight + params[widx].
"""

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse
from ..wfst import compile as wcompile
from ..wfst import graph as wgraph
from ..wfst import ops as wops
from ..wfst.graph import EPSILON, Graph
from .base import Criterion

# "on"/"auto": full n-gram (ngram in {1, 2}) transducers score through the
# transition-factored dense path (ops/factored.py); "off" (alias "step"):
# always compose transitions into the per-sample tables (generic path).
_FACTORED_IMPL = os.environ.get("GTN_TRANSDUCER_FACTORED", "auto")
_FACTORED_DISABLED = ("off", "step")


# ---------------------------------------------------------------------------
# Graph builders (host; structure mirrors transducer.py:15-123)
# ---------------------------------------------------------------------------


def make_chain_graph(sequence) -> Graph:
    """Linear acceptor over a label sequence (transducer.py:23-29)."""
    return wgraph.linear_graph([int(s) for s in sequence])


def make_transitions_graph(ngram, num_tokens, calc_grad=False) -> Graph:
    """Full n-gram token transition WFST (behavioral spec: reference
    transducer.py:32-58).

    Built as a context trie: one state per token history of length
    < ``ngram`` (breadth-first, so arc order matches the trie layer order),
    then full-order grams rotate the history window.  For ``ngram > 1`` a
    merged end state is reachable by an epsilon arc from every state.
    """
    g = Graph(calc_grad)
    root = g.add_node(True, ngram == 1)
    ctx_node = {(): root}
    frontier = [()]
    for _depth in range(ngram - 1):
        frontier = [ctx + (tok,) for ctx in frontier for tok in range(num_tokens)]
        for ctx in frontier:
            node = g.add_node(False, ngram == 1)
            ctx_node[ctx] = node
            g.add_arc(ctx_node[ctx[:-1]], node, ctx[-1])
    for ctx in frontier:
        for tok in range(num_tokens):
            g.add_arc(ctx_node[ctx], ctx_node[(ctx + (tok,))[1:]], tok)
    if ngram > 1:
        final = g.add_node(False, True)
        for node in range(final):
            g.add_arc(node, final, EPSILON)
    return g


def make_lexicon_graph(word_pieces, graphemes_to_idx) -> Graph:
    """Grapheme -> wordpiece transducer (behavioral spec: reference
    transducer.py:61-75): each piece spells out as a chain of grapheme
    inputs with epsilon outputs, the final grapheme emits the piece id and
    returns to the single hub (start/accept) state."""
    g = Graph()
    hub = g.add_node(True, True)
    for piece_id, piece in enumerate(word_pieces):
        spelled = [graphemes_to_idx[c] for c in piece]
        state = hub
        for ilabel in spelled[:-1]:
            nxt = g.add_node()
            g.add_arc(state, nxt, ilabel, EPSILON)
            state = nxt
        g.add_arc(state, hub, spelled[-1], piece_id)
    g.arc_sort()
    return g


def make_token_graph(token_list, blank="none", allow_repeats=True) -> Graph:
    """Alignment-label -> token transducer (behavioral spec: reference
    transducer.py:78-123): consuming one or more consecutive copies of an
    alignment label transduces to one token.  With a blank, an extra state
    consumes blank labels emitting nothing; 'forced' requires passing
    through it between tokens (token states are then non-accepting)."""
    if not allow_repeats and blank != "optional":
        raise ValueError("allow_repeats=False requires blank='optional'")
    n = len(token_list)
    g = Graph()
    hub = g.add_node(True, True)
    tok_state = [g.add_node(False, blank != "forced") for _ in range(n)]
    blank_state = None
    if blank != "none":
        # the blank emission channel is by convention the last one (id n)
        blank_state = g.add_node()
        g.add_arc(hub, blank_state, n, EPSILON)
        g.add_arc(blank_state, hub, EPSILON, EPSILON)
    entry = blank_state if blank == "forced" else hub
    for tok, state in enumerate(tok_state):
        g.add_arc(entry, state, tok, tok)
        g.add_arc(state, state, tok, EPSILON)  # absorb repeated emissions
        if not allow_repeats:
            g.add_arc(state, blank_state, n, EPSILON)
            for other in range(n):
                if other != tok:
                    g.add_arc(state, tok_state[other], other, other)
        elif blank == "forced":
            g.add_arc(state, blank_state, n, EPSILON)
        else:
            g.add_arc(state, hub, EPSILON, EPSILON)
    return g


# ---------------------------------------------------------------------------
# Criterion
# ---------------------------------------------------------------------------


class Transducer(Criterion):
    """Generic transducer loss (transducer.py:126-197).

    Args:
      tokens: list of iterables (e.g. strings / tuples) — output tokens.
      graphemes_to_idx: grapheme -> integer index of the emission channels
        consumed by target chains.
      ngram: order of a full n-gram transition model (0 = none).
      transitions: a pre-built transition Graph (e.g. pruned backoff model
        from scripts.build_transitions); mutually exclusive with ngram.
      blank: 'none' | 'optional' | 'forced'.
      allow_repeats: allow consecutive identical tokens in alignments.
      reduction: 'none' or 'mean' (scale per-sample loss by 1/target_len).
    """

    def __init__(
        self,
        tokens,
        graphemes_to_idx,
        ngram=0,
        transitions=None,
        blank="none",
        allow_repeats=True,
        reduction="none",
    ):
        if blank not in ("optional", "forced", "none"):
            raise ValueError(
                f"blank={blank!r}: expected 'optional', 'forced', or 'none'"
            )
        if ngram > 0 and transitions is not None:
            raise ValueError("ngram and transitions are mutually exclusive")
        self.tokens = make_token_graph(tokens, blank=blank, allow_repeats=allow_repeats)
        self.lexicon = make_lexicon_graph(tokens, graphemes_to_idx)
        self.blank = blank
        self.reduction = reduction
        self._num_tokens = len(tokens)
        if ngram > 0:
            transitions = make_transitions_graph(
                ngram, len(tokens) + int(blank != "none"), True
            )
        if transitions is not None:
            # Arc weights are entirely learnable (reference zero-init at
            # transducer.py:177-179 and set_weights overwrite at :255).
            self.transitions = transitions.copy()
            self.transitions.set_weights([0.0] * transitions.num_arcs())
            self.num_transition_arcs = transitions.num_arcs()
            norm_cg = wcompile.compile_acceptor(self.transitions)
            self._norm_table = wcompile.to_arc_table(norm_cg)
            self._norm_widx = np.concatenate(
                [norm_cg.arc_id, -np.ones(len(self._norm_table.src) - len(norm_cg.arc_id), np.int32)]
            )
            ne = len(norm_cg.eps_src)
            self._norm_eps_widx = np.concatenate(
                [norm_cg.eps_arc_id, -np.ones(len(self._norm_table.eps_src) - ne, np.int32)]
            )
        else:
            self.transitions = None
            self.num_transition_arcs = 0
        # Full n-gram models factorize: the transition weight between two
        # alignment arcs depends only on their labels, and alignment-graph
        # states have unique in-labels, so the transitions x alignments
        # product is never composed on the host — see ops/factored.py.
        self._factored_ngram = ngram if ngram in (1, 2) else 0
        # Loaded (pruned/backoff) transition graphs factorize too, with a
        # dense context axis and per-label transition matrices, when the
        # dense [N, S_c, S_c] materialization stays small.
        self._factored_backoff = False
        self._factored_backoff_dst = False
        self._eps_lr_struct = None
        if self.transitions is not None and not self._factored_ngram:
            nt = self._norm_table
            S_c = len(nt.start)
            N_chan = self._num_tokens + int(blank != "none")
            labels = np.asarray(nt.label)
            real = np.asarray(nt.weight) > wcompile.NEG / 2
            labels_ok = bool(
                nt.eps_depth <= 4
                and (labels[real] < N_chan).all()
                and (labels[real] >= 0).all()
            )
            self._factored_backoff = bool(
                labels_ok and N_chan * S_c * S_c <= 4_000_000
            )
            # destination-factored variant (ops/factored.py
            # backoff_dst_factored_score): needs every label's non-self
            # arcs to share one destination — true for every n-gram
            # automaton build_transitions.py emits (label l advances to
            # l's context; blank / run self-loops stay put) — and only
            # [S_c, N] dense matrices, so 1k-wordpiece LMs qualify.
            if labels_ok and N_chan * S_c <= 4_000_000:
                src = np.asarray(nt.src)[real]
                dst = np.asarray(nt.dst)[real]
                lab = labels[real]
                adv = src != dst
                dst_of = np.full((N_chan,), -1, np.int64)
                ok = True
                for l, d in zip(lab[adv], dst[adv]):
                    if dst_of[l] < 0:
                        dst_of[l] = d
                    elif dst_of[l] != d:
                        ok = False
                        break
                if ok:
                    p_dst = np.zeros((N_chan, S_c), np.float32)
                    have = dst_of >= 0
                    p_dst[np.nonzero(have)[0], dst_of[have]] = 1.0
                    self._dst_onehot = p_dst
                    self._factored_backoff_dst = True
                    # low-rank eps-closure structure (backoff chains
                    # land in few columns): host-static; weights fold
                    # in per step (ops.factored.eps_lowrank_build)
                    from ..ops import factored as _fact

                    self._eps_lr_struct = _fact.eps_chain_struct(
                        nt.eps_src, nt.eps_dst, S_c, nt.eps_depth
                    )
        self._align_cache: Dict[tuple, tuple] = {}

    # -- parameters -----------------------------------------------------
    def init_params(self):
        if self.transitions is None:
            return {}
        return {"transitions": jnp.zeros((self.num_transition_arcs,))}

    # -- host compilation ----------------------------------------------
    def _native_handles(self):
        """Lazy persistent native handles for the static graphs (so the
        whole per-target pipeline runs in one C++ call)."""
        from ..wfst import native

        if not native.available():
            return None
        if not hasattr(self, "_nh"):
            # warm=True pre-builds compose indexes: the handles are shared
            # across the prepare() thread pool
            self._nh = (
                native.to_native(self.lexicon, warm=True),
                native.to_native(self.tokens, warm=True),
                native.to_native(self.transitions, warm=True)
                if self.transitions is not None
                else None,
            )
        return self._nh

    def _compile_target(self, target: tuple, compose_transitions=True):
        key = target if compose_transitions else (target, "plain")
        cached = self._align_cache.get(key)
        if cached is not None:
            return cached
        handles = self._native_handles()
        if handles is not None:
            from ..wfst import native

            trans_h = handles[2] if compose_transitions else None
            t = native.compile_alignment(handles[0], handles[1], trans_h, target)
            cg = wcompile.CompiledGraph(
                src=t["src"], dst=t["dst"], label=t["label"], weight=t["weight"],
                arc_id=np.arange(len(t["src"]), dtype=np.int32),
                start=t["start"], accept=t["accept"],
                eps_src=t["eps_src"], eps_dst=t["eps_dst"],
                eps_weight=t["eps_weight"],
                eps_arc_id=np.arange(len(t["eps_src"]), dtype=np.int32),
                eps_depth=t["eps_depth"],
            )
            result = (cg, t["widx"], t["eps_widx"])
            if len(self._align_cache) > 100000:
                self._align_cache.clear()
            self._align_cache[key] = result
            return result
        target_chain = make_chain_graph(target)
        # All wordpiece decompositions of the target (marginalization):
        tokens_target = wops.remove(
            wops.project_output(wops.compose(target_chain, self.lexicon))
        )
        # Alignment graph over emission labels:
        alignments = wops.project_input(
            wops.remove(wops.compose(self.tokens, tokens_target))
        )
        if self.transitions is not None and compose_transitions:
            composed, prov = wops.compose(
                self.transitions, alignments, return_arc_map=True
            )
            cg = wcompile.compile_acceptor(composed)
            prov1 = np.asarray([p[0] for p in prov] + [-1], dtype=np.int32)
            widx = prov1[cg.arc_id]
            eps_widx = prov1[cg.eps_arc_id]
        else:
            cg = wcompile.compile_acceptor(alignments)
            widx = -np.ones(len(cg.src), dtype=np.int32)
            eps_widx = -np.ones(len(cg.eps_src), dtype=np.int32)
        result = (cg, widx, eps_widx)
        if len(self._align_cache) > 100000:
            self._align_cache.clear()
        self._align_cache[key] = result
        return result

    def prepare(self, targets):
        """Compile + stack per-sample alignment tables (host, cached).

        Cache misses compile in parallel on a thread pool — the native
        pipeline releases the GIL, so cold batches scale with cores.
        Full n-gram models take the factored path (plain alignment
        lattices + dense transition rows, ops/factored.py) unless a
        sample violates its structural preconditions."""
        keys = [tuple(int(t) for t in np.asarray(tgt)) for tgt in targets]
        # full-ngram factoring wins everywhere; backoff factoring trades
        # segment ops for dense einsums, a win only where segment ops are
        # pathological (TPU) — measured 36x SLOWER on CPU — so under
        # "auto" it requires the TPU backend ("on" forces it anywhere)
        use_factored = _FACTORED_IMPL not in _FACTORED_DISABLED and (
            self._factored_ngram
            or (
                (
                    self._factored_backoff
                    or self._factored_backoff_dst
                    or self.transitions is None
                )
                and (
                    _FACTORED_IMPL == "on"
                    or jax.default_backend() == "tpu"
                )
            )
        )
        if use_factored:
            prepared = self._prepare_factored(keys, targets)
            if prepared is not None:
                return prepared
        missing = [k for k in dict.fromkeys(keys) if k not in self._align_cache]
        if len(missing) > 1 and self._native_handles() is not None:
            from multiprocessing.pool import ThreadPool

            with ThreadPool(min(8, len(missing))) as pool:
                pool.map(self._compile_target, missing)
        compiled = [self._compile_target(k) for k in keys]
        cgs = [c[0] for c in compiled]
        union = wcompile.union_stack_arc_tables(cgs)
        if union is not None:
            # shared-skeleton layout: 1-D src/dst (one MXU matmul per scan
            # step instead of B matvecs), per-sample [B, A] labels/weights;
            # provenance arrays scatter into the union slots
            table, positions, eps_positions = union
            A = table.src.shape[0]
            E = table.eps_src.shape[0]
            widx = -np.ones((len(cgs), A), np.int32)
            eps_widx = -np.ones((len(cgs), max(E, 1)), np.int32)
            for b, c in enumerate(compiled):
                widx[b, positions[b]] = c[1]
                if E and len(eps_positions[b]):
                    eps_widx[b, eps_positions[b]] = c[2]
        else:
            table = wcompile.stack_arc_tables(cgs)
            A = table.src.shape[1]
            E = table.eps_src.shape[1]
            widx = np.stack(
                [np.concatenate([c[1], -np.ones(A - len(c[1]), np.int32)]) for c in compiled]
            )
            eps_widx = np.stack(
                [np.concatenate([c[2], -np.ones(E - len(c[2]), np.int32)]) for c in compiled]
            )
        lengths = np.asarray([len(np.asarray(t)) for t in targets], dtype=np.int32)
        return {
            "table": table,
            "widx": jnp.asarray(widx),
            "eps_widx": jnp.asarray(eps_widx),
            "target_lengths": jnp.asarray(lengths),
        }

    def _prepare_factored(self, keys, targets):
        """Plain alignment lattices as dense adjacency + in-label tables.

        Returns None (caller falls back to the composed path) if any
        sample's lattice has epsilon arcs, a state with mixed in-labels,
        or arc weights too large for the exp-space adjacency."""
        missing = [
            k for k in dict.fromkeys(keys)
            if (k, "plain") not in self._align_cache
        ]
        if len(missing) > 1 and self._native_handles() is not None:
            from functools import partial
            from multiprocessing.pool import ThreadPool

            with ThreadPool(min(8, len(missing))) as pool:
                pool.map(
                    partial(self._compile_target, compose_transitions=False),
                    missing,
                )
        cgs = []
        for k in keys:
            cg, _, _ = self._compile_target(k, compose_transitions=False)
            cgs.append(cg)

        N = self._num_tokens + int(self.blank != "none")
        # same shape bucketing as stack_arc_tables: round the state count
        # up to a multiple of 8 so width-sorted batches reuse compiles;
        # floor of one bucket so a batch of empty lattices (untransducible
        # targets) scores NEG instead of tripping zero-size reductions
        S = -(-max([len(cg.start) for cg in cgs] + [1]) // 8) * 8
        B = len(cgs)
        variant = "ngram"
        if self.transitions is None:
            # no transition factor at all: the plain dense-adjacency
            # scorer (alignment_lattice_score); gate on the [B, S, S]
            # adjacency + [B, S, N] label working set
            variant = "plain" if B * S * (S + N) <= 48_000_000 else None
            if variant is None:
                return None
        elif not self._factored_ngram:
            # working-set gates, checked BEFORE the O(B*S^2) packing below:
            # dense form runs a per-step [B, S_a, N, S_c] einsum; the
            # destination-factored form only [B, S_a, max(N, S_c)] matmuls.
            # A dense-eligible graph whose einsum working set is too big
            # for this batch shape drops to the dst variant when it fits.
            S_c = len(self._norm_table.start)
            variant = None
            if self._factored_backoff and B * S * N * S_c <= 48_000_000:
                variant = "dense"
            elif (
                self._factored_backoff_dst
                and B * S * (N + S_c) <= 48_000_000
            ):
                variant = "dst"
            if variant is None:
                return None
        adj_exp = np.zeros((B, S, S), np.float32)
        lab_oh = np.zeros((B, S, N), np.float32)
        start = np.full((B, S), wcompile.NEG, np.float32)
        accept = np.full((B, S), wcompile.NEG, np.float32)
        for b, cg in enumerate(cgs):
            if cg.eps_depth != 0 or len(cg.eps_src) > 0:
                return None
            real = cg.weight > wcompile.NEG / 2
            src, dst = cg.src[real], cg.dst[real]
            lab, w = cg.label[real], cg.weight[real]
            if w.size and (np.abs(w).max() > 30.0 or lab.max() >= N):
                return None
            # unique in-label per state
            lo = np.full((len(cg.start),), 2**31, np.int64)
            np.minimum.at(lo, dst, lab.astype(np.int64))
            hi = np.full((len(cg.start),), -1, np.int64)
            np.maximum.at(hi, dst, lab.astype(np.int64))
            entered = hi >= 0
            if np.any(lo[entered] != hi[entered]):
                return None
            np.add.at(adj_exp[b], (dst, src), np.exp(w))
            states = np.nonzero(entered)[0]
            lab_oh[b, states, hi[states]] = 1.0
            start[b, : len(cg.start)] = cg.start
            accept[b, : len(cg.accept)] = cg.accept
        lengths = np.asarray(
            [len(np.asarray(t)) for t in targets], dtype=np.int32
        )
        prepared = {
            "factored": {
                "adj_exp": jnp.asarray(adj_exp),
                "lab_oh": jnp.asarray(lab_oh),
                "start": jnp.asarray(start),
                "accept": jnp.asarray(accept),
            },
            "target_lengths": jnp.asarray(lengths),
        }
        if variant == "dst":
            # leafless marker: variant selection must live in the pytree
            # STRUCTURE (static under jit), not in a (traced) leaf value
            prepared["factored_dst"] = ()
        elif variant == "plain":
            prepared["factored_plain"] = ()
        return prepared

    def _transition_matrices(self, params, N):
        """Dense per-label transition matrices of the loaded backoff graph
        for ops.factored.backoff_factored_score.

        Built from the compiled transitions table + learnable arc weights
        each call (cheap: a few-hundred-element scatter-add); exp-space
        with a global stop-gradient shift so learned weights cannot
        overflow.  The integer index arrays are host numpy — baked into
        the jitted executable, never device-gathered."""
        nt = self._norm_table
        S_c = len(nt.start)
        p = jnp.asarray(params)
        w_ext = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
        n_p = p.shape[0]
        widx = self._norm_widx
        w_eff = jnp.asarray(nt.weight) + w_ext[np.where(widx >= 0, widx, n_p)]
        t_shift = jax.lax.stop_gradient(jnp.maximum(jnp.max(w_eff), 0.0))
        label = np.asarray(nt.label)
        src = np.asarray(nt.src)
        dst = np.asarray(nt.dst)
        # padding arcs carry weight NEG: exp underflows to an exact 0 add
        T_exp = jnp.zeros((N, S_c, S_c), jnp.float32).at[
            np.clip(label, 0, N - 1), src, dst
        ].add(jnp.exp(w_eff - t_shift))
        E = len(np.asarray(nt.eps_src))
        if E:
            ew_eff = jnp.asarray(nt.eps_weight) + w_ext[
                np.where(self._norm_eps_widx >= 0, self._norm_eps_widx, n_p)
            ]
            e_shift = jax.lax.stop_gradient(
                jnp.maximum(jnp.max(ew_eff), 0.0)
            )
            E_exp = jnp.zeros((S_c, S_c), jnp.float32).at[
                np.asarray(nt.eps_src), np.asarray(nt.eps_dst)
            ].add(jnp.exp(ew_eff - e_shift))
        else:
            e_shift = jnp.zeros(())
            E_exp = jnp.zeros((S_c, S_c), jnp.float32)
        return (
            jnp.asarray(nt.start), jnp.asarray(nt.accept),
            T_exp, t_shift, E_exp, e_shift, nt.eps_depth,
        )

    def _transition_matrices_dst(self, params, N):
        """[S_c, N]-sized matrices for the destination-factored scorer
        (ops.factored.backoff_dst_factored_score): advance arcs scatter
        into W_adv_exp[c, l], self-loops into D_exp[c, l] (returned
        transposed), plus the static one-hot destination map built at
        __init__.  Same shift/epsilon handling as the dense form."""
        nt = self._norm_table
        S_c = len(nt.start)
        p = jnp.asarray(params)
        w_ext = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
        n_p = p.shape[0]
        widx = self._norm_widx
        w_eff = jnp.asarray(nt.weight) + w_ext[np.where(widx >= 0, widx, n_p)]
        t_shift = jax.lax.stop_gradient(jnp.maximum(jnp.max(w_eff), 0.0))
        label = np.clip(np.asarray(nt.label), 0, N - 1)
        src = np.asarray(nt.src)
        dst = np.asarray(nt.dst)
        exp_w = jnp.exp(w_eff - t_shift)
        is_self = src == dst
        # padding arcs (weight NEG) underflow to exact 0 in either matrix
        W_adv_exp = jnp.zeros((S_c, N), jnp.float32).at[
            src, label
        ].add(jnp.where(jnp.asarray(is_self), 0.0, exp_w))
        D_exp_t = jnp.zeros((N, S_c), jnp.float32).at[
            label, src
        ].add(jnp.where(jnp.asarray(is_self), exp_w, 0.0))
        E = len(np.asarray(nt.eps_src))
        if E:
            ew_eff = jnp.asarray(nt.eps_weight) + w_ext[
                np.where(self._norm_eps_widx >= 0, self._norm_eps_widx, n_p)
            ]
            e_shift = jax.lax.stop_gradient(
                jnp.maximum(jnp.max(ew_eff), 0.0)
            )
            E_exp = jnp.zeros((S_c, S_c), jnp.float32).at[
                np.asarray(nt.eps_src), np.asarray(nt.eps_dst)
            ].add(jnp.exp(ew_eff - e_shift))
        else:
            e_shift = jnp.zeros(())
            E_exp = jnp.zeros((S_c, S_c), jnp.float32)
        return (
            jnp.asarray(nt.start), jnp.asarray(nt.accept),
            W_adv_exp, D_exp_t, jnp.asarray(self._dst_onehot),
            t_shift, E_exp, e_shift, nt.eps_depth,
        )

    def _eps_eff_weights(self, params):
        """Effective (static + learnable, UNshifted) epsilon arc weights
        of the loaded transition graph — the input of
        ops.factored.eps_lowrank_build."""
        nt = self._norm_table
        p = jnp.asarray(params)
        w_ext = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
        widx = self._norm_eps_widx
        return jnp.asarray(nt.eps_weight) + w_ext[
            np.where(widx >= 0, widx, p.shape[0])
        ]

    # -- loss -----------------------------------------------------------
    @staticmethod
    def _apply_params(table, widx, eps_widx, params):
        w = jnp.asarray(params)
        w_ext = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        weight = table.weight + w_ext[jnp.where(widx >= 0, widx, w.shape[0])]
        eps_weight = table.eps_weight + w_ext[
            jnp.where(eps_widx >= 0, eps_widx, w.shape[0])
        ]
        return table._replace(weight=weight, eps_weight=eps_weight)

    def loss(self, params, inputs, prepared, input_lengths=None):
        if "factored" in prepared:
            from ..ops import factored as _fact

            N = self._num_tokens + int(self.blank != "none")
            f = prepared["factored"]
            if "factored_plain" in prepared:
                # transitions=None: log_softmax normalizes per frame (as
                # the sparse branch below), the lattice score is the loss
                em = jax.nn.log_softmax(inputs, axis=2)
                score = _fact.alignment_lattice_score(
                    em, f["adj_exp"], f["lab_oh"], f["start"],
                    f["accept"], input_lengths,
                )
                return self._reduce(-score, prepared)
            if self._factored_ngram:
                ws, W, we, we0 = _fact.ngram_rows(
                    params["transitions"], self._factored_ngram, N
                )
                score = _fact.factored_lattice_score(
                    inputs, f["adj_exp"], f["lab_oh"], f["start"],
                    f["accept"], ws, W, we, input_lengths, we0,
                )
                norm = _fact.dense_ngram_norm(
                    inputs, ws, W, we, input_lengths, we0
                )
            elif "factored_dst" not in prepared and self._factored_backoff:
                tmats = self._transition_matrices(params["transitions"], N)
                score = _fact.backoff_factored_score(
                    inputs, f["adj_exp"], f["lab_oh"], f["start"],
                    f["accept"], *tmats, input_lengths,
                )
                # dense normalizer with the same exp-matrices: no per-arc
                # segment ops anywhere in the backoff-factored loss
                norm = _fact.backoff_dense_norm(
                    inputs, *tmats, input_lengths
                )
            else:
                # destination-factored: the only dense-scoreable regime
                # for 1k-wordpiece LMs; the normalizer is dense too (the
                # sparse per-arc scan over such graphs is the pathology
                # the factoring avoids)
                tmats = self._transition_matrices_dst(
                    params["transitions"], N
                )
                # low-rank eps closure rides the exp-linear tier (same
                # GTN_FACTORED_VJP switch; off = dense-closure oracle)
                elr = None
                if self._eps_lr_struct is not None and _fact._use_vjp():
                    elr = _fact.eps_lowrank_build(
                        self._eps_eff_weights(params["transitions"]),
                        self._eps_lr_struct,
                    )
                score = _fact.backoff_dst_factored_score(
                    inputs, f["adj_exp"], f["lab_oh"], f["start"],
                    f["accept"], *tmats, input_lengths,
                    eps_lowrank=elr,
                )
                norm = _fact.backoff_dst_norm(
                    inputs, *tmats, input_lengths, eps_lowrank=elr
                )
            losses = -(score - norm)
            return self._reduce(losses, prepared)
        table = prepared["table"]
        if self.transitions is None:
            inputs = jax.nn.log_softmax(inputs, axis=2)
            score = sparse.forward_score_batch_tables(inputs, table, input_lengths)
            losses = -score
        else:
            p = params["transitions"]
            # batched weight application (widx is [B, A])
            w_ext = jnp.concatenate([p, jnp.zeros((1,), p.dtype)])
            widx, eps_widx = prepared["widx"], prepared["eps_widx"]
            weight = table.weight + w_ext[jnp.where(widx >= 0, widx, p.shape[0])]
            eps_weight = table.eps_weight + w_ext[
                jnp.where(eps_widx >= 0, eps_widx, p.shape[0])
            ]
            table = table._replace(weight=weight, eps_weight=eps_weight)
            score = sparse.forward_score_batch_tables(inputs, table, input_lengths)
            norm_table = self._apply_params(
                self._norm_table, self._norm_widx, self._norm_eps_widx, p
            )
            norm = sparse.forward_score_batch(inputs, norm_table, input_lengths)
            losses = -(score - norm)
        return self._reduce(losses, prepared)

    def _reduce(self, losses, prepared):
        if self.reduction == "mean":
            lens = prepared["target_lengths"]
            losses = losses * jnp.where(lens > 0, 1.0 / jnp.maximum(lens, 1), 1.0)
        elif self.reduction != "none":
            raise ValueError(f"invalid reduction {self.reduction}")
        return jnp.mean(losses)

    # -- decoding -------------------------------------------------------
    def _decode_matrices_dst(self, params_np):
        """Tropical [S_c, N] matrices for the destination-factored decode
        (ops.factored.backoff_dst_viterbi), built host-side from the
        compiled transitions table + concrete learned weights (parallel
        arcs tropical-merged with maximum.at)."""
        nt = self._norm_table
        S_c = len(nt.start)
        N = self._num_tokens + int(self.blank != "none")
        n_p = params_np.shape[0]
        w_ext = np.concatenate([params_np, np.zeros((1,), params_np.dtype)])
        widx = self._norm_widx
        w_eff = np.asarray(nt.weight) + w_ext[
            np.where(widx >= 0, widx, n_p)
        ]
        src = np.asarray(nt.src)
        dst = np.asarray(nt.dst)
        lab = np.clip(np.asarray(nt.label), 0, N - 1)
        real = np.asarray(nt.weight) > wcompile.NEG / 2
        is_self = (src == dst) & real
        is_adv = (src != dst) & real
        W_adv = np.full((S_c, N), wcompile.NEG, np.float32)
        np.maximum.at(W_adv, (src[is_adv], lab[is_adv]), w_eff[is_adv])
        D = np.full((S_c, N), wcompile.NEG, np.float32)
        np.maximum.at(D, (src[is_self], lab[is_self]), w_eff[is_self])
        E = np.full((S_c, S_c), wcompile.NEG, np.float32)
        if len(np.asarray(nt.eps_src)):
            ew_eff = np.asarray(nt.eps_weight) + w_ext[
                np.where(
                    self._norm_eps_widx >= 0, self._norm_eps_widx, n_p
                )
            ]
            np.maximum.at(
                E, (np.asarray(nt.eps_src), np.asarray(nt.eps_dst)), ew_eff
            )
        return (
            jnp.asarray(nt.start), jnp.asarray(nt.accept),
            jnp.asarray(W_adv), jnp.asarray(D),
            jnp.asarray(self._dst_onehot), jnp.asarray(E), nt.eps_depth,
        )

    def viterbi_dispatch(self, outputs, params=None, input_lengths=None):
        outputs = jnp.asarray(outputs)
        if self.transitions is not None:
            params = params if params is not None else self.params
            ptr = params["transitions"]
            # huge-LM regime: the eps-removed composed decode table has
            # ~S_c * N arcs — decode through the destination-factored
            # tropical scan instead of per-arc seg_max over it
            if self._factored_backoff_dst:
                nt = self._norm_table
                N = self._num_tokens + int(self.blank != "none")
                if len(nt.start) * N > _DECODE_FACTORED_MIN_ARCS:
                    from ..ops import factored as _fact

                    cached = getattr(self, "_decode_dst_cache", None)
                    if cached is not None and cached[0] is ptr:
                        mats = cached[1]
                    else:
                        mats = self._decode_matrices_dst(np.asarray(ptr))
                        self._decode_dst_cache = (ptr, mats)
                    labels, _ = _backoff_dst_viterbi_jit(
                        outputs, *mats,
                        None if input_lengths is None
                        else jnp.asarray(input_lengths),
                    )
                    return (labels, input_lengths)
            cached = getattr(self, "_decode_cache", None)
            if cached is not None and cached[0] is ptr:
                table = cached[1]
            else:
                # Epsilon removal mixes arc weights numerically, but its
                # *structure* is weight-independent: a provenance template
                # built once re-weights in O(contributions) numpy per
                # update, so per-step metric decodes during training add
                # no host graph compilation (the param-identity cache
                # still short-circuits eval loops reusing one pytree).
                tmpl = getattr(self, "_decode_template", None)
                if tmpl is None:
                    tmpl = wcompile.build_decode_template(self.transitions)
                    self._decode_template = tmpl
                table = wcompile.apply_decode_weights(tmpl, np.asarray(ptr))
                self._decode_cache = (ptr, table)
            labels, _ = _viterbi_batch_jit(outputs, table, input_lengths)
        else:
            labels = jnp.argmax(outputs, axis=2)
        return (labels, input_lengths)

    def viterbi_finalize(self, handle):
        labels_dev, input_lengths = handle
        return self._transduce(np.asarray(labels_dev), input_lengths)

    def viterbi(self, outputs, params=None, input_lengths=None):
        """Best alignment path through emissions (∘ transitions), then
        transduce alignment labels to tokens taking the shortest ambiguous
        output (transducer.py:199-234)."""
        return self.viterbi_finalize(
            self.viterbi_dispatch(outputs, params, input_lengths)
        )

    def _transduce(self, labels, input_lengths):
        B = labels.shape[0]
        if self.blank in ("none", "optional"):
            # vectorized run-collapse (see _alignment_to_tokens); -1 labels
            # only occur on dead frames, which the length mask removes
            Bn, Tn = labels.shape
            keep = np.ones((Bn, Tn), dtype=bool)
            keep[:, 1:] = labels[:, 1:] != labels[:, :-1]
            keep &= (labels >= 0) & (labels < self._num_tokens)
            if input_lengths is not None:
                lens = np.asarray(input_lengths)
                keep &= np.arange(Tn)[None, :] < lens[:, None]
            return [
                labels[b, keep[b]].astype(np.int32) for b in range(Bn)
            ]
        # blank == 'forced': one native batched call does the run collapse
        # + feasibility check (the graph transduction below is the oracle
        # it is differential-tested against in tests/test_native.py)
        from ..wfst import native

        res = native.forced_collapse(labels, self._num_tokens, input_lengths)
        if res is not None:
            return res

        def one(b):
            seq = [int(l) for l in labels[b] if l >= 0]
            if input_lengths is not None:
                seq = seq[: int(np.asarray(input_lengths)[b])]
            return np.asarray(self._alignment_to_tokens(seq), dtype=np.int32)

        if B > 1:
            # the per-sample graph transduction runs native compose/viterbi
            # through ctypes, which releases the GIL — thread it
            from multiprocessing.pool import ThreadPool

            with ThreadPool(min(B, 8)) as pool:
                return pool.map(one, range(B))
        return [one(b) for b in range(B)]

    def _alignment_to_tokens(self, seq):
        """Transduce an alignment label sequence to tokens, taking the
        shortest ambiguous output (reference transducer.py:224-229
        compose(path, tokens) → viterbi → project_output → remove).

        For blank in {none, optional} the token graph's shortest
        transduction is exactly run-collapse-then-drop-blank (each maximal
        run of one alignment label folds into a single token via the
        epsilon-output self-loop; the blank state transduces to nothing),
        so the graph composition reduces to a linear pass.  blank='forced'
        keeps the general graph path since infeasible alignments must
        produce an empty decode."""
        if self.blank in ("none", "optional"):
            ntoks = self._num_tokens
            out = []
            prev = None
            for l in seq:
                if l != prev:
                    if l < ntoks:
                        out.append(l)
                    prev = l
            return out
        path = make_chain_graph(seq)
        composed = wops.compose(path, self.tokens)
        # Penalize non-epsilon outputs so ties break toward fewer tokens.
        for i in range(composed.num_arcs()):
            if composed.arc_olabel[i] != EPSILON:
                composed.arc_weight[i] -= 1e-6
        best = wops.viterbi_path(composed)
        out = wops.remove(wops.project_output(best))
        return out.labels_to_list()


# sparse.viterbi_batch self-jits and, when the decode table is concrete
# (it is here: apply_decode_weights builds it host-side), routes shared
# epsilon-free tables to the whole-scan bucket kernel
_viterbi_batch_jit = sparse.viterbi_batch

# route the metrics decode through the destination-factored tropical scan
# once the eps-removed composed table would exceed this many arcs.  Chip
# measurement (chip_factored_verify, 200wp bigram LM, ~40k-arc composed
# table): dst decode 32.7 ms/call vs composed 137.9, exact label parity —
# so the dst route wins well below the old 1 << 18 fit-driven threshold
_DECODE_FACTORED_MIN_ARCS = 1 << 15


@functools.partial(jax.jit, static_argnums=(7,))
def _backoff_dst_viterbi_jit(em, ctx_start, ctx_accept, W_adv_log, D_log,
                             dst_oh, E_log, eps_depth, input_lengths):
    from ..ops import factored as _fact

    return _fact.backoff_dst_viterbi(
        em, ctx_start, ctx_accept, W_adv_log, D_log, dst_oh, E_log,
        eps_depth, input_lengths,
    )


# ---------------------------------------------------------------------------
# WFST convolution layer
# ---------------------------------------------------------------------------


def make_kernel_graph(x, blank_idx, blank_optional, spike=False, calc_grad=False):
    """Host Graph form of a conv-transduce kernel (behavioral spec:
    reference transducer.py:351-367); used for tests/debugging — the layer
    itself runs on compiled banded tables (ops.convkernel.compile_kernels).

    Per token: a 'token' state (self-loop unless spike) and a 'post-blank'
    state; accept at the last pair (the token state only when blank is
    optional).  With optional blank, distinct adjacent tokens connect
    directly, skipping the blank."""
    g = Graph(calc_grad)
    entry = g.add_node(True, len(x) == 0)
    g.add_arc(entry, entry, blank_idx)
    prev_tok_state = None
    prev_label = None
    for pos, label in enumerate(x):
        last = pos + 1 == len(x)
        tok_state = g.add_node(False, blank_optional and last)
        gap_state = g.add_node(False, last)
        g.add_arc(entry, tok_state, label)
        if not spike:
            g.add_arc(tok_state, tok_state, label)
        g.add_arc(tok_state, gap_state, blank_idx)
        g.add_arc(gap_state, gap_state, blank_idx)
        if blank_optional and prev_tok_state is not None and prev_label != label:
            g.add_arc(prev_tok_state, tok_state, label)
        prev_tok_state, prev_label = tok_state, label
        entry = gap_state
    return g


class ConvTransduce1D:
    """1-D convolutional transducer layer (transducer.py:370-455): each
    output channel is the forward (or Viterbi) score of a small kernel WFST
    intersected with a sliding kernel_size window of the input.

    All |lexicon| kernel lattices for all windows are scored in one batched
    banded recursion on device (ops.convkernel) instead of the reference's
    per-window per-kernel GTN calls (transducer.py:486-499).

    This is a callable layer: ``layer(inputs, params)`` with inputs
    [B, T, C]; ``params`` is None unless learn_params, in which case
    ``init_params()`` supplies the zero-initialized kernel arc weights.
    """

    def __init__(
        self,
        lexicon,
        kernel_size,
        stride,
        blank_idx,
        blank_optional=True,
        learn_params=False,
        scale="none",
        normalize="none",
        viterbi=False,
        spike=False,
    ):
        import math as _math

        from ..ops import convkernel

        self.normalize = normalize
        self.viterbi = viterbi
        if scale == "none":
            self.scale = 1.0
        elif scale == "sqrt":
            self.scale = _math.sqrt(kernel_size)
        elif scale == "linear":
            self.scale = float(kernel_size)
        else:
            raise ValueError(f"Unknown scale {scale}")
        if normalize not in ["none", "pre", "post"]:
            raise ValueError(f"Unknown normalization {normalize}")
        if kernel_size % 2 == 0:
            raise ValueError("Use an odd kernel size for easy padding.")

        def size_with_rep(token):
            reps = sum(t1 == t2 for t1, t2 in zip(token[:-1], token[1:]))
            return len(token) + reps

        min_kernel_size = max(size_with_rep(l) for l in lexicon)
        if kernel_size < min_kernel_size:
            raise ValueError(f"Kernel size needed of at least {min_kernel_size}.")
        self.kernel_size = kernel_size
        self.stride = stride
        self.learn_params = learn_params
        self.tables = convkernel.compile_kernels(
            lexicon, blank_idx, blank_optional, spike
        )

    def init_params(self):
        if not self.learn_params:
            return None
        return jnp.zeros((self.tables.num_params,))

    def __call__(self, inputs, params=None):
        from ..ops import convkernel

        # pad the raw scores first so that with normalize='pre' the padded
        # edge frames normalize to uniform log-probs (-log C), not 0
        # (reference transducer.py:437-441 pads before log_softmax)
        pad = self.kernel_size // 2
        inputs = jnp.pad(inputs, ((0, 0), (pad, pad), (0, 0)))
        if self.normalize == "pre":
            inputs = jax.nn.log_softmax(inputs, axis=2)
        windows = convkernel.make_windows(
            inputs, self.kernel_size, self.stride, padded=True
        )
        outputs = convkernel.conv_transduce_scores(
            windows, self.tables, params, self.viterbi
        )
        outputs = outputs / self.scale
        if self.normalize == "post":
            outputs = jax.nn.softmax(outputs, axis=2)
        if self.normalize == "pre":
            outputs = jnp.exp(outputs)
        return outputs
