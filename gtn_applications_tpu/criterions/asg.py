"""Auto-Segmentation (ASG) criterion (TPU-native).

Capability parity with /root/reference/criterions/asg.py: a learned dense
``(N+1) x N`` transition matrix (entry [0, j] = start score of j, entry
[i+1, j] = score of label i following label j, matching GTN's arc creation
order at asg.py:54-69), loss = logadd over all paths through
``intersect(emissions, transitions)`` minus the force-aligned score through
the target chain (asg.py:111-115), replabel packing (asg.py:13-49) and
optional garbage-token interleaving (asg.py:203-208).  The two per-sample
GTN graph intersections collapse into two batched lattice scans
(ops.lattice.asg_fcc_score / asg_fal_score); the transition-matrix gradient
— which GTN extracts from transition-graph arc gradients (asg.py:164-168) —
falls out of JAX AD.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lattice
from .base import Criterion
from .common import pad_targets


def _run_length_encode(seq):
    """[(value, run_length)] pairs over maximal runs of equal values."""
    runs = []
    for item in seq:
        if runs and runs[-1][0] == item:
            runs[-1][1] += 1
        else:
            runs.append([item, 1])
    return runs


def pack_replabels(tokens, num_replabels):
    """Encode consecutive repeats with repeat labels (semantics of reference
    asg.py pack_replabels, including nested-list handling).

    Repeat labels occupy ids 0..num_replabels-1 (label k means "the previous
    token occurred k+1 more times"); real token ids shift up by
    num_replabels.  A run longer than num_replabels+1 is split greedily:
    each chunk re-emits the token followed by the largest expressible repeat
    label for the chunk's remaining copies.
    """
    if len(tokens) > 0 and all(isinstance(t, (list, tuple)) for t in tokens):
        return [pack_replabels(t, num_replabels) for t in tokens]
    packed = []
    for tok, count in _run_length_encode(tokens):
        while count > 0:
            span = min(count, num_replabels + 1)
            packed.append(int(tok) + num_replabels)
            if span > 1:
                packed.append(span - 2)
            count -= span
    return packed


def unpack_replabels(tokens, num_replabels):
    """Inverse of :func:`pack_replabels`.

    A repeat label r expands to r+1 extra copies of the most recent real
    token; repeat labels with no preceding real token (or following another
    repeat label that was just consumed) are dropped, matching the
    reference's tolerance of malformed input.
    """
    if len(tokens) > 0 and all(isinstance(t, (list, tuple)) for t in tokens):
        return [unpack_replabels(t, num_replabels) for t in tokens]
    decoded = []
    expandable = False
    for tok in tokens:
        if tok >= num_replabels:
            decoded.append(int(tok) - num_replabels)
            expandable = True
        elif expandable:
            decoded.extend([decoded[-1]] * (int(tok) + 1))
            expandable = False
    return decoded


def create_transitions_graph(transitions, calc_grad=False):
    """Dense ASG transition matrix -> WFST (asg.py:54-69): node 0 is the
    start, node i+1 accepts label i; arc order (start arcs, then the (i, j)
    double loop) matches the row-major weight layout so set_weights /
    transition params index identically to the reference."""
    from ..wfst.graph import Graph

    transitions = np.asarray(transitions)
    num_classes = transitions.shape[1]
    assert transitions.shape == (num_classes + 1, num_classes)
    g = Graph(calc_grad)
    g.add_node(True)
    for i in range(1, num_classes + 1):
        g.add_node(False, True)
        g.add_arc(0, i, i - 1, i - 1, float(transitions[0, i - 1]))
    for i in range(num_classes):
        for j in range(num_classes):
            g.add_arc(j + 1, i + 1, i, i, float(transitions[i + 1, j]))
    return g


class ASG(Criterion):
    """ASG loss with learned transitions (asg.py:191-209)."""

    def __init__(self, num_classes, num_replabels=1, use_garbage=True):
        # the reference asserts num_replabels > 0 (asg.py:196) although its
        # factory defaults to 0 (utils.py:248) — 0 is handled here as
        # "no replabel packing"
        assert num_replabels >= 0
        self.num_classes = num_classes
        self.num_replabels = num_replabels
        self.use_garbage = use_garbage
        self.garbage_idx = (
            num_classes + num_replabels if use_garbage else None
        )
        self.N = num_classes + num_replabels + int(use_garbage)

    def init_params(self):
        return {"transitions": jnp.zeros((self.N + 1, self.N))}

    def prepare(self, targets):
        """Host transform: replabel packing + garbage interleave + padding."""
        packed = [
            pack_replabels(list(np.asarray(t)), self.num_replabels) for t in targets
        ]
        if self.garbage_idx is not None:
            out = []
            for tgt in packed:
                g = [self.garbage_idx] * (len(tgt) * 2 + 1)
                g[1::2] = tgt
                out.append(g)
            packed = out
        return pad_targets(packed)

    def loss(self, params, inputs, prepared, input_lengths=None):
        targets, target_lengths = prepared
        return lattice.asg_loss(
            inputs, params["transitions"], targets, target_lengths, "mean",
            input_lengths,
        )

    def viterbi_device(self, outputs, transitions, input_lengths=None):
        global _VIT_BACKTRACE
        if _VIT_BACKTRACE == "kernel":
            try:
                return _asg_viterbi_jit(
                    outputs, transitions, input_lengths, "kernel"
                )
            except Exception:  # pragma: no cover - compile-failure escape
                logging.warning(
                    "ASG Pallas backtrace kernel failed; falling back to "
                    "the XLA backtrace for this process", exc_info=True
                )
                _VIT_BACKTRACE = "xla"
        return _asg_viterbi_jit(outputs, transitions, input_lengths, "xla")

    def viterbi_dispatch(self, outputs, params=None, input_lengths=None):
        params = params if params is not None else self.params
        paths, _ = self.viterbi_device(outputs, params["transitions"], input_lengths)
        return (paths, input_lengths)

    def viterbi_finalize(self, handle):
        paths_dev, input_lengths = handle
        paths = np.asarray(paths_dev)
        from ..wfst import native as _native

        if _native.available():
            out = _native.asg_collapse(
                paths, input_lengths, self.garbage_idx, self.num_replabels
            )
            if out is not None:
                return out
        return self._cleanup(paths, input_lengths)

    def viterbi(self, outputs, params=None, input_lengths=None):
        """Device tropical scan + host cleanup (asg.py:211-237)."""
        return self.viterbi_finalize(
            self.viterbi_dispatch(outputs, params, input_lengths)
        )

    def _cleanup(self, paths, input_lengths):
        out = []
        for b, path in enumerate(paths):
            if input_lengths is not None:
                path = path[: int(input_lengths[b])]
            collapsed = [
                int(p) for i, p in enumerate(path) if i == 0 or p != path[i - 1]
            ]
            if self.garbage_idx is not None:
                collapsed = [p for p in collapsed if p != self.garbage_idx]
            out.append(
                np.asarray(
                    unpack_replabels(collapsed, self.num_replabels), dtype=np.int32
                )
            )
        return out


_VIT_BACKTRACE = "kernel"
_asg_viterbi_jit = jax.jit(
    lattice.asg_viterbi, static_argnames=("backtrace",)
)
