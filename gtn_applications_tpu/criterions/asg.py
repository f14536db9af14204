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

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lattice
from .base import Criterion
from .common import pad_targets


def pack_replabels(tokens, num_replabels):
    """Replace up-to-``num_replabels`` consecutive repeats with repeat labels.

    Repeat label k-1 (k in 1..num_replabels) encodes "repeat previous token k
    times"; real tokens are shifted up by num_replabels.  Mirrors
    asg.py:13-32 (including nested-list handling).
    """
    if all(isinstance(t, (list, tuple)) for t in tokens) and len(tokens) > 0:
        return [pack_replabels(list(t), num_replabels) for t in tokens]
    tokens = list(tokens)
    new_tokens = []
    num = 0
    prev_token = -1
    for token in tokens:
        if token == prev_token and num < num_replabels:
            num += 1
        else:
            if num > 0:
                new_tokens.append(num - 1)
                num = 0
            new_tokens.append(token + num_replabels)
            prev_token = token
    if num > 0:
        new_tokens.append(num - 1)
    return new_tokens


def unpack_replabels(tokens, num_replabels):
    """Inverse of pack_replabels (asg.py:35-49)."""
    if all(isinstance(t, (list, tuple)) for t in tokens) and len(tokens) > 0:
        return [unpack_replabels(list(t), num_replabels) for t in tokens]
    tokens = list(tokens)
    new_tokens = []
    prev_token = -1
    for token in tokens:
        if token >= num_replabels:
            new_tokens.append(token - num_replabels)
            prev_token = token
        elif prev_token != -1:
            for _ in range(token + 1):
                new_tokens.append(prev_token - num_replabels)
            prev_token = -1
    return new_tokens


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
        return _asg_viterbi_jit(outputs, transitions, input_lengths)

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


_asg_viterbi_jit = jax.jit(lattice.asg_viterbi)
