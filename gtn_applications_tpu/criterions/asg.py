"""Auto-Segmentation (ASG) criterion (TPU-native).

Capability parity with /root/reference/criterions/asg.py: a learned dense
``(N+1) x N`` transition matrix (row 0 = start scores), loss = logadd over
all paths through ``intersect(emissions, transitions)`` minus the
force-aligned score through the target chain (asg.py:111-115), replabel
packing (asg.py:13-49) and optional garbage-token interleaving
(asg.py:203-208).  The two per-sample GTN graph intersections collapse into
two batched lattice scans (ops.lattice.asg_fcc_score / asg_fal_score); the
transition-matrix gradient — which GTN extracts from the transition graph's
arc gradients (asg.py:164-168) — falls out of JAX AD.
"""

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lattice
from .common import pad_targets


def pack_replabels(tokens, num_replabels):
    """Replace up-to-``num_replabels`` consecutive repeats with repeat labels.

    Repeat label k-1 (k in 1..num_replabels) encodes "repeat previous token k
    times"; real tokens are shifted up by num_replabels.  Mirrors
    asg.py:13-32 exactly (including multi-level list handling).
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


class ASG(nn.Module):
    """ASG loss with learned transitions.

    Attributes mirror asg.py:191-199: output width N = num_classes +
    num_replabels + use_garbage; the garbage token (last index) is
    interleaved between target labels when enabled.
    """

    num_classes: int
    num_replabels: int = 1
    use_garbage: bool = True

    @property
    def N(self):
        return self.num_classes + self.num_replabels + int(self.use_garbage)

    @property
    def garbage_idx(self):
        return (
            self.num_classes + self.num_replabels if self.use_garbage else None
        )

    def setup(self):
        assert self.num_replabels > 0
        self.transitions = self.param(
            "transitions", nn.initializers.zeros, (self.N + 1, self.N)
        )

    def prepare_targets(self, targets):
        """Host-side target transform: replabel packing + garbage interleave.

        Returns (padded [B, L], lengths [B]).
        """
        packed = [pack_replabels(list(np.asarray(t)), self.num_replabels) for t in targets]
        if self.garbage_idx is not None:
            out = []
            for tgt in packed:
                g = [self.garbage_idx] * (len(tgt) * 2 + 1)
                g[1::2] = tgt
                out.append(g)
            packed = out
        return pad_targets(packed)

    def __call__(self, inputs, targets, target_lengths=None, input_lengths=None):
        """Mean ASG loss.  ``targets`` may be ragged (host transform applied)
        or already prepared padded arrays (with target_lengths given)."""
        if target_lengths is None:
            targets, target_lengths = self.prepare_targets(targets)
        return lattice.asg_loss(
            inputs,
            self.transitions,
            targets,
            target_lengths,
            "mean",
            input_lengths,
        )

    def viterbi_device(self, outputs, input_lengths=None):
        """Jittable part of decoding: best path through the transition graph."""
        return lattice.asg_viterbi(outputs, self.transitions, input_lengths)

    def decode_paths(self, paths, input_lengths=None):
        """Host-side cleanup of device Viterbi paths (asg.py:228-234):
        collapse repeats, strip garbage, unpack replabels."""
        paths = np.asarray(paths)
        out = []
        for b, path in enumerate(paths):
            if input_lengths is not None:
                path = path[: int(input_lengths[b])]
            collapsed = [int(p) for i, p in enumerate(path) if i == 0 or p != path[i - 1]]
            if self.garbage_idx is not None:
                collapsed = [p for p in collapsed if p != self.garbage_idx]
            out.append(
                np.asarray(
                    unpack_replabels(collapsed, self.num_replabels), dtype=np.int32
                )
            )
        return out


def asg_viterbi_decode(module: ASG, variables, outputs, input_lengths=None):
    """Full decode: device tropical scan + host cleanup."""
    paths, _ = module.apply(
        variables, outputs, input_lengths, method=ASG.viterbi_device
    )
    return module.decode_paths(paths, input_lengths)
