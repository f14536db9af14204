"""Connectionist Temporal Classification criterion (TPU-native).

Capability parity with /root/reference/criterions/ctc.py: the reference
builds a 2L+1-state WFST per sample on CPU and scores it with GTN's C++
``intersect`` + ``forward_score`` under a thread pool (ctc.py:31-94).  Here
the lattice is a batched fixed-shape recursion on device
(ops.lattice.ctc_loss); gradients are the exact posterior marginals via JAX
AD.  The ``use_pt`` flag of the reference selects cuDNN CTC — both paths
compute the same value here, so the flag is accepted for config
compatibility and ignored.
"""

import jax
import numpy as np

from ..ops import lattice
from .base import Criterion
from .common import pad_targets


class CTC(Criterion):
    """CTC loss.

    Args:
      blank: index of the blank label (reference appends blank last:
        utils.py:256 output_size = num_tokens + 1).
      use_pt: accepted for config compatibility (reference ctc.py:101-104);
        the TPU path is used regardless.
      chunk: chunk size for impl='assoc' / impl='chunked'.  For 'assoc'
        this selects the chunk-transfer form (dense [S, S] operators
        materialize per chunk, not per frame — O(T/chunk·S²) memory), which
        is what makes T >= 4k sequence-sharded runs fit; without it the
        assoc scan keeps per-frame operators (O(T·S²)).
    """

    def __init__(self, blank, use_pt=True, impl="auto", chunk=None):
        self.blank = blank
        self.use_pt = use_pt
        # 'assoc' selects the associative-scan lattice (sequence-sharding
        # form for long-context runs where T is sharded across the mesh)
        self.impl = impl
        self.chunk = chunk

    def prepare(self, targets):
        return pad_targets(targets)

    def loss(self, params, inputs, prepared, input_lengths=None):
        targets, target_lengths = prepared
        log_probs = jax.nn.log_softmax(inputs, axis=2)
        return lattice.ctc_loss(
            log_probs, targets, target_lengths, self.blank, "mean",
            input_lengths, self.impl, self.chunk,
        )

    def viterbi_dispatch(self, outputs, params=None, input_lengths=None):
        return (lattice.ctc_greedy_decode(outputs), input_lengths)

    def viterbi_finalize(self, handle):
        preds_dev, input_lengths = handle
        return self._collapse(np.asarray(preds_dev), input_lengths)

    def viterbi(self, outputs, params=None, input_lengths=None):
        """Greedy best-path decode with repeat/blank collapse
        (ctc.py:126-135).  Returns a list of 1-D int32 numpy arrays.

        The collapse is vectorized over the whole batch (one boolean mask
        pass) instead of per-sample Python loops."""
        return self.viterbi_finalize(
            self.viterbi_dispatch(outputs, params, input_lengths)
        )

    def _collapse(self, preds, input_lengths):
        B, T = preds.shape
        keep = np.ones((B, T), dtype=bool)
        keep[:, 1:] = preds[:, 1:] != preds[:, :-1]
        keep &= preds != self.blank
        if input_lengths is not None:
            lens = np.asarray(input_lengths)
            keep &= np.arange(T)[None, :] < lens[:, None]
        return [preds[b, keep[b]].astype(np.int32) for b in range(B)]
