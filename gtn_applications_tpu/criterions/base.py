"""Criterion protocol: host target preparation + pure jittable loss.

Every criterion (CTC / ASG / STC / Transducer) follows the same split,
which is the TPU-native inversion of the reference's per-sample GTN graph
building inside autograd Functions (SURVEY.md §7):

  * ``prepare(targets)``  — host-side: ragged targets -> padded arrays or
    compiled arc tables (shape-bucketed so jit sees few distinct shapes).
  * ``loss(params, inputs, prepared, input_lengths)`` — pure, jittable,
    differentiable in ``params`` and ``inputs``.
  * ``init_params()`` — learnable parameter pytree ({} when stateless).
  * ``viterbi(outputs, params)`` — decoding: device scans + host cleanup,
    returning ragged int32 numpy arrays.

A criterion instance is also callable with stored parameters
(``crit(inputs, targets)``) for parity with the reference's module API.
"""


class Criterion:
    """Base class; subclasses implement the four methods above."""

    def init_params(self):
        return {}

    def prepare(self, targets):
        raise NotImplementedError

    def loss(self, params, inputs, prepared, input_lengths=None):
        raise NotImplementedError

    def viterbi(self, outputs, params=None, input_lengths=None):
        raise NotImplementedError

    # -- two-phase decode ----------------------------------------------
    # JAX dispatch is asynchronous: the expensive part of decoding is not
    # the device scan but the host readback, which blocks until the device
    # queue drains.  Eval loops call viterbi_dispatch for batch i+1 before
    # viterbi_finalize for batch i so readback overlaps device compute.
    def viterbi_dispatch(self, outputs, params=None, input_lengths=None):
        """Launch the device portion of decoding without blocking.  The
        default defers everything to finalize (criteria with a device
        scan override this to enqueue it here)."""
        return (outputs, params, input_lengths)

    def viterbi_finalize(self, handle):
        outputs, params, input_lengths = handle
        return self.viterbi(outputs, params, input_lengths)

    # -- stateful convenience (reference nn.Module style) ---------------
    @property
    def params(self):
        if not hasattr(self, "_params"):
            self._params = self.init_params()
        return self._params

    @params.setter
    def params(self, value):
        self._params = value

    def __call__(self, inputs, targets, input_lengths=None):
        return self.loss(self.params, inputs, self.prepare(targets), input_lengths)
