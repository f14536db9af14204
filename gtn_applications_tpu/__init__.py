"""gtn_applications_tpu: a TPU-native differentiable WFST sequence framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
facebookresearch/gtn_applications (see SURVEY.md): CTC / ASG / STC and a
generic wordpiece Transducer criterion with marginalized decompositions, a
WFST convolution layer, RNN/TDS/TDS2d encoders, wordpiece vocabulary
induction, pruned n-gram / ARPA backoff transition graphs, and end-to-end
training on IAM / WSJ / LibriSpeech.
"""

__version__ = "0.1.0"
