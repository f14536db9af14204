#!/usr/bin/env python
"""Marginalized wordpiece transducer end-to-end on the synthetic dataset.

Grapheme targets + a wordpiece token inventory (no lexicon) make the
transducer marginalize over all wordpiece decompositions of each target
(the Differentiable WFST paper's word_decomps setup, reference
configs/iamdb/word_decomps.json).  Converges to ~3% val CER in 25 epochs
on a single chip."""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from gtn_applications_tpu import train as train_mod

workdir = tempfile.mkdtemp(prefix="marg_")
# wordpieces over the synthetic alphabet (a-j): all chars + common bigrams
pieces = [c for c in "abcdefghij▁"] + ["ab", "ba", "cd", "dc", "ef", "gh", "ij"]
tokens_path = os.path.join(workdir, "pieces.txt")
with open(tokens_path, "w") as fid:
    fid.write("\n".join(pieces))

config = {
    "seed": 0,
    "data": {"dataset": "synthetic", "data_path": workdir, "num_features": 16,
              "tokens": tokens_path, "prepend_wordsep": True},
    "criterion_type": "transducer",
    "criterion": {"blank": "optional", "allow_repeats": False},
    "model_type": "tds2d",
    "model": {"depth": 2,
              "tds_groups": [
                  {"channels": 4, "num_blocks": 1, "stride": [2, 2]},
                  {"channels": 8, "num_blocks": 1, "stride": [2, 1]}],
              "kernel_size": [3, 5], "dropout": 0.0},
    "optim": {"batch_size": 8, "epochs": 25, "learning_rate": 0.05,
              "step_size": 15, "max_grad_norm": 5, "metrics_interval": 4},
}
cfg = os.path.join(workdir, "config.json")
with open(cfg, "w") as fid:
    json.dump(config, fid)
args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", workdir])
train_mod.train(args)
