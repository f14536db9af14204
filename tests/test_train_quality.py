"""Synthetic quality bar: the transducer criteria must actually LEARN the
glyph task, not just move the loss (VERDICT r1 item 8).

Both recipes train the real driver to convergence on the synthetic
dataset and assert CER thresholds.  Everything is seeded (data, params,
dropout off) and runs on the deterministic CPU mesh, so the measured
values are reproducible; thresholds carry ~2x margin over the values
measured at authoring time (in comments below).

* marginalized transducer: wordpiece tokens with NO lexicon +
  prepend_wordsep, so the lexicon graph sums over all decompositions
  (the reference's word_decomps.json setup, SURVEY.md §2 note).
* ngram transducer: bigram backoff transitions built by the offline
  pipeline (scripts/build_transitions.py) with learnable arc weights.
"""

import json
import logging
import os
import tempfile

import pytest

pytestmark = pytest.mark.slow  # inline training to convergence (~minutes)

_MODEL = {
    "depth": 2,
    "tds_groups": [
        {"channels": 4, "num_blocks": 1, "stride": [2, 2]},
        {"channels": 8, "num_blocks": 1, "stride": [2, 1]},
    ],
    "kernel_size": [3, 5],
    "dropout": 0.0,
}


def _train_and_eval(tmpdir, data, criterion, lr, epochs, step_size):
    """Run the real train loop, return (last train CER, test CER)."""
    from gtn_applications_tpu import test as test_mod
    from gtn_applications_tpu import train as train_mod

    config = {
        "seed": 0,
        "data": dict(
            {"dataset": "synthetic", "data_path": tmpdir, "num_features": 16},
            **data,
        ),
        "model_type": "tds2d",
        "model": _MODEL,
        "criterion_type": "transducer",
        "criterion": criterion,
        "optim": {
            "batch_size": 8,
            "epochs": epochs,
            "learning_rate": lr,
            "crit_learning_rate": 0.01,
            "step_size": step_size,
            "max_grad_norm": 5,
        },
    }
    cfg = os.path.join(tmpdir, "config.json")
    with open(cfg, "w") as fid:
        json.dump(config, fid)

    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = H()
    logging.getLogger().addHandler(h)
    try:
        args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
        train_mod.train(args)
    finally:
        logging.getLogger().removeHandler(h)
    train_cers = [
        float(m.split("CER ")[1].split(",")[0])
        for m in records
        if "complete" in m and "CER" in m
    ]
    targs = test_mod.parse_args(
        ["--config", cfg, "--checkpoint_path", tmpdir, "--split", "test"]
    )
    meters = test_mod.run_test(targs)
    return train_cers[-1], meters.cer


def test_marginalized_transducer_learns_glyphs():
    """Marginalized decompositions: near-zero train CER, generalizing.

    Measured at authoring: train CER 1.61, test CER 10.10 (the task's
    test floor is ~6 CER even for plain CTC at this model size —
    64 train samples with per-glyph noise).
    """
    tmpdir = tempfile.mkdtemp()
    alphabet = "abcdefghij"
    tokens = ["▁"] + list(alphabet) + ["▁" + c for c in alphabet]
    tokens += ["ab", "cd", "ef", "gh", "ij", "ba", "dc", "fe"]
    tokens_path = os.path.join(tmpdir, "tokens.txt")
    with open(tokens_path, "w") as fid:
        fid.write("\n".join(tokens) + "\n")

    train_cer, test_cer = _train_and_eval(
        tmpdir,
        data={"tokens": tokens_path, "prepend_wordsep": True},
        criterion={"blank": "optional", "allow_repeats": False},
        lr=0.05,
        epochs=40,
        step_size=40,
    )
    assert train_cer <= 4.0, train_cer
    assert test_cer <= 20.0, test_cer


def test_ngram_transducer_learns_glyphs():
    """Bigram-backoff transducer with learnable transition weights.

    Measured at authoring: train CER 3.90, test CER 9.09.
    """
    from gtn_applications_tpu import wfst
    from gtn_applications_tpu.datasets import synthetic
    from gtn_applications_tpu.scripts import build_transitions as bt

    tmpdir = tempfile.mkdtemp()
    pre = synthetic.Preprocessor(tmpdir, num_features=16)
    ds = synthetic.Dataset(tmpdir, pre, split="train")
    tokens_to_idx = {t: i for i, t in enumerate(pre.graphemes)}
    counts = bt.count_ngrams([[c for c in t] for t in ds.texts], 2, tokens_to_idx)
    pruned = bt.add_blank_grams(
        bt.prune_ngrams(counts, [0, 0]), len(pre.graphemes), "optional"
    )
    graph = bt.build_graph(pruned)
    transitions_path = os.path.join(tmpdir, "transitions.bin")
    wfst.save(transitions_path, graph)

    train_cer, test_cer = _train_and_eval(
        tmpdir,
        data={},
        criterion={
            "blank": "optional",
            "allow_repeats": False,
            "transitions": transitions_path,
        },
        lr=0.02,
        epochs=40,
        step_size=30,
    )
    assert train_cer <= 8.0, train_cer
    assert test_cer <= 20.0, test_cer


def test_asg_learns_glyphs():
    """ASG (learned transitions + replabels + garbage) to near-zero train CER.

    Measured at authoring: train CER 0.23, test CER 14.14.
    """
    from gtn_applications_tpu import test as test_mod
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    config = {
        "seed": 0,
        "data": {"dataset": "synthetic", "data_path": tmpdir, "num_features": 16},
        "model_type": "tds2d",
        "model": _MODEL,
        "criterion_type": "asg",
        "criterion": {"num_replabels": 1, "use_garbage": True},
        "optim": {
            "batch_size": 8,
            "epochs": 60,
            "learning_rate": 0.05,
            "crit_learning_rate": 0.05,
            "step_size": 60,
            "max_grad_norm": 5,
        },
    }
    cfg = os.path.join(tmpdir, "config.json")
    with open(cfg, "w") as fid:
        json.dump(config, fid)

    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = H()
    logging.getLogger().addHandler(h)
    try:
        args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
        train_mod.train(args)
    finally:
        logging.getLogger().removeHandler(h)
    train_cers = [
        float(m.split("CER ")[1].split(",")[0])
        for m in records
        if "complete" in m and "CER" in m
    ]
    targs = test_mod.parse_args(
        ["--config", cfg, "--checkpoint_path", tmpdir, "--split", "test"]
    )
    meters = test_mod.run_test(targs)
    assert train_cers[-1] <= 2.0, train_cers[-1]
    assert meters.cer <= 25.0, meters.cer
