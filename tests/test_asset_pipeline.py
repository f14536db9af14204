"""Full offline-asset pipeline integration: wordpiece induction -> lexicon
-> token/lexicon training config, and train text -> pruned backoff
transition graph -> transducer training (the scripts/iamdb_transitions.sh
flow on the synthetic dataset)."""

import pytest
import json
import os
import tempfile


from gtn_applications_tpu import wfst
from gtn_applications_tpu.datasets import synthetic
from gtn_applications_tpu.scripts import build_transitions as bt
from gtn_applications_tpu.scripts import wordpiece
from gtn_applications_tpu.scripts.make_wordpieces import save_pieces


def _train_texts():
    pre = synthetic.Preprocessor("/tmp", num_features=16)
    ds = synthetic.Dataset("/tmp", pre, split="train")
    return ds.texts, pre


def test_wordpiece_assets_then_training():
    texts, _ = _train_texts()
    model = wordpiece.train_unigram(texts, vocab_size=40, em_iters=1)
    with tempfile.TemporaryDirectory() as d:
        vocab = sorted(set(w for t in texts for w in t.split("▁") if w))
        save_pieces(model, 40, os.path.join(d, "wp"), vocab)
        tokens_path = os.path.join(d, "wp_tokens_40.txt")
        lex_path = os.path.join(d, "wp_lex_40.txt")
        assert os.path.exists(tokens_path) and os.path.exists(lex_path)

        # train one epoch with the generated token/lexicon assets (the
        # word_pieces.json setup: fixed decomposition, CTC)
        config = {
            "seed": 0,
            "data": {
                "dataset": "synthetic",
                "data_path": d,
                "num_features": 16,
                "tokens": tokens_path,
                "lexicon": lex_path,
            },
            "model_type": "tds2d",
            "model": {
                "depth": 2,
                "tds_groups": [{"channels": 4, "num_blocks": 1, "stride": [2, 2]}],
                "kernel_size": [3, 3],
                "dropout": 0.0,
            },
            "criterion_type": "ctc",
            "optim": {
                "batch_size": 8,
                "epochs": 1,
                "learning_rate": 0.02,
                "step_size": 10,
                "max_grad_norm": 5,
            },
        }
        cfg = os.path.join(d, "config.json")
        with open(cfg, "w") as fid:
            json.dump(config, fid)
        from gtn_applications_tpu import train as train_mod

        args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", d])
        train_mod.train(args)
        assert os.path.exists(os.path.join(d, "model.checkpoint"))


@pytest.mark.slow  # offline pipeline + inline training
def test_pruned_transitions_then_transducer():
    texts, pre = _train_texts()
    tokens = pre.graphemes
    tokens_to_idx = {t: i for i, t in enumerate(tokens)}

    # bigram counts -> prune -> optional blanks -> backoff graph
    lines = [[c for c in t] for t in texts]
    counts = bt.count_ngrams(lines, 2, tokens_to_idx)
    pruned = bt.prune_ngrams(counts, [0, 2])
    pruned = bt.add_blank_grams(pruned, len(tokens), "optional")
    graph = bt.build_graph(pruned)
    assert graph.num_arcs() > 0

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "transitions.bin")
        wfst.save(path, graph)

        config = {
            "seed": 0,
            "data": {"dataset": "synthetic", "data_path": d, "num_features": 16},
            "criterion_type": "transducer",
            "criterion": {
                "blank": "optional",
                "allow_repeats": False,
                "transitions": path,
            },
            "model_type": "tds2d",
            "model": {
                "depth": 2,
                "tds_groups": [{"channels": 4, "num_blocks": 1, "stride": [2, 2]}],
                "kernel_size": [3, 3],
                "dropout": 0.0,
            },
            "optim": {
                "batch_size": 8,
                "epochs": 1,
                "learning_rate": 0.02,
                "crit_learning_rate": 0.02,
                "step_size": 10,
                "max_grad_norm": 5,
                "metrics_interval": 8,
            },
        }
        cfg = os.path.join(d, "config.json")
        with open(cfg, "w") as fid:
            json.dump(config, fid)
        from gtn_applications_tpu import train as train_mod

        args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", d])
        train_mod.train(args)
        assert os.path.exists(os.path.join(d, "model.checkpoint"))
