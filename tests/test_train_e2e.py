"""End-to-end driver smoke tests on the synthetic dataset: the real train()
loop for two epochs on the 8-device virtual CPU mesh, then evaluation."""

import json
import os
import tempfile

import numpy as np
import pytest


def _write_config(tmpdir, epochs=2, criterion="ctc"):
    config = {
        "seed": 0,
        "data": {"dataset": "synthetic", "data_path": tmpdir, "num_features": 16},
        "model_type": "tds2d",
        "model": {
            "depth": 2,
            "tds_groups": [
                {"channels": 4, "num_blocks": 1, "stride": [2, 2]},
                {"channels": 8, "num_blocks": 1, "stride": [2, 1]},
            ],
            "kernel_size": [3, 5],
            "dropout": 0.0,
        },
        "criterion_type": criterion,
        "optim": {
            "batch_size": 8,
            "epochs": epochs,
            "learning_rate": 0.02,
            "step_size": 40,
            "max_grad_norm": 5,
        },
    }
    path = os.path.join(tmpdir, "config.json")
    with open(path, "w") as fid:
        json.dump(config, fid)
    return path


def test_train_and_eval_ctc():
    from gtn_applications_tpu import test as test_mod
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    cfg = _write_config(tmpdir)
    args = train_mod.parse_args(
        ["--config", cfg, "--checkpoint_path", tmpdir]
    )
    params = train_mod.train(args)
    assert os.path.exists(os.path.join(tmpdir, "model.checkpoint"))
    assert os.path.exists(os.path.join(tmpdir, "model.checkpoint.best"))

    targs = test_mod.parse_args(
        ["--config", cfg, "--checkpoint_path", tmpdir, "--split", "test"]
    )
    meters = test_mod.run_test(targs)
    assert meters.num_samples == 16
    assert np.isfinite(meters.avg_loss)


@pytest.mark.parametrize("criterion", ["asg", "stc", "transducer"])
@pytest.mark.slow  # inline driver training
def test_train_other_criteria(criterion):
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    cfg = _write_config(tmpdir, epochs=1, criterion=criterion)
    if criterion == "transducer":
        with open(cfg) as fid:
            config = json.load(fid)
        config["criterion"] = {"blank": "optional", "allow_repeats": False}
        with open(cfg, "w") as fid:
            json.dump(config, fid)
    args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
    train_mod.train(args)
    assert os.path.exists(os.path.join(tmpdir, "model.checkpoint"))


@pytest.mark.slow  # inline driver training
def test_train_ctc_assoc_impl():
    """The long-context associative-scan lattice (impl='assoc' with the
    memory-bounded chunk-transfer form — ops/lattice.py
    ctc_forward_score_assoc(chunk=...)) trains end-to-end from the SHIPPED
    recipe configs/synthetic/long_ctx_assoc.json: T >= 4096 lattice frames
    on the ('data', 'seq') mesh, the time axis sharded 4-way, all selected
    purely by config keys (criterion.chunk, optim.seq_parallel)."""
    import jax

    from gtn_applications_tpu import train as train_mod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "configs/synthetic/long_ctx_assoc.json")) as fid:
        config = json.load(fid)

    tmpdir = tempfile.mkdtemp()
    config["data"]["data_path"] = tmpdir
    config["optim"]["epochs"] = 1
    cfg = os.path.join(tmpdir, "config.json")
    with open(cfg, "w") as fid:
        json.dump(config, fid)

    # the shipped recipe must actually select the chunked assoc lattice
    # and a (data, seq) mesh — the knobs this config exists to exercise
    _, _, criterion, model, _ = train_mod.load_experiment(config)
    assert criterion.impl == "assoc" and criterion.chunk == 256
    mesh = train_mod.make_mesh(config["optim"]["seq_parallel"])
    if len(jax.devices()) >= 8:
        assert mesh.axis_names == ("data", "seq")
        assert mesh.devices.shape[1] == 4

    # and the data really is long-context: >= 4096 encoder frames (the
    # tds_groups use time stride 1, so lattice T == image width)
    from gtn_applications_tpu.datasets import synthetic_long

    pre = synthetic_long.Preprocessor(tmpdir, num_features=16)
    ds = synthetic_long.Dataset(tmpdir, pre, split="train")
    assert min(w for (w, h), _ in ds.sample_sizes()) >= 4096

    args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
    train_mod.train(args)
    assert os.path.exists(os.path.join(tmpdir, "model.checkpoint"))


def test_train_loss_decreases():
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    cfg = _write_config(tmpdir, epochs=5)
    args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])

    # capture epoch losses via the logger
    import logging

    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = H()
    logging.getLogger().addHandler(h)
    try:
        train_mod.train(args)
    finally:
        logging.getLogger().removeHandler(h)
    losses = []
    for msg in records:
        if "complete" in msg and "Loss" in msg:
            part = msg.split("Loss ")[1]
            losses.append(float(part.split(",")[0]))
    assert len(losses) == 5
    assert losses[-1] < losses[0], losses


def test_train_audio_pipeline():
    """Speech path end-to-end: synthetic tones -> mel -> TDS -> CTC."""
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    config = {
        "seed": 0,
        "data": {
            "dataset": "synthetic_audio",
            "data_path": tmpdir,
            "num_features": 40,
        },
        "model_type": "tds",
        "model": {
            "tds_groups": [{"channels": 2, "num_blocks": 1, "stride": 2}],
            "kernel_size": 5,
            "dropout": 0.0,
        },
        "criterion_type": "ctc",
        "optim": {
            "batch_size": 8,
            "epochs": 1,
            "learning_rate": 0.05,
            "step_size": 40,
            "max_grad_norm": 5,
        },
    }
    cfg = os.path.join(tmpdir, "config.json")
    with open(cfg, "w") as fid:
        json.dump(config, fid)
    args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
    train_mod.train(args)
    assert os.path.exists(os.path.join(tmpdir, "model.checkpoint"))


@pytest.mark.slow  # inline driver training
def test_train_with_input_lengths():
    """use_input_lengths masks padded frames out of the lattice."""
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    cfg = _write_config(tmpdir, epochs=1)
    with open(cfg) as fid:
        config = json.load(fid)
    config["optim"]["use_input_lengths"] = True
    with open(cfg, "w") as fid:
        json.dump(config, fid)
    args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
    train_mod.train(args)
    assert os.path.exists(os.path.join(tmpdir, "model.checkpoint"))


@pytest.mark.slow  # two full driver runs back to back
def test_restore_continues_training():
    from gtn_applications_tpu import train as train_mod

    tmpdir = tempfile.mkdtemp()
    cfg = _write_config(tmpdir, epochs=1)
    args = train_mod.parse_args(["--config", cfg, "--checkpoint_path", tmpdir])
    train_mod.train(args)

    # continue for a second epoch from the checkpoint
    cfg2 = _write_config(tmpdir, epochs=2)
    args2 = train_mod.parse_args(
        [
            "--config", cfg2, "--checkpoint_path", tmpdir,
            "--restore", "--last_epoch", "1",
        ]
    )
    train_mod.train(args2)
    import pickle

    with open(os.path.join(tmpdir, "model.checkpoint"), "rb") as fid:
        state = pickle.load(fid)
    assert state["epoch"] == 1
    assert state["num_updates"] == 16  # 8 batches/epoch x 2 epochs
