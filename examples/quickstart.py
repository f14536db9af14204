#!/usr/bin/env python
"""End-to-end quickstart (the framework's counterpart of the reference's
IAM Colab notebook, runnable without any downloads).

Trains the TDS2d + CTC pipeline on the synthetic glyph dataset, evaluates,
and decodes a few samples.  Swap the config for configs/iamdb/tds2d.json
(after downloading IAM with datasets/download/iamdb.sh) to reproduce the
notebook's handwriting run.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from gtn_applications_tpu import test as test_mod
from gtn_applications_tpu import train as train_mod


CONFIG = {
    "seed": 0,
    "data": {"dataset": "synthetic", "data_path": "/tmp", "num_features": 16},
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
    "criterion_type": "ctc",
    "optim": {
        "batch_size": 8,
        "epochs": 30,
        "learning_rate": 0.02,
        "step_size": 20,
        "max_grad_norm": 5,
        "metrics_interval": 4,
    },
}


def main():
    if "--cpu" in sys.argv:
        # escape hatch for hosts whose TPU attachment is flaky: the axon
        # stack pins JAX_PLATFORMS, so this must be a config update, not
        # an env var
        import jax

        jax.config.update("jax_platforms", "cpu")
    workdir = tempfile.mkdtemp(prefix="quickstart_")
    config_path = os.path.join(workdir, "config.json")
    with open(config_path, "w") as fid:
        json.dump(CONFIG, fid)

    print(f"Training into {workdir} ...")
    args = train_mod.parse_args(["--config", config_path, "--checkpoint_path", workdir])
    train_mod.train(args)

    print("Evaluating the best checkpoint on the test split ...")
    targs = test_mod.parse_args(
        ["--config", config_path, "--checkpoint_path", workdir, "--split", "test"]
    )
    test_mod.run_test(targs)


if __name__ == "__main__":
    main()
