"""Real multi-HOST training-path test: a 2-process x 4-device CPU cluster
(jax.distributed + gloo collectives) runs 3 train steps through the same
helpers train.py uses (global_batch_from_local, global_pytree_from_local,
local_rows, Meters.sync), and the per-step losses must match a
single-process oracle computing the identical global batch.

This is the coverage the virtual single-process mesh cannot provide: the
batch really is assembled from per-host shards, the metric decode really
runs on local rows only, and the meter sync really crosses processes.
"""

import pytest

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


pytestmark = pytest.mark.slow  # spawns real multi-process gloo clusters


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid, nprocs, port, outfile):
    env = dict(os.environ)
    ndev = 8 // nprocs  # same 8-device global mesh at any process count
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + ":/root/.axon_site"
    )
    return subprocess.Popen(
        [sys.executable, _WORKER, str(pid), str(nprocs), str(port), outfile],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    procs = [_spawn(i, 2, port, outs[i]) for i in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = []
    for path in outs:
        with open(path) as fh:
            results.append(json.load(fh))

    # topology: 2 hosts x 4 devices = 8 global devices
    for r in results:
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
    # replicated loss + synced meters agree across hosts
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"])
    assert results[0]["num_samples"] == results[1]["num_samples"] == 8
    assert results[0]["cer"] == results[1]["cer"]

    # single-process oracle on the identical global batch
    oracle = _single_process_oracle()
    np.testing.assert_allclose(
        results[0]["losses"], oracle, rtol=1e-5, atol=1e-6
    )


def test_four_process_cluster_matches_single_process(tmp_path):
    """The BASELINE.md >= 2 hosts north star at double the host count:
    4 processes x 2 devices assemble the same 8-device global mesh and
    must reproduce the single-process losses exactly."""
    port = _free_port()
    outs = [str(tmp_path / f"rank{i}.json") for i in range(4)]
    procs = [_spawn(i, 4, port, outs[i]) for i in range(4)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = []
    for path in outs:
        with open(path) as fh:
            results.append(json.load(fh))

    for r in results:
        assert r["local_devices"] == 2
        assert r["global_devices"] == 8
    for r in results[1:]:
        np.testing.assert_allclose(results[0]["losses"], r["losses"])
        assert r["cer"] == results[0]["cer"]
    oracle = _single_process_oracle()
    np.testing.assert_allclose(
        results[0]["losses"], oracle, rtol=1e-5, atol=1e-6
    )


def _single_process_oracle():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions import CTC
    from gtn_applications_tpu.parallel import mesh as pmesh
    from gtn_applications_tpu.train import make_train_step

    B, T, F, C = 8, 12, 8, 5
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, F).astype(np.float32)
    tgt = [list(rng.randint(0, C, size=3)) for _ in range(B)]

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, inputs, train=False):
            h = nn.relu(nn.Dense(16)(inputs))
            return nn.Dense(C + 1)(h)

    model = Enc()
    criterion = CTC(blank=C)
    params = {
        "model": model.init(jax.random.PRNGKey(1), jnp.asarray(x[:1])),
        "criterion": criterion.init_params(),
    }
    step = make_train_step(model, criterion, 0.05, 0.05, max_grad_norm=5.0)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    losses = []
    with mesh:
        params = pmesh.replicate(params, mesh)
        for it in range(3):
            xs = pmesh.shard_batch(x, mesh)
            prepared = pmesh.shard_pytree_batch(criterion.prepare(tgt), mesh)
            params, loss, _ = step(
                params, xs, prepared, jax.random.PRNGKey(10 + it), 1.0
            )
            losses.append(float(loss))
    return losses
