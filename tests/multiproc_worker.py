"""Worker for the 2-process x 4-device CPU cluster test.

Run by tests/test_multiprocess.py in two subprocesses that rendezvous via
jax.distributed (gloo CPU collectives).  Each process plays one "host" of
a multi-host mesh: it feeds only its local shard of the global batch
through the real train-path helpers (train.shard_batch ->
global_batch_from_local, train.shard_prepared, pmesh.local_rows,
Meters.sync) so the multi-host wiring the single-process suite cannot
reach is executed for real.  Results are written as JSON for the parent
test to compare across ranks and against a single-process oracle.

Usage: python multiproc_worker.py <pid> <nprocs> <port> <outfile>
"""

import json
import sys


def main():
    pid, nprocs, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from gtn_applications_tpu import utils
    from gtn_applications_tpu.criterions import CTC
    from gtn_applications_tpu.parallel import mesh as pmesh
    from gtn_applications_tpu.train import (
        make_train_step,
        shard_batch,
        shard_prepared,
    )

    assert jax.process_count() == nprocs
    local_dev = jax.local_device_count()
    mesh = pmesh.make_mesh()

    # deterministic global data; every process slices out its own rows
    B_global, T, F, C = 8, 12, 8, 5
    rng = np.random.RandomState(0)
    x_global = rng.randn(B_global, T, F).astype(np.float32)
    tgt_global = [list(rng.randint(0, C, size=3)) for _ in range(B_global)]
    B_local = B_global // nprocs
    sl = slice(pid * B_local, (pid + 1) * B_local)
    x_local, tgt_local = x_global[sl], tgt_global[sl]

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, inputs, train=False):
            h = nn.relu(nn.Dense(16)(inputs))
            return nn.Dense(C + 1)(h)

    model = Enc()
    criterion = CTC(blank=C)
    params = {
        "model": model.init(jax.random.PRNGKey(1), jnp.asarray(x_local[:1])),
        "criterion": criterion.init_params(),
    }
    step = make_train_step(model, criterion, 0.05, 0.05, max_grad_norm=5.0)

    losses = []
    with mesh:
        params = pmesh.replicate(params, mesh)
        for it in range(3):
            xs = shard_batch(x_local, mesh)
            prepared = shard_prepared(
                criterion.prepare(tgt_local), mesh, B_local
            )
            params, loss, outputs = step(
                params, xs, prepared, jax.random.PRNGKey(10 + it), 1.0
            )
            losses.append(float(loss))
        # multi-host metric path: decode ONLY the local rows, sync counts
        local_out = pmesh.local_rows(outputs)
        assert local_out.shape[0] == B_local, local_out.shape
        preds = criterion.viterbi(jnp.asarray(local_out))
        meters = utils.Meters()
        meters.num_samples += B_local
        td, wd, nt, nw = utils.compute_edit_distance(
            preds, tgt_local, _IdPreproc()
        )
        meters.edit_distance_tokens += td
        meters.num_tokens += nt
        meters.edit_distance_words += wd
        meters.num_words += nw
        meters.sync()

    with open(outfile, "w") as fh:
        json.dump(
            {
                "pid": pid,
                "local_devices": local_dev,
                "global_devices": jax.device_count(),
                "losses": losses,
                "num_samples": meters.num_samples,
                "cer": meters.cer,
            },
            fh,
        )


class _IdPreproc:
    """Identity preprocessor: tokens are their own text."""

    wordsep = " "

    def to_text(self, tokens):
        return " ".join(str(int(t)) for t in tokens)

    def tokens_to_text(self, tokens):
        return " ".join(str(int(t)) for t in tokens)


if __name__ == "__main__":
    main()
