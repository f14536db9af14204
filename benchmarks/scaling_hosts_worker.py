"""Worker for the multi-host scaling-efficiency measurement.

Launched by scaling_benchmark.py --hosts: N processes, each given
8 // N virtual CPU devices (XLA_FLAGS set by the parent), rendezvous via
jax.distributed, assemble the SAME global batch the single-process
measurement used (each process contributes its local rows through
parallel.mesh.global_batch_from_local), and time the jitted flagship
train step.  Per-rank mean step seconds are written as JSON.

Usage: python scaling_hosts_worker.py <pid> <nprocs> <port> <outfile>
       [local_batch] [iters]
"""

import json
import sys
import time


def main():
    pid, nprocs, port, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )
    local_batch = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    iters = int(sys.argv[6]) if len(sys.argv) > 6 else 5

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    import numpy as np

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/benchmarks")
    from scaling_benchmark import _flagship_step

    from gtn_applications_tpu.parallel import mesh as pmesh

    # identical global data/shapes to the 1-process measurement
    n_total = nprocs * jax.local_device_count()
    step, params, x_global, prep_global, Bg = _flagship_step(
        local_batch, n_total
    )
    mesh = pmesh.make_mesh()
    with mesh:
        p = pmesh.replicate(params, mesh)
        B_local = Bg // nprocs
        sl = slice(pid * B_local, (pid + 1) * B_local)
        xs = pmesh.global_batch_from_local(x_global[sl], mesh)
        prep = jax.tree_util.tree_map(
            lambda a: pmesh.global_batch_from_local(np.asarray(a)[sl], mesh)
            if hasattr(a, "shape") and getattr(a, "shape", ())
            and a.shape[0] == Bg else a,
            prep_global,
        )
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            p, loss, _ = step(p, xs, prep, key, 1.0)
        jax.block_until_ready(loss)
        start = time.perf_counter()
        for _ in range(iters):
            p, loss, _ = step(p, xs, prep, key, 1.0)
        jax.block_until_ready(loss)
        sec = (time.perf_counter() - start) / iters

    with open(outfile, "w") as fid:
        json.dump({"pid": pid, "step_s": sec, "global_batch": Bg}, fid)


if __name__ == "__main__":
    main()
