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

        # ---- decomposition probes (VERDICT r3 #6) ----
        # (a) cross-process gradient allreduce alone: psum of a
        # param-shaped pytree over the global 'data' axis — the exact
        # collective the replicated-param step performs.
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as _P
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        grad_like = jax.tree_util.tree_map(jnp.ones_like, p)
        grad_bytes = sum(
            a.size * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(grad_like)
        )

        def _time_psum(tree, n):
            fn = jax.jit(shard_map(
                lambda t: jax.tree_util.tree_map(
                    lambda a: jax.lax.psum(a, "data"), t),
                mesh=mesh, in_specs=_P(), out_specs=_P(),
            ))
            r = fn(tree)
            jax.block_until_ready(r)
            start = time.perf_counter()
            for _ in range(n):
                r = fn(tree)
            jax.block_until_ready(r)
            return (time.perf_counter() - start) / n

        n = max(iters, 10)
        allreduce_s = _time_psum(grad_like, n)           # the real shape
        # discriminators: one flat buffer of the same bytes (is the cost
        # leaf fragmentation?) and a scalar (per-collective floor)
        flat = jnp.ones((grad_bytes // 4,), jnp.float32)
        allreduce_flat_s = _time_psum(flat, n)
        allreduce_scalar_s = _time_psum(jnp.float32(1.0), n)
        # bf16 compression leg: same tree at half the bytes
        half = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), grad_like)
        allreduce_bf16_s = _time_psum(half, n)

        # (b) per-step global-array assembly (host data plumbing)
        start = time.perf_counter()
        for _ in range(max(iters, 10)):
            xa = pmesh.global_batch_from_local(x_global[sl], mesh)
        jax.block_until_ready(xa)
        assembly_s = (time.perf_counter() - start) / max(iters, 10)

    # (c) compute-only reference: the SAME per-process work on a LOCAL
    # mesh (no cross-process collectives) — on shared physical cores
    # this isolates pure oversubscription from boundary cost.
    local_devs = jax.local_devices()
    lstep, lparams, lx, lprep, _ = _flagship_step(
        local_batch, len(local_devs)
    )
    lmesh = pmesh.make_mesh(local_devs)
    with lmesh:
        lp = pmesh.replicate(lparams, lmesh)
        lxs = pmesh.shard_batch(lx, lmesh)
        lpr = pmesh.shard_pytree_batch(lprep, lmesh)
        for _ in range(3):
            lp, lloss, _ = lstep(lp, lxs, lpr, key, 1.0)
        jax.block_until_ready(lloss)
        start = time.perf_counter()
        for _ in range(iters):
            lp, lloss, _ = lstep(lp, lxs, lpr, key, 1.0)
        jax.block_until_ready(lloss)
        local_s = (time.perf_counter() - start) / iters

    with open(outfile, "w") as fid:
        json.dump({
            "pid": pid, "step_s": sec, "global_batch": Bg,
            "allreduce_s": allreduce_s, "assembly_s": assembly_s,
            "allreduce_flat_s": allreduce_flat_s,
            "allreduce_scalar_s": allreduce_scalar_s,
            "allreduce_bf16_s": allreduce_bf16_s,
            "local_step_s": local_s, "grad_bytes": grad_bytes,
        }, fid)


if __name__ == "__main__":
    main()
