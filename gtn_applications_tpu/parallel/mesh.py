"""Device mesh + sharding helpers (the framework's parallelism layer).

Replaces the reference's torch DDP/NCCL plumbing (train.py:135-208) with
the JAX SPMD model: one global ``Mesh`` over all chips/hosts, parameters
replicated, batch sharded along ``'data'``; XLA compiles the gradient
all-reduce onto ICI.  Scale-out beyond the reference (not present there):
the lattice time axis can additionally be sharded for very long sequences
since the log-semiring scan is associative — see ops.lattice.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_warned_indivisible = set()


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all devices (default)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def batch_spec(ndim, axis_name="data"):
    return P(axis_name, *([None] * (ndim - 1)))


def shard_batch(batch, mesh, axis_name="data"):
    """Shard the leading axis across the mesh; replicate if indivisible.

    The replicated fallback is correct (every device computes the whole
    batch; the psum averages identical gradients) but wastes ndev× the
    compute, so it warns once per offending batch size."""
    batch = np.asarray(batch) if not isinstance(batch, jnp.ndarray) else batch
    ndev = mesh.devices.size
    if batch.shape[0] % ndev == 0 and ndev > 1:
        return jax.device_put(
            batch, NamedSharding(mesh, batch_spec(batch.ndim, axis_name))
        )
    if ndev > 1 and batch.shape[0] % ndev != 0:
        key = (batch.shape[0], ndev)
        if key not in _warned_indivisible:
            _warned_indivisible.add(key)
            logging.warning(
                "Batch size %d not divisible by %d devices: replicating the "
                "batch (each device computes all samples — %dx wasted "
                "compute). Pick batch_size divisible by the device count.",
                batch.shape[0], ndev, ndev,
            )
    return jnp.asarray(batch)


def shard_batch_time(batch, mesh, time_axis):
    """Shard the leading axis along 'data' AND the time axis along 'seq'.

    The sequence-parallel input layout for long-context runs (SURVEY §5):
    the encoder convolutions and the chunk-transfer assoc lattice
    (ops.lattice.ctc_forward_score_assoc with a chunk) are local in time,
    so XLA keeps per-shard work on its own device and inserts halo/prefix
    collectives over the 'seq' axis.  Either axis falls back to
    replication when its extent is indivisible by the mesh dim (with the
    same one-shot warning as shard_batch)."""
    batch = np.asarray(batch) if not isinstance(batch, jnp.ndarray) else batch
    dims = dict(zip(mesh.axis_names, mesh.devices.shape))
    spec = [None] * batch.ndim
    if dims.get("data", 1) > 1 and batch.shape[0] % dims["data"] == 0:
        spec[0] = "data"
    if (
        dims.get("seq", 1) > 1
        and 0 < time_axis < batch.ndim
        and batch.shape[time_axis] % dims["seq"] == 0
    ):
        spec[time_axis] = "seq"
    for axis, name in ((0, "data"), (time_axis, "seq")):
        n = dims.get(name, 1)
        if n > 1 and spec[axis] is None:
            key = (batch.shape[axis], name, n)
            if key not in _warned_indivisible:
                _warned_indivisible.add(key)
                logging.warning(
                    "axis %d extent %d not divisible by %d '%s' shards: "
                    "replicating along that mesh axis",
                    axis, batch.shape[axis], n, name,
                )
    return jax.device_put(batch, NamedSharding(mesh, P(*spec)))


def shard_pytree_batch(tree, mesh, axis_name="data"):
    """Shard every array leaf of a prepared-targets pytree along axis 0
    (leaves whose leading dim is not divisible are replicated)."""
    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1:
            return shard_batch(x, mesh, axis_name)
        return x

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh):
    """Replicate a pytree onto the mesh with FRESH buffers.

    device_put to an equivalent sharding is zero-copy — the result aliases
    the input, so a donated train step (make_train_step donates params)
    would delete the caller's arrays with it.  Copy first; replicate runs
    once per training run, so the extra copy is free."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.array(a, copy=True), sharding), tree
    )


def global_batch_from_local(local_batch, mesh, axis_name="data"):
    """Assemble a globally-sharded array from per-process local batches.

    Multi-host replacement for BatchSortedSampler's rank dealing
    (reference utils.py:70-74): each host loads its own shard of the batch
    and this stitches them into one global jax.Array laid out along the
    'data' mesh axis (so the global batch dimension is
    local_batch * process_count).  On a single process this is equivalent
    to shard_batch.
    """
    local_batch = np.asarray(local_batch)
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis_name)
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
    ) + local_batch.shape[1:]
    sharding = NamedSharding(mesh, batch_spec(local_batch.ndim, axis_name))
    return jax.make_array_from_process_local_data(
        sharding, local_batch, global_shape
    )


def global_pytree_from_local(tree, mesh, local_batch_size, axis_name="data"):
    """Assemble a prepared-targets pytree into global arrays on a
    multi-host mesh.

    Every host runs ``criterion.prepare`` on its own local samples, so
    leaves with leading dim == local_batch_size are per-sample tables:
    they are stitched batch-sharded along 'data'.  Other array leaves
    (shared token/transition tables, scalars) are identical on every host
    (they derive from the criterion's static graphs) and are placed
    replicated.  Single-process falls back to shard_pytree_batch."""
    if jax.process_count() == 1:
        return shard_pytree_batch(tree, mesh, axis_name)

    def put(x):
        if not hasattr(x, "shape") or getattr(x, "ndim", 0) < 1:
            return x
        x = np.asarray(x)
        if x.shape[0] == local_batch_size:
            return global_batch_from_local(x, mesh, axis_name)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x, x.shape
        )

    return jax.tree_util.tree_map(put, tree)


def local_rows(x):
    """Process-local rows of a globally batch-sharded array, as numpy.

    Used by the host decode/metrics path on multi-host meshes: each host
    decodes only the samples it fed in (mirroring DDP's per-rank metric
    accounting, reference train.py:282-300), then Meters.sync aggregates
    the counts.  Shards are re-ordered by their global row offset."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(
            x.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        seen, parts = set(), []
        for s in shards:
            start = s.index[0].start or 0
            if start in seen:  # replicated along a trailing mesh axis
                continue
            seen.add(start)
            parts.append(np.asarray(s.data))
        return np.concatenate(parts, axis=0)
    return np.asarray(x)
