"""Device mesh + sharding helpers (the framework's parallelism layer).

Replaces the reference's torch DDP/NCCL plumbing (train.py:135-208) with
the JAX SPMD model: one global ``Mesh`` over all chips/hosts, parameters
replicated, batch sharded along ``'data'``; XLA compiles the gradient
all-reduce onto ICI.  Scale-out beyond the reference (not present there):
the lattice time axis can additionally be sharded for very long sequences
since the log-semiring scan is associative — see ops.lattice.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all devices (default)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def batch_spec(ndim, axis_name="data"):
    return P(axis_name, *([None] * (ndim - 1)))


def shard_batch(batch, mesh, axis_name="data"):
    """Shard the leading axis across the mesh; replicate if indivisible."""
    batch = np.asarray(batch) if not isinstance(batch, jnp.ndarray) else batch
    ndev = mesh.devices.size
    if batch.shape[0] % ndev == 0 and ndev > 1:
        return jax.device_put(
            batch, NamedSharding(mesh, batch_spec(batch.ndim, axis_name))
        )
    return jnp.asarray(batch)


def shard_pytree_batch(tree, mesh, axis_name="data"):
    """Shard every array leaf of a prepared-targets pytree along axis 0
    (leaves whose leading dim is not divisible are replicated)."""
    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1:
            return shard_batch(x, mesh, axis_name)
        return x

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh):
    return jax.device_put(
        tree, NamedSharding(mesh, P())
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
