"""Fused multi-step training composes with the data mesh: [K, B, ...]
inputs sharded along axis 1 ('data'), params replicated — same result
as the unsharded fused run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gtn_applications_tpu.criterions import CTC
from gtn_applications_tpu.models import TDS2d
from gtn_applications_tpu.parallel import mesh as pmesh
from gtn_applications_tpu.train import make_fused_train_steps


def test_fused_steps_sharded_matches_unsharded():
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = pmesh.make_mesh(devs[:8])

    model = TDS2d(
        input_size=8, output_size=6, depth=2,
        tds_groups=[{"channels": 2, "num_blocks": 1, "stride": [2, 2]}],
        kernel_size=[3, 3], dropout=0.0,
    )
    criterion = CTC(blank=5)
    K, B, H, W = 2, 8, 8, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(K, B, H, W).astype(np.float32))
    targets = [list(rng.randint(0, 5, size=3)) for _ in range(B)]
    prepared = criterion.prepare(targets)
    prep_k = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (K,) + np.asarray(a).shape)
        if hasattr(a, "shape") else a,
        prepared,
    )
    params = {"model": model.init(jax.random.PRNGKey(0), x[0]),
              "criterion": criterion.init_params()}
    fused = make_fused_train_steps(model, criterion, 0.05, 0.05,
                                   max_grad_norm=5.0, num_steps=K)
    key = jax.random.PRNGKey(7)

    p_ref, loss_ref = fused(
        jax.tree_util.tree_map(jnp.copy, params), x, prep_k, key, 1.0)

    with mesh:
        p = pmesh.replicate(params, mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        prep_s = jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(
                    mesh, P(*([None, "data"] + [None] * (a.ndim - 2)))))
            if hasattr(a, "shape") and a.ndim >= 2 and a.shape[1] == B
            else a,
            prep_k,
        )
        p_sh, loss_sh = fused(p, xs, prep_s, key, 1.0)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
