"""make_fused_train_steps(K) must equal K sequential make_train_step calls
(same batches, same per-step dropout keys, same update order)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import CTC
from gtn_applications_tpu.models import TDS2d
from gtn_applications_tpu.train import make_fused_train_steps, make_train_step


def _setup():
    model = TDS2d(
        input_size=8, output_size=6, depth=2,
        tds_groups=[{"channels": 2, "num_blocks": 1, "stride": [2, 2]}],
        kernel_size=[3, 3], dropout=0.0,
    )
    criterion = CTC(blank=5)
    K, B, H, W = 3, 4, 8, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(K, B, H, W).astype(np.float32))
    targets = [list(rng.randint(0, 5, size=3)) for _ in range(B)]
    prepared = criterion.prepare(targets)
    prepared_k = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                                   (K,) + np.asarray(a).shape)
        if hasattr(a, "shape") else a,
        prepared,
    )
    params = {"model": model.init(jax.random.PRNGKey(0), x[0]),
              "criterion": criterion.init_params()}
    return model, criterion, x, prepared, prepared_k, params, K


def test_fused_equals_sequential():
    model, criterion, x, prepared, prepared_k, params, K = _setup()
    import copy

    plain = make_train_step(model, criterion, 0.05, 0.05, max_grad_norm=5.0)
    fused = make_fused_train_steps(model, criterion, 0.05, 0.05,
                                   max_grad_norm=5.0, num_steps=K)

    root = jax.random.PRNGKey(7)
    keys = jax.random.split(root, K)

    p_seq = jax.tree_util.tree_map(jnp.copy, params)
    losses = []
    for i in range(K):
        p_seq, loss, _ = plain(p_seq, x[i], prepared, keys[i], 1.0)
        losses.append(float(loss))

    p_fused, mean_loss = fused(
        jax.tree_util.tree_map(jnp.copy, params), x, prepared_k, root, 1.0)

    np.testing.assert_allclose(float(mean_loss), np.mean(losses),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
