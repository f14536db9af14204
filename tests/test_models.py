"""Model shape/gradient tests (reference models have no unit tests; the
contract is the [B, H, W] -> [B, W, C] shape map at the config strides)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtn_applications_tpu.models import RNN, TDS, TDS2d


def test_tds_shapes():
    model = TDS(
        input_size=16,
        output_size=10,
        tds_groups=[
            {"channels": 2, "num_blocks": 1, "stride": 2},
            {"channels": 4, "num_blocks": 1, "stride": 2},
        ],
        kernel_size=5,
        dropout=0.0,
    )
    x = jnp.zeros((2, 16, 32))  # [B, H, W]
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 8, 10)  # W/4, output_size


def test_tds2d_shapes():
    model = TDS2d(
        input_size=16,
        output_size=11,
        depth=2,
        tds_groups=[
            {"channels": 2, "num_blocks": 1, "stride": [2, 2]},
            {"channels": 4, "num_blocks": 1, "stride": [2, 1]},
        ],
        kernel_size=[3, 5],
        dropout=0.0,
    )
    x = jnp.zeros((2, 16, 20))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10, 11)  # W/2, output_size


def test_tds2d_grad():
    model = TDS2d(
        input_size=8,
        output_size=5,
        depth=2,
        tds_groups=[{"channels": 2, "num_blocks": 1, "stride": [2, 2]}],
        kernel_size=[3, 3],
        dropout=0.0,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


@pytest.mark.parametrize("cell", ["lstm", "gru", "rnn"])
@pytest.mark.parametrize("bidir", [False, True])
def test_rnn_shapes(cell, bidir):
    model = RNN(
        input_size=16,
        output_size=7,
        cell_type=cell,
        hidden_size=12,
        num_layers=2,
        bidirectional=bidir,
    )
    x = jnp.zeros((2, 16, 20))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 5, 7)  # W/4 from two stride-2 convs


def test_dropout_train_mode():
    model = TDS(
        input_size=8,
        output_size=4,
        tds_groups=[{"channels": 2, "num_blocks": 1, "stride": 2}],
        kernel_size=3,
        dropout=0.5,
    )
    x = jnp.ones((1, 8, 10))
    params = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    det1 = model.apply(params, x)
    det2 = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(det1), np.asarray(det2))


def test_tds2d_bf16_compute():
    model = TDS2d(
        input_size=8,
        output_size=5,
        depth=2,
        tds_groups=[{"channels": 2, "num_blocks": 1, "stride": [2, 2]}],
        kernel_size=[3, 3],
        dropout=0.0,
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.dtype == jnp.float32  # logits stay fp32
    # params stay fp32
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    # close to the fp32 model's output
    import dataclasses

    model32 = dataclasses.replace(model, dtype=None)
    out32 = model32.apply(params, x)
    assert float(jnp.max(jnp.abs(out - out32))) < 0.15
