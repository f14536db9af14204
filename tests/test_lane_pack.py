"""lane_pack=True must be a pure re-layout: identical param tree, same
outputs (fp32 tolerance) as the unpacked TDS2d on the flagship config."""

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.models import TDS2d
from gtn_applications_tpu.models.tds2d import TDSBlock2d


GROUPS = [
    {"channels": 4, "num_blocks": 1, "stride": [2, 2]},
    {"channels": 16, "num_blocks": 1, "stride": [2, 2]},
    {"channels": 32, "num_blocks": 1, "stride": [2, 1]},
    {"channels": 64, "num_blocks": 1, "stride": [2, 1]},
]


def _model(lane_pack, conv_layout="transpose"):
    return TDS2d(
        input_size=64, output_size=80, depth=4, tds_groups=GROUPS,
        kernel_size=[5, 7], dropout=0.0, lane_pack=lane_pack,
        conv_layout=conv_layout,
    )


def test_param_trees_identical():
    x = jnp.zeros((2, 64, 128), jnp.float32)
    p0 = _model(False).init(jax.random.PRNGKey(0), x)
    p1 = _model(True).init(jax.random.PRNGKey(0), x)
    s0 = jax.tree_util.tree_map(lambda a: a.shape, p0)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, p1)
    assert s0 == s1


def test_outputs_match_same_params():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32))
    params = _model(False).init(jax.random.PRNGKey(0), x)
    y0 = _model(False).apply(params, x)
    y1 = _model(True).apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_dimnums_layout_outputs_match():
    # the transpose-free block-conv layout is the same math on the same
    # param tree
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32))
    params = _model(False).init(jax.random.PRNGKey(0), x)
    y0 = _model(False).apply(params, x)
    y1 = _model(False, conv_layout="dimnums").apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


def test_dimnums_block_grads_match():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 32, 64).astype(np.float32))
    blk0 = TDSBlock2d(16, 4, (5, 7), 0.0)
    blk1 = TDSBlock2d(16, 4, (5, 7), 0.0, conv_layout="dimnums")
    params = blk0.init(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    g0 = jax.tree_util.tree_leaves_with_path(jax.grad(loss(blk0))(params))
    g1 = dict(jax.tree_util.tree_leaves_with_path(jax.grad(loss(blk1))(params)))
    for path, a in g0:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(g1[path]), rtol=1e-3, atol=1e-3,
            err_msg=str(path))


def test_block_grads_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 32, 64).astype(np.float32))
    blk0 = TDSBlock2d(16, 4, (5, 7), 0.0, lane_pack=False)
    blk1 = TDSBlock2d(16, 4, (5, 7), 0.0, lane_pack=True)
    params = blk0.init(jax.random.PRNGKey(0), x)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    g0 = jax.grad(loss(blk0))(params)
    g1 = jax.grad(loss(blk1))(params)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, a in flat0:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat1[path]), rtol=1e-3, atol=1e-3,
            err_msg=str(path))
