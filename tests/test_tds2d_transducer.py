"""TDS2dTransducer end-to-end model test (WFST conv vs plain conv control)."""

import pytest
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.models import TDS2dTransducer

TDS1 = {
    "depth": 2,
    "tds_groups": [{"channels": 2, "num_blocks": 1, "stride": [2, 2]}],
    "kernel_size": [3, 3],
    "dropout": 0.0,
}
TDS2 = {
    "depth": 2,
    "tds_groups": [{"channels": 2, "num_blocks": 1, "stride": [1, 1]}],
    "kernel_size": [3, 3],
    "dropout": 0.0,
}


def _token_file():
    f = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
    f.write("ab\nba\na\nb\n")
    f.close()
    return f.name


@pytest.mark.slow  # full WFST-conv model fwd+bwd
def test_tds2d_transducer_wfst():
    tokens = _token_file()
    model = TDS2dTransducer(
        input_size=8,
        output_size=6,
        tokens=tokens,
        kernel_size=5,
        stride=2,
        tds1=dict(TDS1),
        tds2=dict(TDS2),
        wfst=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape[0] == 2 and out.shape[2] == 6
    g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


def test_tds2d_transducer_control():
    tokens = _token_file()
    model = TDS2dTransducer(
        input_size=8,
        output_size=6,
        tokens=tokens,
        kernel_size=5,
        stride=2,
        tds1=dict(TDS1),
        tds2=dict(TDS2),
        wfst=False,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape[0] == 2 and out.shape[2] == 6


@pytest.mark.slow  # full WFST-conv model fwd+bwd
def test_tds2d_transducer_learned_kernels():
    tokens = _token_file()
    model = TDS2dTransducer(
        input_size=8,
        output_size=6,
        tokens=tokens,
        kernel_size=5,
        stride=2,
        tds1=dict(TDS1),
        tds2=dict(TDS2),
        wfst=True,
        conv_kwargs={"learn_params": True, "scale": "sqrt"},
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 12).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    assert "kernel_params" in params["params"]
    g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    kg = g["params"]["kernel_params"]
    assert float(jnp.abs(kg).sum()) > 0
