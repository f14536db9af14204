"""width_packed_conv must equal nn.Conv exactly (same math, repacked).

Covers the flagship's real shapes: the group-entry convs (stride 2 and
1 on W, c_out 16/64) and the TDSBlock inner convs (stride 1, c_out
4/16/32), plus non-dividing widths where the last packed tile is
partial, and gradient equality (the packed weight is a linear scatter
of the original, so grads must match too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtn_applications_tpu.ops.packed_conv import (
    packing_factor, width_packed_conv,
)


def _oracle(x, w, stride):
    kh, kw = w.shape[:2]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


CASES = [
    # (H, W, c_in, c_out, stride, f)  — flagship shapes and edge cases
    (64, 128, 1, 16, (2, 2), 8),     # g1 entry conv
    (32, 64, 16, 64, (2, 2), 2),     # g2 entry conv
    (32, 64, 4, 4, (1, 1), 32),      # g1 block conv (D folded into batch)
    (16, 32, 16, 16, (1, 1), 8),     # g2 block conv
    (16, 30, 16, 16, (1, 1), 8),     # W with a partial last tile
    (8, 33, 32, 32, (2, 1), 4),      # odd W, stride on H only
    (16, 20, 8, 8, (1, 2), 4),       # stride on W with packing
]


@pytest.mark.parametrize("H,W,c_in,c_out,stride,f", CASES)
def test_matches_oracle(H, W, c_in, c_out, stride, f):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, H, W, c_in).astype(np.float32))
    kh, kw = 5, 7
    w = jnp.asarray(rng.randn(kh, kw, c_in, c_out).astype(np.float32) * 0.1)
    ref = _oracle(x, w, stride)
    out = width_packed_conv(x, w, stride, f)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 32, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 7, 16, 16).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(2, 16, 32, 16).astype(np.float32))

    def loss(fn):
        return lambda x, w: jnp.vdot(fn(x, w), cot)

    g_ref = jax.grad(loss(lambda x, w: _oracle(x, w, (1, 1))),
                     argnums=(0, 1))(x, w)
    g_pak = jax.grad(loss(lambda x, w: width_packed_conv(x, w, (1, 1), 8)),
                     argnums=(0, 1))(x, w)
    for a, b in zip(g_ref, g_pak):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_packing_factor():
    assert packing_factor(16) == 8
    assert packing_factor(64) == 2
    assert packing_factor(128) == 1
    assert packing_factor(4) == 32
    assert packing_factor(200) == 1


def test_f1_is_identity_packing():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 7, 8, 8).astype(np.float32) * 0.1)
    np.testing.assert_allclose(
        np.asarray(width_packed_conv(x, w, (1, 1), 1)),
        np.asarray(_oracle(x, w, (1, 1))), rtol=1e-5, atol=1e-5)
