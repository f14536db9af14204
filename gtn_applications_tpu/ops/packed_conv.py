"""Width-packed convolution: MXU-lane packing for small-channel convs.

The flagship TDS2d config (reference configs/iamdb/tds2d.json) opens with
4-16-channel groups.  On a 128x128 systolic array a conv with c_out
output features uses c_out/128 of the output lanes — <13% for the early
groups *by construction* (docs/roadmap.md gap 3; VERDICT r3 #1).

The fix implemented here: compute ``f`` adjacent output columns in one
contraction by scattering the kernel into a block-Toeplitz weight,

    Wp[i, f'*sw + j, c, f'*c_out + o] = W[i, j, c, o]

so the conv becomes stride (sh, f*sw) with kernel width
KW = (f-1)*sw + kw and f*c_out output features.  Output lanes go from
c_out to f*c_out (up to 128); arithmetic inflates by KW/kw (the zeros in
Wp are multiplied like real weights).  Net MXU-time win for the g1 conv
(c_out=16, kw=7, sw=2, f=8): lanes 8x, flops 3x -> ~2.7x; for stride-1
block convs (f=8..32) ~4-6x.  Whether the win is realized depends on
whether XLA's conv emitter was lane-bound to begin with — measured per
layer in benchmarks/flagship_roofline.py.

The scatter is expressed as an einsum with a constant 0/1 numpy tensor,
so Wp is a linear function of W: gradients flow through unchanged and
the packed conv is a drop-in replacement (exact same math, verified to
fp32 tolerance in tests/test_packed_conv.py).

MEASURED VERDICT (real chip, B=64 flagship, docs/flagship_roofline.json):
packing LOSES — full step 4.67 ms packed vs 3.99 unpacked; achieved
TFLOP/s stayed ~32 while the Toeplitz zeros inflated FLOPs 17%.  XLA's
TPU conv emitter is NOT output-lane-bound at these shapes (its achieved
throughput on the 4-16-channel convs already exceeds the naive
(K/128)*(N/128) lane model), so adding arithmetic only adds time.  Kept
as an opt-in (`lane_pack`) with its tests: it is the measurement that
retires docs/roadmap.md gap 3's hypothesis, and the packing transform
itself is useful on hardware whose conv emitter IS lane-bound.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _scatter_matrix(kw, f, sw):
    """Constant [kw, f, KW] 0/1 tensor: S[j, f', f'*sw + j] = 1."""
    KW = (f - 1) * sw + kw
    S = np.zeros((kw, f, KW), np.float32)
    for j in range(kw):
        for fp in range(f):
            S[j, fp, fp * sw + j] = 1.0
    return S, KW


def pack_weights(w, f, sw):
    """[kh, kw, c_in, c_out] -> block-Toeplitz [kh, KW, c_in, f*c_out]."""
    kh, kw, c_in, c_out = w.shape
    S, KW = _scatter_matrix(kw, f, sw)
    wp = jnp.einsum("ijco,jfJ->iJcfo", w, jnp.asarray(S, w.dtype))
    return wp.reshape(kh, KW, c_in, f * c_out)


def width_packed_conv(x, w, stride, f, precision=None):
    """SAME-padded 2-D conv equal to nn.Conv(w, stride, SAME-by-half-kernel),
    with ``f`` output columns packed into the feature axis.

    x: [B, H, W, c_in]; w: [kh, kw, c_in, c_out]; stride: (sh, sw).
    Returns [B, Ho, Wo, c_out] with Ho = ceil(H/sh), Wo = ceil(W/sw) —
    identical to nn.Conv with padding ((kh//2,kh//2),(kw//2,kw//2)).
    """
    kh, kw, c_in, c_out = w.shape
    sh, sw = stride
    B, H, W, _ = x.shape
    ph, pw = kh // 2, kw // 2
    # the unpacked conv's output extents under half-kernel padding
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    tiles = -(-Wo // f)

    wp = pack_weights(w, f, sw)
    KW = wp.shape[1]
    # tile t reads input columns [t*f*sw - pw, t*f*sw - pw + KW); the
    # last tile may read past W + pw when f does not divide Wo
    pad_hi = (tiles - 1) * f * sw - pw + KW - W
    y = lax.conv_general_dilated(
        x, wp,
        window_strides=(sh, f * sw),
        padding=((ph, ph), (pw, max(pad_hi, 0))),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    y = y.reshape(B, Ho, tiles * f, c_out)
    return y[:, :, :Wo, :]


def packing_factor(c_out, lanes=128):
    """Largest power-of-two f with f*c_out <= lanes (1 = no packing)."""
    f = 1
    while 2 * f * c_out <= lanes:
        f *= 2
    return f
