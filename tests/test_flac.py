"""Native FLAC decoder (native/flac.cc) against the fixture encoder:
round-trips for every subframe type and stereo decorrelation mode, plus the
datasets.audio.load_audio entry point that LibriSpeech uses."""

import os
import tempfile

import numpy as np
import pytest

from gtn_applications_tpu.wfst import native
from tests.flac_fixture import encode_flac

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _signal(frames, channels=1, seed=0, amplitude=8000):
    rng = np.random.RandomState(seed)
    t = np.arange(frames)
    base = (amplitude * np.sin(2 * np.pi * t / 37.0)).astype(np.int64)
    out = np.stack(
        [base + rng.randint(-200, 200, frames) for _ in range(channels)],
        axis=1,
    )
    return np.clip(out, -(2 ** 15), 2 ** 15 - 1)


@pytest.mark.parametrize("mode", ["verbatim", "constant", "fixed"])
def test_roundtrip_mono_modes(mode):
    if mode == "constant":
        x = np.full((700, 1), -123, np.int64)
    else:
        x = _signal(700)
    data = encode_flac(x, 16000, subframe_mode=mode)
    pcm, sr, bits = native.decode_flac(data)
    assert (sr, bits) == (16000, 16)
    np.testing.assert_array_equal(pcm, x)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    x = _signal(512, seed=order)
    data = encode_flac(x, 8000, subframe_mode="fixed", fixed_order=order)
    pcm, sr, _ = native.decode_flac(data)
    assert sr == 8000
    np.testing.assert_array_equal(pcm, x)


def test_lpc_subframe():
    x = _signal(400, seed=7)
    # order-2 predictor with a quantization shift
    data = encode_flac(
        x, 16000, subframe_mode="lpc", lpc_coefs=[3, -1], lpc_shift=1
    )
    pcm, _, _ = native.decode_flac(data)
    np.testing.assert_array_equal(pcm, x)


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes(stereo):
    x = _signal(600, channels=2, seed=3)
    data = encode_flac(x, 16000, subframe_mode="fixed", stereo_mode=stereo)
    pcm, sr, _ = native.decode_flac(data)
    assert pcm.shape == (600, 2)
    np.testing.assert_array_equal(pcm, x)


def test_blocksize_not_dividing_frames():
    x = _signal(500)  # 500 = 256 + 244: last frame padded, then trimmed
    data = encode_flac(x, 16000, blocksize=256)
    pcm, _, _ = native.decode_flac(data)
    assert pcm.shape[0] == 500
    np.testing.assert_array_equal(pcm, x)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        native.decode_flac(b"not a flac stream at all")
    good = encode_flac(_signal(300), 16000)
    with pytest.raises(ValueError):
        native.decode_flac(good[:40])  # truncated inside STREAMINFO
    # corrupted frame sync
    bad = bytearray(good)
    bad[-50] ^= 0xFF
    try:
        native.decode_flac(bytes(bad))  # may or may not raise; must not crash
    except ValueError:
        pass


def test_load_audio_flac_entry():
    from gtn_applications_tpu.datasets.audio import load_audio

    x = _signal(800, channels=2, seed=9)
    data = encode_flac(x, 16000, subframe_mode="fixed", stereo_mode="mid_side")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "utt.flac")
        with open(path, "wb") as fid:
            fid.write(data)
        audio, sr = load_audio(path)
    assert sr == 16000
    assert audio.shape == (800,)
    expect = (x.astype(np.float32) / 2 ** 15).mean(axis=1)
    np.testing.assert_allclose(audio, expect, atol=1e-6)
