"""Dataset pipeline tests: IAM metadata parsing / preprocessing on a
synthetic fixture tree, audio manifests, mel spectrogram sanity, text
preprocessor lexicon fallback (reference behavior iamdb.py:191-204)."""

import json
import os
import tempfile
import wave

import numpy as np

from gtn_applications_tpu.datasets import audio, audioset, iamdb
from gtn_applications_tpu.datasets.text import TextPreprocessor, WORDSEP


def _make_iam_fixture(root):
    """Tiny IAM-like tree: two forms, two lines each."""
    lines = [
        "# comment line",
        "a01-000u-00 ok 154 19 408 746 1663 89 A|MOVE to stop",
        "a01-000u-01 ok 156 19 395 932 1850 105 the train",
        "a02-000-00 ok 150 20 300 500 1200 80 hello|world",
        "a02-000-01 ok 151 21 310 510 1100 75 again",
    ]
    with open(os.path.join(root, "lines.txt"), "w") as fid:
        fid.write("\n".join(lines) + "\n")
    for split, keys in [
        ("trainset", ["a01-000u-00", "a01-000u-01"]),
        ("validationset1", ["a02-000-00"]),
        ("validationset2", []),
        ("testset", ["a02-000-01"]),
    ]:
        with open(os.path.join(root, f"{split}.txt"), "w") as fid:
            fid.write("\n".join(keys) + ("\n" if keys else ""))
    try:
        import PIL.Image

        for form in ["a01-000u", "a02-000"]:
            img = PIL.Image.fromarray(
                (np.random.RandomState(0).rand(1100, 2100) * 255).astype(np.uint8)
            )
            img.save(os.path.join(root, f"{form}.png"))
        return True
    except ImportError:
        return False


def test_iam_metadata_and_preprocessor():
    with tempfile.TemporaryDirectory() as root:
        has_pil = _make_iam_fixture(root)
        forms = iamdb.load_metadata(root, WORDSEP)
        assert set(forms.keys()) == {"a01-000u", "a02-000"}
        texts = [l["text"] for l in forms["a01-000u"]]
        assert texts[0] == "A▁MOVE▁to▁stop"  # | and spaces -> wordsep
        pre = iamdb.Preprocessor(root, num_features=32)
        idx = pre.to_index("the")
        assert pre.to_text(idx) == "the"
        assert pre.num_tokens == len(pre.graphemes)

        if has_pil:
            ds = iamdb.Dataset(root, pre, split="train")
            assert len(ds) == 2
            img, tgt = ds[0]
            assert img.shape[0] == 32  # resized to num_features height
            sizes = ds.sample_sizes()
            assert len(sizes) == 2


def test_text_preprocessor_lexicon_fallback():
    with tempfile.TemporaryDirectory() as root:
        lex_path = os.path.join(root, "lex.txt")
        with open(lex_path, "w") as fid:
            fid.write("hello he llo\n")
        tokens_path = os.path.join(root, "tokens.txt")
        with open(tokens_path, "w") as fid:
            fid.write("\n".join(["he", "llo", "▁", "w", "o", "r", "l", "d"]))
        pre = TextPreprocessor(
            ["hello▁world"], tokens_path=tokens_path, lexicon_path=lex_path
        )
        # "hello" is in the lexicon; "world" falls back to ▁ + letters
        idx = pre.to_index("hello▁world")
        toks = [pre.tokens[i] for i in idx]
        assert toks[:2] == ["he", "llo"]
        assert "".join(toks[2:]) == "▁world"


def test_audio_manifest_and_mel():
    with tempfile.TemporaryDirectory() as root:
        sr = 16000
        wav_path = os.path.join(root, "a.wav")
        with wave.open(wav_path, "w") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            samples = (np.sin(np.arange(sr) * 0.05) * 20000).astype(np.int16)
            w.writeframes(samples.tobytes())
        with open(os.path.join(root, "train.json"), "w") as fid:
            fid.write(json.dumps({"text": "ab ba", "duration": 1.0, "audio": wav_path}) + "\n")
        splits = {"train": ["train"]}
        pre = audioset.Preprocessor(root, num_features=40, splits=splits)
        assert pre.to_text(pre.to_index("ab▁ba")) == "ab▁ba"
        ds = audioset.Dataset(root, pre, "train", splits)
        feats, tgt = ds[0]
        assert feats.shape[0] == 40
        assert abs(feats.mean()) < 1e-3  # log-normalized
        assert len(tgt) == 5


def test_mel_spectrogram_peak():
    # pure tone should peak at the right mel bin region
    sr, freq = 16000, 1000.0
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    mel = audio.MelSpectrogram(sample_rate=sr, n_fft=400, n_mels=80, hop_length=160)
    m = mel(x)
    peak_bin = int(m.mean(axis=1).argmax())
    # 1 kHz -> HTK mel 1000 ~= bin 80 * mel(1000)/mel(8000)
    expected = 80 * audio.hz_to_mel(freq) / audio.hz_to_mel(sr / 2)
    assert abs(peak_bin - expected) < 6


def test_specaugment_masks():
    rng = np.random.RandomState(0)
    x = np.ones((40, 100), np.float32)
    fm = audio.FrequencyMasking(10)
    tm = audio.TimeMasking(20)
    y = tm(fm(x, rng), rng)
    assert (y == 0).any()
    assert y.shape == x.shape


def test_preprocess_librispeech_manifest(tmp_path):
    """write_manifest walks the chapter layout and emits the JSONL schema
    datasets/audio.py consumes, with STREAMINFO-derived durations."""
    import json

    import numpy as np

    from gtn_applications_tpu.datasets import preprocess_librispeech as pls
    from tests.flac_fixture import encode_flac

    split = "dev-clean"
    chapter = tmp_path / split / "19" / "198"
    chapter.mkdir(parents=True)
    sr = 16000
    rng = np.random.RandomState(0)
    for utt, frames in [("19-198-0000", 1600), ("19-198-0001", 8000)]:
        data = encode_flac(
            (rng.randn(frames) * 1000).astype(np.int64), sr
        )
        (chapter / f"{utt}.flac").write_bytes(bytes(data))
    (chapter / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 GOOD DAY\n"
    )
    out = tmp_path / "out"
    out.mkdir()
    pls.write_manifest(tmp_path, out, split)
    entries = [
        json.loads(l) for l in (out / f"{split}.json").read_text().splitlines()
    ]
    assert len(entries) == 2
    assert entries[0]["text"] == "hello world"
    assert entries[1]["text"] == "good day"
    assert abs(entries[0]["duration"] - 1600 / sr) < 1e-6
    assert abs(entries[1]["duration"] - 8000 / sr) < 1e-6
    assert entries[0]["audio"].endswith("19-198-0000.flac")


def test_wrapper_short_ctor_and_augment(tmp_path):
    """The wsj/librispeech wrappers use subclass-pinned splits and the
    shared augment flag (specaugment_stack) through the short ctor."""
    import wave

    from gtn_applications_tpu.datasets import librispeech

    sr = 16000
    wav_path = str(tmp_path / "a.wav")
    with wave.open(wav_path, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        samples = (np.sin(np.arange(sr) * 0.05) * 20000).astype(np.int16)
        w.writeframes(samples.tobytes())
    entry = {"text": "ab ba", "duration": 1.0, "audio": wav_path}
    for name in ("train-clean-100", "dev-clean", "test-clean", "test-other"):
        with open(tmp_path / f"{name}.json", "w") as fid:
            fid.write(json.dumps(entry) + "\n")

    pre = librispeech.Preprocessor(str(tmp_path), num_features=40)
    ds = librispeech.Dataset(str(tmp_path), pre, split="train", augment=True)
    assert len(ds.augmentation) == 4  # 2 freq + 2 time masks
    feats, tgt = ds[0]
    assert feats.shape[0] == 40 and len(tgt) == 5
    plain = librispeech.Dataset(str(tmp_path), pre, split="validation")
    assert plain.augmentation == []


def test_iam_cli_exports_and_stats(tmp_path, capsys):
    """The __main__ CLI contract scripts/iamdb_transitions.sh relies on:
    --save_text writes the train transcripts, --save_tokens the grapheme
    inventory; --compute_stats reports without crashing."""
    root = str(tmp_path)
    if not _make_iam_fixture(root):
        pytest.skip("PIL unavailable")
    text_out = str(tmp_path / "text.txt")
    tok_out = str(tmp_path / "tokens.txt")
    iamdb._cli([
        "--data_path", root, "--save_text", text_out,
        "--save_tokens", tok_out, "--compute_stats",
    ])
    lines = open(text_out).read().splitlines()
    assert len(lines) == 2 and lines[0] == "A\u2581MOVE\u2581to\u2581stop"
    toks = open(tok_out).read().splitlines()
    assert WORDSEP in toks and "o" in toks
    report = capsys.readouterr().out
    assert "train=2" in report and "pixel stats" in report


def test_iam_fast_pipeline_equivalence(tmp_path):
    """fast_pipeline batches (uint8 getitem + vectorized collate) must
    match the default path exactly on the non-augment split and to fp32
    tolerance under augmentation (same RNG draw order, batch-level
    summation)."""
    import random

    from gtn_applications_tpu import utils as U

    root = str(tmp_path)
    if not _make_iam_fixture(root):
        pytest.skip("PIL unavailable")
    pre = iamdb.Preprocessor(root, num_features=48)

    for augment in (False, True):
        slow = iamdb.Dataset(root, pre, split="train", augment=augment)
        fast = iamdb.Dataset(root, pre, split="train", augment=augment,
                             fast_pipeline=True)
        assert slow.collate_fn is None and fast.collate_fn is not None
        idx = list(range(len(slow)))
        random.seed(7)
        b_slow = U.padding_collate([slow[i] for i in idx])
        random.seed(7)
        b_fast = fast.collate_fn([fast[i] for i in idx])
        np.testing.assert_array_equal(b_slow[1], b_fast[1])  # widths
        for t1, t2 in zip(b_slow[2], b_fast[2]):
            np.testing.assert_array_equal(t1, t2)
        # fp32 rounding only: the fast path folds /255 into the
        # brightness multiply (one fused scalar), the slow path divides
        # then multiplies
        tol = 1e-6 if not augment else 2e-5
        np.testing.assert_allclose(b_slow[0], b_fast[0], atol=tol)


def test_dataloader_multiworker_order_and_content():
    """num_workers > 1 must yield the same batches in the same order as
    the single-producer path."""
    from gtn_applications_tpu import utils as U

    class Toy:
        def __init__(self, n):
            self.n = n

        def sample_sizes(self):
            return [((i % 5 + 3, 4), 2) for i in range(self.n)]

        def __getitem__(self, i):
            return (np.full((4, i % 5 + 3), i, np.float32),
                    np.asarray([i, i + 1], np.int32))

        def __len__(self):
            return self.n

    ds = Toy(37)
    s1 = U.BatchSortedSampler(ds, 4, shuffle=False)
    s2 = U.BatchSortedSampler(ds, 4, shuffle=False)
    ref = list(U.DataLoader(ds, s1, num_workers=1))
    got = list(U.DataLoader(ds, s2, num_workers=3))
    assert len(ref) == len(got)
    for (a1, w1, t1), (a2, w2, t2) in zip(ref, got):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(w1, w2)
        for x, y in zip(t1, t2):
            np.testing.assert_array_equal(x, y)
