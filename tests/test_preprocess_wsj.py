"""WSJ preprocessing: transcript cleaning goldens + a full fixture run.

The goldens encode the reference's cleaning semantics
(/root/reference/datasets/preprocess_wsj.py clean()) so manifests stay
byte-identical; the fixture run drives load_text/load_waves/write_json
over a synthetic LDC-shaped tree.
"""

import json
import os
import struct
import wave as wavelib

from gtn_applications_tpu.datasets import preprocess_wsj as pp


def test_clean_goldens():
    cases = {
        # markup + noise-tag stripping, lowercasing
        "The <quick> [noise] BROWN\\ fox": "the quick brown fox",
        # verbalized punctuation words
        "stop .period end": "stop period end",
        "a .point b": "a point b",
        "lone . dot": "lone dot",
        # X-dash compounds split into pieces
        "nineteen--dash twenty": "nineteen dash twenty",
        "mid-dash word": "mid dash word",
        # parenthesized fragments and stray punctuation
        "keep (drop) these, all! 50%": "keep these all 50",
        # backtick becomes apostrophe; whitespace squeezed
        "it`s   fine": "it's fine",
        "": "",
    }
    for raw, want in cases.items():
        assert pp.clean(raw) == want, (raw, pp.clean(raw), want)


def _write_wav(path, n_frames=160, rate=16000):
    with wavelib.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n_frames}h", *([0] * n_frames)))


def test_fixture_pipeline(tmp_path):
    root = tmp_path / "wsj"
    # dot transcripts under a path matching DOT_PATHS[0]
    dots = root / "csr_1/11-1.1/wsj0/transcrp/dots/spk/aa"
    dots.mkdir(parents=True)
    (dots / "aa.dot").write_text(
        "HELLO .period World (utt001)\n"
        "second [noise] line (utt002)\n"
    )
    # audio under the disk directory named by the ndx entries
    audio = root / "csr_1/11-2.1/wsj0/si_et_20"
    audio.mkdir(parents=True)
    _write_wav(str(audio / "utt001.wav"))
    _write_wav(str(audio / "utt002.wav"), n_frames=320)
    # ndx index: comments skipped, 'disk_label: path' resolved
    ndx = root / "csr_1/11-13.1/wsj0/doc/indices/test/nvp"
    ndx.mkdir(parents=True)
    (ndx / "si_et_20.ndx").write_text(
        "; a comment line\n"
        "11_2_1: wsj0/si_et_20/utt002.wav\n"
        "11_2_1: wsj0/si_et_20/utt001.wav\n"
    )

    transcripts = pp.load_text(str(root))
    assert transcripts == {
        "utt001": "hello period world",
        "utt002": "second line",
    }

    waves = pp.load_waves(str(root), pp.DATASETS["eval_92"])
    # entries come back sorted within each index file
    assert [os.path.basename(w) for w in waves] == ["utt001.wav", "utt002.wav"]
    assert all(os.path.exists(w) for w in waves)

    pp.write_json(str(tmp_path), "eval_92", waves, transcripts)
    rows = [
        json.loads(l)
        for l in (tmp_path / "eval_92.json").read_text().splitlines()
    ]
    assert rows[0]["text"] == "hello period world"
    assert abs(rows[0]["duration"] - 0.01) < 1e-9
    assert abs(rows[1]["duration"] - 0.02) < 1e-9
    assert rows[1]["audio"].endswith("utt002.wav")
