"""Build LibriSpeech JSONL manifests (parity:
/root/reference/datasets/preprocess_librispeech.py, torchaudio-free).

Durations come from soundfile when available, else from FLAC STREAMINFO
headers parsed directly (stdlib-only).
"""

import argparse
import glob
import json
import os
import struct

SPLITS = [
    "train-clean-100", "dev-clean", "dev-other", "test-clean", "test-other",
]


def load_transcripts(path):
    pattern = os.path.join(path, "*/*/*.trans.txt")
    data = {}
    for f in glob.glob(pattern):
        with open(f) as fid:
            lines = (l.strip().split() for l in fid)
            data.update((l[0], " ".join(l[1:])) for l in lines)
    return data


def path_from_key(key, prefix, ext):
    dirs = key.split("-")
    dirs[-1] = key
    return os.path.join(prefix, *dirs) + os.path.extsep + ext


def clean_text(text):
    return text.strip().lower()


def flac_duration(path):
    """Duration in seconds from the FLAC STREAMINFO block (no decoder)."""
    try:
        import soundfile as sf

        info = sf.info(path)
        return info.frames / info.samplerate
    except ImportError:
        pass
    with open(path, "rb") as fid:
        if fid.read(4) != b"fLaC":
            raise ValueError(f"{path} is not a FLAC file")
        header = fid.read(4)
        # first metadata block must be STREAMINFO (34 bytes)
        block = fid.read(34)
        sample_rate = (block[10] << 12) | (block[11] << 4) | (block[12] >> 4)
        total = ((block[13] & 0x0F) << 32) | struct.unpack(">I", block[14:18])[0]
        return total / sample_rate


def build_json(data_path, save_path, split):
    split_path = os.path.join(data_path, split)
    transcripts = load_transcripts(split_path)
    save_file = os.path.join(save_path, f"{split}.json")
    with open(save_file, "w") as fid:
        for k, t in transcripts.items():
            flac_file = path_from_key(k, split_path, ext="flac")
            datum = {
                "text": clean_text(t),
                "duration": flac_duration(flac_file),
                "audio": flac_file,
            }
            json.dump(datum, fid)
            fid.write("\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Preprocess librispeech dataset.")
    parser.add_argument("--data_path", type=str)
    parser.add_argument("--save_path", type=str)
    args = parser.parse_args()
    for split in SPLITS:
        print(f"Preprocessing {split}")
        build_json(args.data_path, args.save_path, split)
