#!/bin/bash
# One-command LibriSpeech wordpiece-CTC pipeline (the reference's
# recipes/diff_wfst/librispeech protocol: openslr download -> JSONL
# manifests -> 1k wordpieces + lexicon -> TDS train -> eval WER).
#
# Usage:
#   recipes/librispeech_repro.sh WORKDIR                # full run
#   DRY_RUN=1 recipes/librispeech_repro.sh WORKDIR      # every
#       non-download stage on a synthetic LibriSpeech-format fixture
#       (CI: tests/test_scripts.py::test_librispeech_repro_dry_run)
set -euo pipefail

WORK=${1:?usage: librispeech_repro.sh WORKDIR}
mkdir -p "$WORK"
DATA="$WORK/data"
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
cd "$REPO"

EPOCHS=${EPOCHS:-50}
DRY_RUN=${DRY_RUN:-0}
NPIECES=${NPIECES:-1000}

# ---------------------------------------------------------------- stage 0
if [ "$DRY_RUN" = "1" ]; then
    echo "[stage 0] DRY RUN: synthesizing a LibriSpeech-format tree"
    EPOCHS=${DRY_EPOCHS:-2}
    NPIECES=30
    python - "$DATA" << 'PY'
import os, sys
import numpy as np

sys.path.insert(0, "tests")
from flac_fixture import encode_flac  # real FLACs: the dry run also
                                      # exercises native/flac.cc decode

root = sys.argv[1]
words = ["move", "to", "stop", "the", "train", "at", "once", "hello"]
sr = 16000
for split, spk, n in [("train-clean-100", 19, 12), ("dev-clean", 20, 3),
                      ("test-clean", 21, 3), ("dev-other", 22, 1),
                      ("test-other", 23, 1)]:
    d = os.path.join(root, split, str(spk), "198")
    os.makedirs(d, exist_ok=True)
    lines = []
    for i in range(n):
        uid = f"{spk}-198-{i:04d}"
        text = " ".join(
            words[(i * 3 + k) % len(words)] for k in range(3)).upper()
        lines.append(f"{uid} {text}")
        t = np.arange(int(sr * 0.6))
        sig = (np.sin(t * (0.02 + 0.005 * i)) * 8000).astype(
            np.int64)[:, None]  # [frames, channels]
        with open(os.path.join(d, uid + ".flac"), "wb") as fid:
            fid.write(encode_flac(sig, sr, subframe_mode="fixed"))
    with open(os.path.join(d, f"{spk}-198.trans.txt"), "w") as fid:
        fid.write("\n".join(lines) + "\n")
print("fixture written")
PY
elif [ -d "$DATA/train-clean-100" ]; then
    echo "[stage 0] $DATA already populated; skipping download"
else
    echo "[stage 0] downloading LibriSpeech (openslr) to $DATA"
    bash gtn_applications_tpu/datasets/download/librispeech.sh "$DATA"
    DATA="$DATA/LibriSpeech"
fi

# ---------------------------------------------------------------- stage 1
echo "[stage 1] JSONL manifests"
python -m gtn_applications_tpu.datasets.preprocess_librispeech \
    --data_path "$DATA" --save_path "$DATA"

# ---------------------------------------------------------------- stage 2
echo "[stage 2] wordpieces + lexicon ($NPIECES pieces)"
python -m gtn_applications_tpu.scripts.make_wordpieces \
    --dataset librispeech --data_dir "$DATA" \
    --output_prefix "$WORK/word_pieces" --num_pieces "$NPIECES"

# ---------------------------------------------------------------- stage 3
echo "[stage 3] train TDS + CTC ($EPOCHS epochs)"
python - "$DATA" "$WORK" "$EPOCHS" "$DRY_RUN" "$NPIECES" << 'PY'
import json, sys
data, work, epochs, dry, npieces = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4] == "1",
    sys.argv[5])
cfg = json.load(open("configs/librispeech/tds.json"))
cfg["data"]["data_path"] = data
cfg["data"]["tokens"] = f"{work}/word_pieces_tokens_{npieces}.txt"
cfg["data"]["lexicon"] = f"{work}/word_pieces_lex_{npieces}.txt"
cfg["optim"]["epochs"] = epochs
if dry:
    cfg["data"]["num_features"] = 40
    cfg["model"]["tds_groups"] = [{"channels": 2, "num_blocks": 1}]
    cfg["optim"]["batch_size"] = 4
json.dump(cfg, open(f"{work}/repro_config.json", "w"), indent=1)
print(f"config: {work}/repro_config.json")
PY
CPU_FLAG=""
if [ "$DRY_RUN" = "1" ]; then CPU_FLAG="--disable_tpu"; fi
python train.py --config "$WORK/repro_config.json" \
    --checkpoint_path "$WORK/ckpt" $CPU_FLAG

# ---------------------------------------------------------------- stage 4
echo "[stage 4] eval test split"
python test.py --config "$WORK/repro_config.json" \
    --checkpoint_path "$WORK/ckpt" --split test $CPU_FLAG \
    | tee "$WORK/test_eval.log"
grep -i "wer" "$WORK/test_eval.log" | tail -1 || true
