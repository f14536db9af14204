#!/bin/bash
# One-command reproduction of the reference's only real-data quality
# claim: IAM quick-train test CER 17.0 after 50 epochs of tds2d + CTC
# (/root/reference/examples/notebooks/IAM_Handwriting_Recognition.ipynb,
# final cell).
#
# Usage:
#   recipes/iamdb_repro.sh WORKDIR EMAIL PASSWORD    # full run (IAM is
#       registration-gated: https://fki.tic.heia-fr.ch/login)
#   DRY_RUN=1 recipes/iamdb_repro.sh WORKDIR         # every non-download
#       stage on a synthetic IAM-format fixture (exercised in CI:
#       tests/test_scripts.py::test_iamdb_repro_dry_run)
#
# Stages: download -> stats/token export -> wordpieces + transitions
# (the optional pruned-ngram assets) -> train -> eval, printing the
# final test CER next to the 17.0 reference claim.
set -euo pipefail

WORK=${1:?usage: iamdb_repro.sh WORKDIR [EMAIL PASSWORD]}
mkdir -p "$WORK"
DATA="$WORK/data"
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
cd "$REPO"

EPOCHS=${EPOCHS:-50}
DRY_RUN=${DRY_RUN:-0}

# ---------------------------------------------------------------- stage 0
if [ "$DRY_RUN" = "1" ]; then
    echo "[stage 0] DRY RUN: synthesizing an IAM-format fixture at $DATA"
    EPOCHS=${DRY_EPOCHS:-2}
    python - "$DATA" << 'PY'
import os, sys
import numpy as np
import PIL.Image

root = sys.argv[1]
os.makedirs(root, exist_ok=True)
rng = np.random.RandomState(0)
words = ["move", "to", "stop", "the", "train", "at", "once", "hello"]
keys, lines = [], []
idx = 0
for f in range(6):
    form = f"a{f:02d}-000"
    img = rng.randint(200, 255, size=(900, 1800), dtype=np.uint8)
    for l in range(4):
        key = f"{form}-{l:02d}"
        # deterministic word cycling so the no-split wordpiece corpus
        # (forms 0-1, IAM convention: lines outside every split file
        # are the sentencepiece training text) covers the full vocab
        text = "|".join(words[(idx + k) % len(words)] for k in range(3))
        idx += 3
        box = (40, 40 + 200 * l, 1600, 120)
        lines.append(f"{key} ok 150 20 {box[0]} {box[1]} {box[2]} {box[3]} {text}")
        keys.append(key)
    PIL.Image.fromarray(img).save(os.path.join(root, f"{form}.png"))
with open(os.path.join(root, "lines.txt"), "w") as fid:
    fid.write("\n".join(lines) + "\n")
splits = {"trainset": keys[8:16], "validationset1": keys[16:20],
          "validationset2": [], "testset": keys[20:]}
for name, ks in splits.items():
    with open(os.path.join(root, f"{name}.txt"), "w") as fid:
        fid.write("\n".join(ks) + ("\n" if ks else ""))
print(f"fixture: {len(keys)} lines over 6 forms "
      f"(8 corpus-only, 8 train, 4 val, 4 test)")
PY
elif [ -f "$DATA/lines.txt" ]; then
    echo "[stage 0] $DATA already populated; skipping download"
else
    EMAIL=${2:?IAM credentials required (register at fki.tic.heia-fr.ch)}
    PASS=${3:?IAM credentials required}
    echo "[stage 0] downloading IAM to $DATA"
    bash gtn_applications_tpu/datasets/download/iamdb.sh "$DATA" "$EMAIL" "$PASS"
fi

# ---------------------------------------------------------------- stage 1
echo "[stage 1] dataset report + train-text/token export"
python -m gtn_applications_tpu.datasets.iamdb --data_path "$DATA" \
    --save_text "$WORK/train_text.txt" --save_tokens "$WORK/train_tokens.txt"

# ---------------------------------------------------------------- stage 2
# Optional assets for the wordpiece/pruned-ngram recipes (not needed for
# the grapheme-CTC quick-train, but the repro builds them so a recipe
# switch is config-only).  Piece count shrinks automatically on tiny
# fixture vocabularies.
echo "[stage 2] wordpieces + pruned-ngram transitions"
NPIECES=${NPIECES:-1000}
if [ "$DRY_RUN" = "1" ]; then NPIECES=30; fi
python -m gtn_applications_tpu.scripts.make_wordpieces --dataset iamdb \
    --data_dir "$DATA" --output_prefix "$WORK/word_pieces" \
    --num_pieces "$NPIECES"
python -m gtn_applications_tpu.scripts.build_transitions \
    --data_path "$WORK/train_text.txt" \
    --tokens "$WORK/word_pieces_tokens_${NPIECES}.txt" \
    --lexicon "$WORK/word_pieces_lex_${NPIECES}.txt" \
    --save_path "$WORK/transitions_wp_0_5_10.bin" \
    --prune 0 5 10 --blank optional

# ---------------------------------------------------------------- stage 3
echo "[stage 3] train tds2d + CTC ($EPOCHS epochs)"
python - "$DATA" "$WORK" "$EPOCHS" "$DRY_RUN" << 'PY'
import json, sys
data, work, epochs, dry = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4] == "1"
cfg = json.load(open("configs/iamdb/tds2d.json"))
cfg["data"]["data_path"] = data
cfg["data"]["fast_pipeline"] = True
cfg["optim"]["epochs"] = epochs
if dry:
    # shrink to fixture scale: 2-group model, small batch, CPU-friendly
    cfg["model"]["tds_groups"] = cfg["model"]["tds_groups"][:2]
    for g in cfg["model"]["tds_groups"]:
        g["num_blocks"] = 1
    cfg["optim"]["batch_size"] = 4
cfg["criterion_type"] = "ctc"
cfg["criterion"] = {}
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
echo "reference quick-train claim: test CER 17.0 (IAM notebook, 50 epochs)"
grep -i "cer" "$WORK/test_eval.log" | tail -1 || true
