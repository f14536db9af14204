#!/usr/bin/env python
"""Wordpiece encode throughput (BASELINE.json north star: bytes/s/chip of
the wordpiece tokenizer).  Measures Viterbi segmentation over the
reference's 1k-piece vocabulary with the checked-in EM-fitted scores
(benchmarks/word_pieces_scores_1000.tsv — see
scripts/fit_piece_scores.py), on generated transcript-like text.

Prints human-readable lines plus one JSON line:
  {"metric": "wordpiece_encode", "value": <bytes/s>, "unit": "bytes/s", ...}
"""

import json
import math
import os
import random
import sys
import time

from gtn_applications_tpu.scripts.wordpiece import UnigramModel, WORDSEP

_DIR = os.path.dirname(os.path.abspath(__file__))
SCORES = os.path.join(_DIR, "word_pieces_scores_1000.tsv")


def load_model():
    if os.path.exists(SCORES):
        from gtn_applications_tpu.scripts.fit_piece_scores import load_scores

        pieces, lp = load_scores(SCORES)
        return UnigramModel(lp), pieces
    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz▁'"
    toks = {c for c in alphabet}
    while len(toks) < 1000:
        toks.add("".join(rng.choice(alphabet) for _ in range(rng.randint(2, 8))))
    toks = sorted(toks)
    return UnigramModel({p: -math.log(len(toks)) for p in toks}), toks


def main():
    model, pieces = load_model()
    rng = random.Random(0)
    words = [p[len(WORDSEP):] for p in pieces
             if p.startswith(WORDSEP) and len(p) > len(WORDSEP)] or [
        "the", "move", "recognition", "and", "training"]
    lines = [
        WORDSEP.join(rng.choice(words) for _ in range(12)) for _ in range(2000)
    ]
    total_bytes = sum(len(l.encode("utf-8")) for l in lines)
    # warmup
    for l in lines[:20]:
        model.encode(l)
    start = time.perf_counter()
    iters = 5
    for _ in range(iters):
        for l in lines:
            model.encode(l)
    elapsed = (time.perf_counter() - start) / iters
    rate = total_bytes / elapsed
    print(f"wordpiece encode (per line): {rate / 1e6:.2f} MB/s "
          f"({total_bytes} bytes in {elapsed * 1000:.1f} ms)",
          file=sys.stderr)
    batched_rate = rate
    enc = model._native_encoder()
    if enc is not None:
        enc.encode_batch(lines[:20])
        start = time.perf_counter()
        for _ in range(iters):
            enc.encode_batch(lines)
        elapsed = (time.perf_counter() - start) / iters
        batched_rate = total_bytes / elapsed
        print(f"wordpiece encode (batched): {batched_rate / 1e6:.2f} MB/s",
              file=sys.stderr)
    print(json.dumps({
        "metric": "wordpiece_encode_batched",
        "value": batched_rate,
        "unit": "bytes/s",
        "total_bytes": total_bytes,
        "vocab": len(pieces),
    }))


if __name__ == "__main__":
    main()
