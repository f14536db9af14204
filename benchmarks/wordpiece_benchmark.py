#!/usr/bin/env python
"""Wordpiece encode throughput (BASELINE.json north star: bytes/s/chip of
the wordpiece tokenizer).  Measures Viterbi segmentation over the
reference's 1k-piece vocabulary (or a synthesized one) on generated
transcript-like text."""

import os
import random
import sys
import time

from gtn_applications_tpu.scripts.wordpiece import UnigramModel

REF_TOKENS = "/root/reference/benchmarks/word_pieces_tokens_1000.txt"


def load_pieces():
    if os.path.exists(REF_TOKENS):
        with open(REF_TOKENS) as fid:
            return [l.strip() for l in fid]
    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz▁'"
    toks = {c for c in alphabet}
    while len(toks) < 1000:
        toks.add("".join(rng.choice(alphabet) for _ in range(rng.randint(2, 8))))
    return sorted(toks)


def main():
    import math

    pieces = load_pieces()
    model = UnigramModel({p: -math.log(len(pieces)) for p in pieces})
    rng = random.Random(0)
    words = ["the", "move", "recognition", "and", "training", "of",
             "transducers", "with", "finite", "state", "models"]
    lines = [
        "▁".join(rng.choice(words) for _ in range(12)) for _ in range(2000)
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
          f"({total_bytes} bytes in {elapsed * 1000:.1f} ms)")
    enc = model._native_encoder()
    if enc is not None:
        enc.encode_batch(lines[:20])
        start = time.perf_counter()
        for _ in range(iters):
            enc.encode_batch(lines)
        elapsed = (time.perf_counter() - start) / iters
        print(f"wordpiece encode (batched): {total_bytes / elapsed / 1e6:.2f} MB/s")


if __name__ == "__main__":
    main()
