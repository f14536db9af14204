"""Word-decomps batch sweep (docs/benchmarks.md 'known anomaly': B=8 at
7.1 ms/iter vs the B=32 headline at 2.2 ms).  Measures the plain
dense-adjacency scorer across B in {8, 16, 32}, readback-closed, plus
the in-jit-scan device time (separates dispatch floor), and logs the
bucketed lattice size S per batch.
"""
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gtn_applications_tpu.criterions.transducer import Transducer

_DIR = "/root/repo"
with open(os.path.join(_DIR, "benchmarks",
                       "word_pieces_scores_1000.tsv")) as fid:
    tokens = sorted(l.rstrip("\n").split("\t")[0] for l in fid)
graphemes = sorted(set(c for t in tokens for c in t))
g2i = {t: i for i, t in enumerate(graphemes)}
Tw, Lw = 100, 15
Nw = len(tokens) + 1

crit = Transducer(tokens, g2i, blank="optional", allow_repeats=False,
                  reduction="mean")

results = {"metric": "word_decomps_sweep", "T": Tw, "L": Lw, "N": Nw}
for B in (8, 16, 32):
    rng = random.Random(0)
    nprng = np.random.RandomState(0)
    inputs = jnp.asarray(nprng.randn(B, Tw, Nw).astype(np.float32))
    targets = []
    for _ in range(B):
        pieces = (rng.choice(tokens) for _ in range(Lw))
        targets.append([g2i[l] for wp in pieces for l in wp])
    prepared = crit.prepare(targets)
    variant = ("plain" if "factored_plain" in prepared
               else "dst" if "factored_dst" in prepared
               else "factored" if "factored" in prepared else "sparse")
    S = (int(np.asarray(prepared["factored"]["adj_exp"]).shape[1])
         if "factored" in prepared else None)

    fwd_bwd = jax.jit(lambda x, prep: jax.value_and_grad(
        lambda x: crit.loss({}, x, prep))(x))
    v, g = fwd_bwd(inputs, prepared)
    float(v)
    start = time.perf_counter()
    for _ in range(200):
        v, g = fwd_bwd(inputs, prepared)
    float(v)
    rb = (time.perf_counter() - start) / 200 * 1e3

    # in-jit chained scan: pure device time per eval
    K = 16

    @jax.jit
    def scan(x, prep):
        def body(c, _):
            val, g = jax.value_and_grad(
                lambda x: crit.loss({}, x, prep))(x + c * 1e-38)
            return val + jnp.sum(g) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    o = scan(inputs, prepared)
    float(o)
    start = time.perf_counter()
    for _ in range(10):
        o = scan(inputs, prepared)
    float(o)
    dev = (time.perf_counter() - start) / 10 / K * 1e3

    results[f"B{B}"] = {
        "variant": variant, "S": S,
        "fwd_bwd_rb_ms": round(rb, 4),
        "fwd_bwd_device_ms": round(dev, 4),
        "per_sample_us": round(dev / B * 1e3, 2),
    }
    print(f"B={B} variant={variant} S={S} rb={rb:.3f} dev={dev:.3f}",
          file=sys.stderr, flush=True)

print(json.dumps(results))
