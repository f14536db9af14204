"""Chip drive: plain dense-adjacency path A/B (GTN_FACTORED_VJP) at the
TRUE word-decomps protocol scale (B=32, T=100, N=1001, S~376)."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timed(fn, warmup=3, iters=100):
    for _ in range(warmup):
        fn()
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    float(jnp.sum(last))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import random

    from gtn_applications_tpu.criterions.transducer import Transducer
    from gtn_applications_tpu.ops import factored as fact

    with open("/root/repo/benchmarks/word_pieces_scores_1000.tsv") as fid:
        tokens = sorted(l.rstrip("\n").split("\t")[0] for l in fid)
    graphemes = sorted(set(c for t in tokens for c in t))
    g2i = {t: i for i, t in enumerate(graphemes)}
    rng = random.Random(0)
    nprng = np.random.RandomState(0)
    B, Tw, Lw = 32, 100, 15
    Nw = len(tokens) + 1
    inputs = jnp.asarray(nprng.randn(B, Tw, Nw).astype(np.float32))
    targets = []
    for _ in range(B):
        pieces = (rng.choice(tokens) for _ in range(Lw))
        targets.append([g2i[l] for wp in pieces for l in wp])
    crit = Transducer(tokens, g2i, blank="optional", allow_repeats=False,
                      reduction="mean")
    prep = crit.prepare(targets)
    assert "factored" in prep and "factored_plain" in prep

    @jax.jit
    def fwd_bwd(x, p):
        return jax.value_and_grad(lambda x: crit.loss({}, x, p))(x)

    res = {}
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        jax.clear_caches()
        v, g = fwd_bwd(inputs, prep)
        ms = timed(lambda: fwd_bwd(inputs, prep)[0])
        res[impl] = (float(v), np.asarray(g), ms)
        print(f"[wd {impl}] loss={float(v):.6f} fwd+bwd={ms:.3f} ms",
              flush=True)
    dl = abs(res["auto"][0] - res["off"][0])
    dg = float(np.max(np.abs(res["auto"][1] - res["off"][1])))
    print(f"[wd diff] dloss={dl:.2e} dgrad={dg:.2e}", flush=True)
    with open("/tmp/drive_wd.json", "w") as f:
        json.dump({"word_decomps_protocol": {
            "fwdbwd_vjp": res["auto"][2], "fwdbwd_off": res["off"][2],
            "dloss": dl, "dgrad": dg}}, f, indent=1)
    print("DRIVE_OK", flush=True)


if __name__ == "__main__":
    main()
