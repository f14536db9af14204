"""Chip drive: exp-linear dst-factored backoff tier A/B at recipe scale.

The 1kwp_ngram2 recipes (recipes/diff_wfst/iamdb/1kwp_ngram2_*.json) score
through the destination-factored backoff path (ops/factored.py
backoff_dst_factored_score); this drive builds that regime synthetically —
a pruned bigram + optional-blank transition graph over 1000 wordpiece
tokens via the offline builder (scripts/build_transitions.py), exactly the
structure the recipes load — at the word-decomps protocol shapes
(B=32, T=100, L=15, N=1001), then A/Bs the auto path — the exp-linear
tier (backoff_dst_exp_score) with the low-rank eps closure
(eps_chain_struct) when the structure gate engages — against the
staged dense-closure oracle (GTN_FACTORED_VJP=off), asserting loss +
emission + transition-grad parity on the real chip before timing both
readback-closed.  Measured tiers: staged 184.3 ms, exp-linear 60.2
(3.06x), + low-rank closure 31.7 (5.82x) —
docs/captures_r05/drive_backoff.json.
"""
import json
import random
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

NTOK, B, T, L = 1000, 32, 100, 15


def timed(fn, warmup=3, iters=50):
    """Readback-closed: async-dispatch the chain, one float() at the end
    (the per-call block_until_ready floor is ~28 ms on this stack)."""
    for _ in range(warmup):
        fn()
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    float(jnp.sum(last))
    return (time.perf_counter() - t0) / iters * 1e3


def recipe_scale_lm(seed=0):
    """Pruned bigram + blank-interleave graph over NTOK wordpieces via
    the offline builder — a zipf-ish synthetic corpus so the bigram
    inventory is LM-shaped (dense head, long pruned tail).

    Token inventory is ATOMIC tuples ((i,) per wordpiece, like
    drive_vjp.py / the word-decomps protocol): multi-char string tokens
    would be split into graphemes by the lexicon and mismatch the
    token-labelled LM arcs."""
    from gtn_applications_tpu.scripts import build_transitions as bt

    rng = random.Random(seed)
    toks = [str(i) for i in range(NTOK)]
    lines = [
        [str(min(NTOK - 1, int(rng.paretovariate(1.1)) - 1))
         for _ in range(rng.randint(5, 20))]
        for _ in range(4000)
    ]
    # real LMs have every unigram (the ARPA builder smooths); guarantee
    # coverage so uniform targets stay reachable through backoff and the
    # context inventory is recipe-sized (~NTOK+1, not just the zipf head)
    order = list(range(NTOK))
    rng.shuffle(order)
    lines += [[str(i) for i in order[k:k + 10]]
              for k in range(0, NTOK, 10)]
    t2i = {t: i for i, t in enumerate(toks)}
    counts = bt.count_ngrams(lines, 2, t2i)
    pruned = bt.prune_ngrams(counts, [0, 0])
    grams = bt.add_blank_grams(pruned, NTOK, "optional")
    grams = bt.add_self_loops(grams)
    return bt.build_graph(grams)


def main():
    from gtn_applications_tpu.criterions import transducer as tmod
    from gtn_applications_tpu.criterions.transducer import Transducer
    from gtn_applications_tpu.ops import factored as fact

    g = recipe_scale_lm()
    crit = Transducer([(i,) for i in range(NTOK)],
                      {i: i for i in range(NTOK)},
                      transitions=g, blank="optional", reduction="mean")
    assert crit._factored_backoff_dst, "dst-factored gate must engage"
    crit._factored_backoff = False  # dense [N,S_c,S_c] cannot materialize

    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, NTOK + 1).astype(np.float32))
    targets = [rng.randint(0, NTOK, size=L).tolist() for _ in range(B)]
    saved_f = tmod._FACTORED_IMPL
    tmod._FACTORED_IMPL = "on"  # gate requires TPU under auto; force for CPU
    try:
        prepared = crit.prepare(targets)
    finally:
        tmod._FACTORED_IMPL = saved_f
    assert "factored_dst" in prepared, sorted(prepared)
    s_c = len(crit._norm_table.start)
    print(f"[lm] arcs={crit.num_transition_arcs} S_c={s_c}", flush=True)

    params = {"transitions": jnp.asarray(
        rng.randn(crit.num_transition_arcs).astype(np.float32)) * 0.3}

    @jax.jit
    def fwd_bwd(p, x, prep):
        return jax.value_and_grad(
            lambda p, x: crit.loss(p, x, prep), argnums=(0, 1)
        )(p, x)

    results = {}
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        jax.clear_caches()
        v, grads = fwd_bwd(params, inputs, prepared)
        v = float(v)
        assert np.isfinite(v) and abs(v) < 1e6, (
            f"degenerate loss {v}: targets unreachable?")
        gt = np.asarray(grads[0]["transitions"])
        gx = np.asarray(grads[1])
        ms_fb = timed(lambda: fwd_bwd(params, inputs, prepared)[0])
        results[impl] = (v, gt, gx, ms_fb)
        print(f"[backoff_dst {impl}] loss={v:.6f} fwd+bwd={ms_fb:.3f} ms",
              flush=True)

    va, gta, gxa, fba = results["auto"]
    vo, gto, gxo, fbo = results["off"]
    dl = abs(va - vo)
    dgt = float(np.max(np.abs(gta - gto)))
    dgx = float(np.max(np.abs(gxa - gxo)))
    print(f"[backoff_dst diff] dloss={dl:.2e} dgrad_trans={dgt:.2e} "
          f"dgrad_em={dgx:.2e} speedup={fbo / fba:.2f}x", flush=True)
    assert dl < 2e-3 and dgt < 2e-3 and dgx < 2e-3, (dl, dgt, dgx)

    out = {"backoff_dst_1kwp": {
        "fwdbwd_exp_linear": fba, "fwdbwd_staged": fbo,
        "speedup": fbo / fba,
        "dloss": dl, "dgrad": max(dgt, dgx),
        "arcs": int(crit.num_transition_arcs),
    }}
    with open("/tmp/drive_backoff.json", "w") as f:
        json.dump(out, f, indent=1)
    print("DRIVE_OK", flush=True)


def split():
    """Profile the loss's internals: score vs norm, fwd vs fwd+bwd —
    sizes the analytic-VJP opportunity (XLA's scan transpose runs the
    backward at ~2.4x the forward on this chip)."""
    from gtn_applications_tpu.criterions import transducer as tmod
    from gtn_applications_tpu.criterions.transducer import Transducer
    from gtn_applications_tpu.ops import factored as fact

    g = recipe_scale_lm()
    crit = Transducer([(i,) for i in range(NTOK)],
                      {i: i for i in range(NTOK)},
                      transitions=g, blank="optional", reduction="mean")
    assert crit._factored_backoff_dst
    crit._factored_backoff = False
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, NTOK + 1).astype(np.float32))
    targets = [rng.randint(0, NTOK, size=L).tolist() for _ in range(B)]
    saved_f = tmod._FACTORED_IMPL
    tmod._FACTORED_IMPL = "on"
    try:
        prepared = crit.prepare(targets)
    finally:
        tmod._FACTORED_IMPL = saved_f
    f = prepared["factored"]
    lens = jnp.full((B,), T, jnp.int32)
    params = jnp.asarray(
        rng.randn(crit.num_transition_arcs).astype(np.float32)) * 0.3
    N = NTOK + 1

    def _elr(p):
        # mirror the criterion's dispatch: low-rank closure under auto
        if crit._eps_lr_struct is not None and fact._use_vjp():
            return fact.eps_lowrank_build(
                crit._eps_eff_weights(p), crit._eps_lr_struct)
        return None

    @jax.jit
    def score_f(p, x):
        tm = crit._transition_matrices_dst(p, N)
        return jnp.sum(fact.backoff_dst_factored_score(
            x, f["adj_exp"], f["lab_oh"], f["start"], f["accept"],
            *tm, lens, eps_lowrank=_elr(p)))

    @jax.jit
    def norm_f(p, x):
        tm = crit._transition_matrices_dst(p, N)
        return jnp.sum(fact.backoff_dst_norm(x, *tm, lens,
                                             eps_lowrank=_elr(p)))

    out = {}
    for name, fn in (("score", score_f), ("norm", norm_f)):
        g_fn = jax.jit(jax.grad(fn, argnums=(0, 1)))
        ms_f = timed(lambda: fn(params, inputs))
        ms_fb = timed(lambda: g_fn(params, inputs)[1])
        out[name] = {"fwd": ms_f, "fwd_bwd": ms_fb,
                     "bwd_over_fwd": (ms_fb - ms_f) / ms_f}
        print(f"[{name}] fwd={ms_f:.3f} fwd+bwd={ms_fb:.3f} ms "
              f"(bwd/fwd={(ms_fb - ms_f) / ms_f:.2f})", flush=True)
    with open("/tmp/drive_backoff_split.json", "w") as fo:
        json.dump(out, fo, indent=1)
    print("DRIVE_OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "split":
        split()
    else:
        main()
