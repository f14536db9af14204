"""On-chip verification + timing for the whole-scan sparse kernels.

Phase 1 (correctness, Mosaic vs per-step): transducer fwd+bwd diff at
word-decomps-like scale, whole vs step; viterbi label parity.
Phase 2 (timing): ngram0 fwd+bwd step vs whole; word-decomps fwd+bwd.

All timings are readback-free until the end (axon gotcha #4).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

import random
from gtn_applications_tpu.criterions.transducer import Transducer
from gtn_applications_tpu.ops import sparse


def make_word_decomps(B=8, T=100, L=15, ntok=1000):
    rng = random.Random(0)
    nprng = np.random.RandomState(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz'-"
    toks = {c for c in alphabet}
    while len(toks) < ntok:
        toks.add("".join(rng.choice(alphabet)
                         for _ in range(rng.randint(2, 8))))
    tokens = sorted(toks)
    graphemes = sorted(set(c for t in tokens for c in t))
    g2i = {t: i for i, t in enumerate(graphemes)}
    N = len(tokens) + 1
    inputs = jnp.asarray(nprng.randn(B, T, N).astype(np.float32))
    targets = []
    for _ in range(B):
        pieces = (rng.choice(tokens) for _ in range(L))
        targets.append([g2i[l] for wp in pieces for l in wp])
    crit = Transducer(tokens, g2i, blank="optional", allow_repeats=False,
                      reduction="mean")
    return crit, inputs, targets


def run(impl, crit, inputs, prepared):
    sparse._SCAN_IMPL = impl

    @jax.jit
    def fwd_bwd(x, prep):
        return jax.value_and_grad(lambda x: crit.loss({}, x, prep))(x)

    v, g = fwd_bwd(inputs, prepared)
    v.block_until_ready()
    # timing: async dispatch, sync once at the end
    n = 20
    for _ in range(5):
        v2, g2 = fwd_bwd(inputs, prepared)
    g2.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        v2, g2 = fwd_bwd(inputs, prepared)
    g2.block_until_ready()
    ms = (time.perf_counter() - t0) / n * 1000
    return v, g, ms


def main():
    crit, inputs, targets = make_word_decomps()
    prepared = crit.prepare(targets)

    v_step, g_step, ms_step = run("step", crit, inputs, prepared)
    v_whole, g_whole, ms_whole = run("whole", crit, inputs, prepared)
    dv = abs(float(v_step) - float(v_whole))
    dg = float(jnp.max(jnp.abs(g_step - g_whole)))
    print(f"word-decomps fwd+bwd: step {ms_step:.3f} ms  whole "
          f"{ms_whole:.3f} ms  |dloss|={dv:.2e} max|dgrad|={dg:.2e}",
          flush=True)
    assert dv < 5e-3 and dg < 5e-3, (dv, dg)

    # --- ngram1 variant: alignment + normalizer tables ------------------
    N, T, L, B = 81, 250, 44, 32
    tokens = [(i,) for i in range(N)]
    g2i = {i: i for i in range(N)}
    rng = np.random.RandomState(0)
    inputs2 = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    targets2 = [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    crit2 = Transducer(tokens, g2i, ngram=1, blank="none", reduction="mean")
    prep2 = crit2.prepare(targets2)
    p2 = crit2.init_params()

    def run2(impl):
        sparse._SCAN_IMPL = impl

        @jax.jit
        def fb(p, x, prep):
            return jax.value_and_grad(
                lambda p, x: crit2.loss(p, x, prep), argnums=(0, 1))(p, x)

        v, g = fb(p2, inputs2, prep2)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(20):
            v, g = fb(p2, inputs2, prep2)
        jax.block_until_ready(g)
        ms = (time.perf_counter() - t0) / 20 * 1000
        return v, g, ms

    v1, g1, ms1 = run2("step")
    v2, g2, ms2 = run2("whole")
    dv = abs(float(v1) - float(v2))
    dgt = float(jnp.max(jnp.abs(g1[0]["transitions"] - g2[0]["transitions"])))
    dge = float(jnp.max(jnp.abs(g1[1] - g2[1])))
    print(f"ngram1 fwd+bwd: step {ms1:.3f} ms  whole {ms2:.3f} ms  "
          f"|dloss|={dv:.2e} max|dgrad_trans|={dgt:.2e} "
          f"max|dgrad_em|={dge:.2e}", flush=True)
    assert dv < 5e-3 and dgt < 5e-3 and dge < 5e-3, (dv, dgt, dge)

    # --- whole-scan viterbi decode parity + timing ----------------------
    p2b = {"transitions": p2["transitions"] + jnp.asarray(
        rng.randn(*p2["transitions"].shape).astype(np.float32) * 0.3)}
    for impl in ("step", "whole"):
        sparse._VIT_IMPL = impl
        if hasattr(crit2, "_decode_cache"):
            del crit2._decode_cache
        t0 = time.perf_counter()
        out = crit2.viterbi(inputs2, p2b)
        ms = (time.perf_counter() - t0) * 1000
        print(f"viterbi[{impl}] first-call {ms:.1f} ms "
              f"(incl compile)", flush=True)
        if impl == "step":
            ref = out
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # steady-state decode timing
    for impl in ("step", "whole"):
        sparse._VIT_IMPL = impl
        if hasattr(crit2, "_decode_cache"):
            del crit2._decode_cache
        crit2.viterbi(inputs2, p2b)
        t0 = time.perf_counter()
        for _ in range(5):
            crit2.viterbi(inputs2, p2b)
        ms = (time.perf_counter() - t0) / 5 * 1000
        print(f"viterbi[{impl}] steady {ms:.2f} ms/call", flush=True)
    print("CHIP VERIFY OK", flush=True)


main()
