"""On-chip verify + timing for the factored paths and decode kernels.

1. Backoff-factored vs composed at letters scale (the recipe-shaped case
   measured at ~63 ms/iter composed in round 2): values, grads, timing.
2. ASG decode: Pallas backtrace kernel vs XLA walk parity + timing.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

from gtn_applications_tpu.criterions import transducer as tmod
from gtn_applications_tpu.criterions.transducer import Transducer
from gtn_applications_tpu.ops import lattice
from gtn_applications_tpu.wfst import EPSILON, Graph

# --- backoff factored vs composed, letters scale ------------------------
C = 30
rng = np.random.default_rng(0)
g = Graph()
uni = g.add_node(True, True)
for lbl in range(C):
    g.add_node(False, True)
for lbl in range(C):
    g.add_arc(uni, lbl + 1, lbl)
    g.add_arc(lbl + 1, uni, EPSILON)
for _ in range(6 * C):
    a, b = int(rng.integers(0, C)), int(rng.integers(0, C))
    g.add_arc(a + 1, b + 1, b)

toks = [(i,) for i in range(C - 1)]
g2i = {i: i for i in range(C - 1)}
B, T, L = 32, 250, 44
inputs = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
targets = [rng.integers(0, C - 1, size=L).tolist() for _ in range(B)]

results = {}
for mode in ("factored", "composed"):
    tmod._FACTORED_IMPL = "auto" if mode == "factored" else "off"
    crit = Transducer(toks, g2i, transitions=g.copy(), blank="optional",
                      reduction="mean")
    prep = crit.prepare(targets)
    assert ("factored" in prep) == (mode == "factored"), mode
    p = crit.init_params()
    # params must be IDENTICAL across modes: a dedicated, freshly-seeded
    # generator, not the shared `rng` stream (drawing from `rng` inside
    # this loop gave each mode different noise — the "0.28-nat chip
    # divergence" both round-2 sessions chased was exactly that, and it
    # reproduces bit-for-bit on CPU)
    p = {"transitions": p["transitions"] + jnp.asarray(
        np.random.default_rng(7).normal(
            size=(crit.num_transition_arcs,)) * 0.2, jnp.float32)}

    @jax.jit
    def fb(p, x, prep):
        return jax.value_and_grad(
            lambda p, x: crit.loss(p, x, prep), argnums=(0, 1))(p, x)

    v, gr = fb(p, inputs, prep)
    jax.block_until_ready(gr)
    for _ in range(5):
        v, gr = fb(p, inputs, prep)
    jax.block_until_ready(gr)
    t0 = time.perf_counter()
    for _ in range(20):
        v, gr = fb(p, inputs, prep)
    jax.block_until_ready(gr)
    ms = (time.perf_counter() - t0) / 20 * 1000
    results[mode] = (v, gr, ms)
    print(f"backoff ngram2-letters [{mode}]: {ms:.3f} ms/iter", flush=True)

vf, gf, _ = results["factored"]
vg, gg, _ = results["composed"]
print(f"backoff values: factored={float(vf):.6f} composed={float(vg):.6f}",
      flush=True)
dv = abs(float(vf) - float(vg))
dgp = float(jnp.max(jnp.abs(gf[0]["transitions"] - gg[0]["transitions"])))
dge = float(jnp.max(jnp.abs(gf[1] - gg[1])))
print(f"backoff diff: |dv|={dv:.2e} |dgp|={dgp:.2e} |dge|={dge:.2e}",
      flush=True)
assert dv < 5e-3 and dgp < 5e-3 and dge < 5e-3, (dv, dgp, dge)

# --- destination-factored vs composed, wordpiece-LM scale ----------------
# the regime the dst variant exists for: S_c ~ N ~ hundreds; the dense
# [N, S_c, S_c] gate fails, previously falling back to the composed path
import random

from gtn_applications_tpu.scripts import build_transitions as bt_mod

pyr = random.Random(0)
ntok_lm = 200
lm_lines = [
    [pyr.randrange(ntok_lm) for _ in range(pyr.randint(5, 15))]
    for _ in range(3000)
]
counts = bt_mod.count_ngrams(lm_lines, 2, {i: i for i in range(ntok_lm)})
grams = bt_mod.add_blank_grams(
    bt_mod.prune_ngrams(counts, [0, 3]), ntok_lm, "optional"
)
lm_graph = bt_mod.build_graph(bt_mod.add_self_loops(grams))
toks_lm = [(i,) for i in range(ntok_lm)]
g2i_lm = {i: i for i in range(ntok_lm)}
B2, T2, L2 = 8, 100, 15
inputs2 = jnp.asarray(
    rng.normal(size=(B2, T2, ntok_lm + 1)).astype(np.float32)
)
targets2 = [rng.integers(0, ntok_lm, size=L2).tolist() for _ in range(B2)]

results = {}
for mode in ("dst", "composed"):
    tmod._FACTORED_IMPL = "on" if mode == "dst" else "off"
    crit = Transducer(toks_lm, g2i_lm, transitions=lm_graph.copy(),
                      blank="optional", reduction="mean")
    if mode == "dst":
        assert crit._factored_backoff_dst and not crit._factored_backoff
    prep = crit.prepare(targets2)
    assert ("factored" in prep) == (mode == "dst"), mode
    # identical params across modes (see the note in the first loop)
    p = {"transitions": jnp.asarray(
        np.random.default_rng(13).normal(
            size=(crit.num_transition_arcs,)) * 0.2, jnp.float32)}

    @jax.jit
    def fb2(p, x, prep):
        return jax.value_and_grad(
            lambda p, x: crit.loss(p, x, prep), argnums=(0, 1))(p, x)

    v, gr = fb2(p, inputs2, prep)
    jax.block_until_ready(gr)
    for _ in range(3):
        v, gr = fb2(p, inputs2, prep)
    jax.block_until_ready(gr)
    t0 = time.perf_counter()
    for _ in range(10):
        v, gr = fb2(p, inputs2, prep)
    jax.block_until_ready(gr)
    ms = (time.perf_counter() - t0) / 10 * 1000
    results[mode] = (v, gr, ms)
    print(f"backoff 200wp-LM [{mode}]: {ms:.3f} ms/iter", flush=True)

vf, gf, _ = results["dst"]
vg, gg, _ = results["composed"]
dv = abs(float(vf) - float(vg))
dgp = float(jnp.max(jnp.abs(gf[0]["transitions"] - gg[0]["transitions"])))
dge = float(jnp.max(jnp.abs(gf[1] - gg[1])))
print(f"dst-factored diff: |dv|={dv:.2e} |dgp|={dgp:.2e} |dge|={dge:.2e}",
      flush=True)
assert dv < 5e-3 and dgp < 5e-3 and dge < 5e-3, (dv, dgp, dge)

# --- destination-factored decode vs composed-table decode ----------------
crit_dec = Transducer(toks_lm, g2i_lm, transitions=lm_graph.copy(),
                      blank="optional")
p_dec = {"transitions": jnp.asarray(
    rng.normal(size=(crit_dec.num_transition_arcs,)) * 0.3, jnp.float32)}
lens2 = jnp.asarray([T2] * B2, jnp.int32)
dec = {}
for mode, thresh in (("composed", 1 << 60), ("factored", 0)):
    tmod._DECODE_FACTORED_MIN_ARCS = thresh
    crit_dec._decode_dst_cache = None
    out = crit_dec.viterbi(inputs2, p_dec, input_lengths=lens2)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        out = crit_dec.viterbi(inputs2, p_dec, input_lengths=lens2)
    ms = (time.perf_counter() - t0) / 5 * 1000
    dec[mode] = out
    print(f"decode 200wp-LM [{mode}]: {ms:.3f} ms/call", flush=True)
for a, b in zip(dec["composed"], dec["factored"]):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("dst-factored decode parity OK", flush=True)

# --- ASG decode: kernel vs xla backtrace ---------------------------------
N = 80
outputs = jnp.asarray(rng.normal(size=(B, T, N)).astype(np.float32))
trans = jnp.asarray(rng.normal(size=(N + 1, N)).astype(np.float32) * 0.3)
lens = jnp.asarray([T] * B, jnp.int32)
vjit = jax.jit(lattice.asg_viterbi, static_argnames=("backtrace",))
outs = {}
for bt in ("kernel", "xla"):
    path, score = vjit(outputs, trans, lens, bt)
    jax.block_until_ready(path)
    t0 = time.perf_counter()
    for _ in range(10):
        path, score = vjit(outputs, trans, lens, bt)
    jax.block_until_ready(path)
    ms = (time.perf_counter() - t0) / 10 * 1000
    outs[bt] = np.asarray(path)
    print(f"asg viterbi [{bt}]: {ms:.3f} ms/call", flush=True)
np.testing.assert_array_equal(outs["kernel"], outs["xla"])
print("FACTORED CHIP VERIFY OK", flush=True)
