"""Profile the ngram-2 transducer step (VERDICT r3 #9): decompose the
6.9 ms headline (bench.py protocol B=32 T=250 L=44 N=80) into the
transition-factored numerator (ops/factored.factored_lattice_score) vs
the dense normalizer (dense_ngram_norm), fwd and fwd+bwd, each timed as
K chained evaluations inside one executable (kills the ~0.3 ms/launch
dispatch floor) plus the full loss readback-closed for ground truth.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gtn_applications_tpu.criterions.transducer import Transducer
from gtn_applications_tpu.ops import factored as F

T, L, N, B = 250, 44, 80, 32
K = 16

rng = np.random.RandomState(0)
tokens = [(i,) for i in range(N)]
crit = Transducer(tokens, {i: i for i in range(N)}, ngram=2,
                  reduction="mean")
x = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
prepared = crit.prepare([rng.randint(0, N, size=L).tolist()
                         for _ in range(B)])
params = crit.init_params()
f = prepared["factored"]
Nc = N  # bench protocol uses blank="none" (the Transducer default)
out = {"metric": "ngram2_profile", "B": B, "T": T, "N": N,
       "S_align": int(np.asarray(f["adj_exp"]).shape[1])}
print("align lattice S =", out["S_align"], file=sys.stderr, flush=True)


def timed_scan(fn, diff_args, with_grad, k=K, iters=8):
    """k chained evals in one executable, readback-closed ms/eval.
    ``fn(*diff_args)``; gradients flow to ALL diff_args (emissions and
    transition rows), matching what the bench's value_and_grad does."""
    if with_grad:
        def one(c, args):
            args = (args[0] + c * 1e-38,) + tuple(args[1:])
            val, g = jax.value_and_grad(
                lambda a: jnp.sum(fn(*a)) * 1e-6)(args)
            return val + sum(jnp.sum(l) * 1e-9
                             for l in jax.tree_util.tree_leaves(g))
    else:
        def one(c, args):
            return jnp.sum(fn(args[0] + c * 1e-38, *args[1:])) * 1e-6

    @jax.jit
    def scan(args):
        def body(c, _):
            return one(c, args), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    o = scan(diff_args)
    float(o)
    start = time.perf_counter()
    for _ in range(iters):
        o = scan(diff_args)
    float(o)
    return (time.perf_counter() - start) / iters / k * 1e3


ws, W, we, we0 = F.ngram_rows(params["transitions"], 2, Nc)

# numerator: alignment lattice under the bigram factor
def numerator(x, ws, W, we):
    return F.factored_lattice_score(
        x, f["adj_exp"], f["lab_oh"], f["start"], f["accept"],
        ws, W, we, None, we0)

num_args = (x, ws, W, we)
out["numerator_fwd_ms"] = round(timed_scan(numerator, num_args, False), 4)
out["numerator_fwd_bwd_ms"] = round(timed_scan(numerator, num_args, True), 4)
print("numerator", out["numerator_fwd_ms"], out["numerator_fwd_bwd_ms"],
      file=sys.stderr, flush=True)

# normalizer: dense bigram lattice
def normalizer(x, ws, W, we):
    return F.dense_ngram_norm(x, ws, W, we, None, we0)

norm_args = (x, ws, W, we)
out["normalizer_fwd_ms"] = round(timed_scan(normalizer, norm_args, False), 4)
out["normalizer_fwd_bwd_ms"] = round(timed_scan(normalizer, norm_args, True), 4)
print("normalizer", out["normalizer_fwd_ms"], out["normalizer_fwd_bwd_ms"],
      file=sys.stderr, flush=True)

# full loss fwd+bwd, readback-closed (bench.py's ground-truth protocol)
fwd_bwd = jax.jit(lambda p, x, prep: jax.value_and_grad(
    lambda p, x: crit.loss(p, x, prep), argnums=(0, 1))(p, x))
v, g = fwd_bwd(params, x, prepared)
float(v)
start = time.perf_counter()
for _ in range(200):
    v, g = fwd_bwd(params, x, prepared)
float(v)
out["full_loss_fwd_bwd_ms"] = round(
    (time.perf_counter() - start) / 200 * 1e3, 4)

# the full loss in-scan too (separates dispatch floor from device time)
out["full_loss_fwd_bwd_scan_ms"] = round(timed_scan(
    lambda x: crit.loss(params, x, prepared), (x,), True), 4)

print(json.dumps(out))
