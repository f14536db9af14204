"""Readback-closed breakdown of the ngram0 transducer at bench shapes.

Separates forward-only vs fwd+bwd for the whole-scan (union skeleton)
and per-step paths, so kernel time attributes to the right half before
optimizing.  Run on the chip (axon backend); all timings readback-closed
(one scalar transfer amortized over iters).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from gtn_applications_tpu.criterions.transducer import Transducer
from gtn_applications_tpu.ops import sparse

N, T, L, B = 80, 250, 44, 32
tokens = [(i,) for i in range(N)]
crit = Transducer(tokens, {i: i for i in range(N)}, blank="optional",
                  allow_repeats=False, reduction="mean")
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T, N + 1).astype(np.float32))
prep = crit.prepare([rng.randint(0, N, size=L).tolist() for _ in range(B)])
print("union skeleton:", np.asarray(prep["table"].src).ndim == 1, flush=True)


def rb_time(fn, *args, iters=200):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()  # compile
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).block_until_ready()
    v = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - start) / iters * 1000, v


results = {}
for impl in ("whole", "step"):
    sparse._SCAN_IMPL = impl
    fwd = jax.jit(lambda x, p: crit.loss({}, x, p))
    fb = jax.jit(lambda x, p: jax.value_and_grad(
        lambda x: crit.loss({}, x, p))(x))
    ms_f, v = rb_time(fwd, x, prep)
    ms_fb, _ = rb_time(fb, x, prep)
    results[impl] = (ms_f, ms_fb)
    print(f"{impl}: fwd {ms_f:.3f} ms  fwd+bwd {ms_fb:.3f} ms  "
          f"(bwd ~{ms_fb - ms_f:.3f})  loss {v:.4f}", flush=True)

print("BREAKDOWN OK", flush=True)
