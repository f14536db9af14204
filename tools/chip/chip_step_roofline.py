"""Whole-step roofline + fused-steps measurement for the flagship
(VERDICT r3 #1 supporting evidence).

Prints, readback-closed on the real chip:
  * XLA cost-analysis flops AND bytes accessed for the B=64 train step;
  * analytic attainable step time (flagship_roofline.
    analytic_step_attainable: FLOP floor at eff=1 vs unavoidable-traffic
    HBM floor) vs the measured step -> step_vs_roofline_attainable;
    cost_analysis bytes recorded as DIAGNOSTIC ONLY (gotcha 9);
  * K=8 fused steps (lax.scan inside one executable) vs K dispatches —
    quantifies the per-dispatch gap the fused path removes.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax
import jax.numpy as jnp

from scaling_benchmark import _flagship_step, measure_matmul_peak
from flagship_roofline import measure_hbm_bw
from __graft_entry__ import _flagship
from gtn_applications_tpu.train import make_fused_train_steps

B = 64
out = {"metric": "step_roofline", "batch": B}

peak = measure_matmul_peak(jnp.float32)
bw = measure_hbm_bw()
out["measured_matmul_tflops_fp32"] = round(peak, 2)
out["measured_hbm_gbps"] = round(bw, 1)
print(f"peaks: {peak:.1f} TF {bw:.0f} GB/s", file=sys.stderr, flush=True)

step, params, x, prepared, _ = _flagship_step(B, 1)
xs = jnp.asarray(x)
key = jax.random.PRNGKey(1)

# analytic step attainable: the per-layer activation-traffic model
# (flagship_roofline.run_layers), summed with the 3x backward factor.
# cost_analysis bytes are recorded for diagnostics ONLY — they count
# pre-fusion per-op operands (~3x real traffic, CLAUDE.md gotcha 9)
# and are NOT a roofline denominator (round-4's impossible
# attainable-10.8-vs-measured-4.0 row came from exactly that).
from flagship_roofline import analytic_step_attainable, layer_specs

model, _criterion = _flagship()
specs = layer_specs(B, 64, 128, model.depth, model.tds_groups,
                    tuple(model.kernel_size), model.output_size)
params_bytes = 4 * sum(
    int(np.prod(l.shape))
    for l in jax.tree_util.tree_leaves(params.get("model", params))
)
roof = analytic_step_attainable(specs, peak, bw, params_bytes)
out.update(roof)

lowered = step.lower(params, xs, prepared, key, 1.0)
cost = lowered.compile().cost_analysis()
if isinstance(cost, (list, tuple)):
    cost = cost[0]
out["flops_per_step"] = float(cost.get("flops", 0.0))
out["bytes_accessed_per_step_DIAGNOSTIC_ONLY"] = float(
    cost.get("bytes accessed", 0.0))
att = roof["attainable_ms"] / 1e3

# measured step, readback-closed
p = params
for _ in range(3):
    p, loss, _ = step(p, xs, prepared, key, 1.0)
float(loss)
start = time.perf_counter()
for _ in range(200):
    p, loss, _ = step(p, xs, prepared, key, 1.0)
float(loss)
t_step = (time.perf_counter() - start) / 200
out["step_ms"] = round(t_step * 1e3, 4)
out["step_vs_roofline_attainable"] = round(att / t_step, 4)
print(f"step {t_step*1e3:.3f} ms, attainable {att*1e3:.3f} ms "
      f"({out['attainable_bound']}), ratio {att/t_step:.2f}",
      file=sys.stderr, flush=True)

# fused K steps in one executable
K = 8
model, criterion = _flagship()
rng = np.random.RandomState(0)
xk = jnp.asarray(rng.randn(K, B, 64, 128).astype(np.float32))
prep_k = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(jnp.asarray(a)[None],
                               (K,) + np.asarray(a).shape)
    if hasattr(a, "shape") else a,
    prepared,
)
fused = make_fused_train_steps(model, criterion, 0.01, 0.01,
                               max_grad_norm=5.0, num_steps=K)
pf = {"model": model.init(jax.random.PRNGKey(0), xk[0, :1]),
      "criterion": criterion.init_params()}
for _ in range(2):
    pf, loss = fused(pf, xk, prep_k, key, 1.0)
float(loss)
start = time.perf_counter()
for _ in range(max(200 // K, 20)):
    pf, loss = fused(pf, xk, prep_k, key, 1.0)
float(loss)
t_fused = (time.perf_counter() - start) / max(200 // K, 20) / K
out["fused_k"] = K
out["fused_step_ms"] = round(t_fused * 1e3, 4)
out["fused_speedup"] = round(t_step / t_fused, 4)
out["fused_vs_roofline_attainable"] = round(att / t_fused, 4)

print(json.dumps(out))
