"""Round-4 verify drive: exercise this round's changes end-to-end on the
real chip through the public package."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gtn_applications_tpu.criterions import CTC, Transducer
from gtn_applications_tpu.models import TDS2d
from gtn_applications_tpu.train import make_fused_train_steps, make_train_step

rng = np.random.RandomState(0)
GROUPS = [
    {"channels": 4, "num_blocks": 1, "stride": [2, 2]},
    {"channels": 16, "num_blocks": 1, "stride": [2, 2]},
]


def model(**kw):
    return TDS2d(input_size=32, output_size=20, depth=4, tds_groups=GROUPS,
                 kernel_size=[5, 7], dropout=0.0, **kw)


x = jnp.asarray(rng.randn(8, 32, 64).astype(np.float32))
params = model().init(jax.random.PRNGKey(0), x)

# 1. single-pass InstanceNorm + model variants agree ON CHIP.
# f32 matmul precision: at the TPU's default bf16 conv precision the
# packed conv's different contraction order diverges ~2^-8 and the
# instance norms amplify it (measured 7.7e-3) — that is precision, not
# math; pin f32 so this checks the math.
with jax.default_matmul_precision("float32"):
    y0 = jax.jit(lambda p, x: model().apply(p, x))(params, x)
    y1 = jax.jit(lambda p, x: model(lane_pack=True).apply(p, x))(params, x)
    y2 = jax.jit(
        lambda p, x: model(conv_layout="dimnums").apply(p, x))(params, x)
d1 = float(jnp.max(jnp.abs(y0 - y1)))
d2 = float(jnp.max(jnp.abs(y0 - y2)))
print(f"model variants on chip (f32): |lane_pack-d|={d1:.2e} "
      f"|dimnums-d|={d2:.2e}")
assert d1 < 1e-3 and d2 < 1e-3, (d1, d2)

# 2. CTC grad posterior property on chip: per-frame row-sums ~ 0
crit = CTC(blank=19)
prep = crit.prepare([[1, 2, 3], [4, 5, 6, 7], [0], [2, 2]] * 2)
logits = jax.jit(lambda p, x: model().apply(p, x))(params, x)
g = jax.jit(jax.grad(lambda l: crit.loss({}, l, prep)))(logits)
rows = float(jnp.max(jnp.abs(jnp.sum(g, axis=2))))
print(f"ctc grad row-sum max: {rows:.2e}")
assert rows < 1e-4, rows

# 3. fused K steps == K sequential steps ON CHIP
crit2 = CTC(blank=19)
K, B = 3, 8
xk = jnp.asarray(rng.randn(K, B, 32, 64).astype(np.float32))
prep2 = crit2.prepare([[1, 2]] * B)
prep_k = jax.tree_util.tree_map(
    lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (K,) + np.asarray(a).shape)
    if hasattr(a, "shape") else a, prep2)
p0 = {"model": model().init(jax.random.PRNGKey(1), xk[0]),
      "criterion": crit2.init_params()}
plain = make_train_step(model(), crit2, 0.05, 0.05, max_grad_norm=5.0)
fused = make_fused_train_steps(model(), crit2, 0.05, 0.05,
                               max_grad_norm=5.0, num_steps=K)
root = jax.random.PRNGKey(7)
keys = jax.random.split(root, K)
p_seq = jax.tree_util.tree_map(jnp.copy, p0)
for i in range(K):
    p_seq, loss, _ = plain(p_seq, xk[i], prep2, keys[i], 1.0)
p_f, mloss = fused(jax.tree_util.tree_map(jnp.copy, p0), xk, prep_k, root, 1.0)
dmax = max(float(jnp.max(jnp.abs(a - b)))
           for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                           jax.tree_util.tree_leaves(p_f)))
print(f"fused-vs-sequential params max|d| on chip: {dmax:.2e}")
assert dmax < 1e-4, dmax

# 4. edge shapes through the transducer plain path (T=1, empty target)
tok = ["ab", "a", "b"]
tcrit = Transducer(tok, {"a": 0, "b": 1}, blank="optional",
                   allow_repeats=False, reduction="none")
te = jnp.asarray(rng.randn(2, 1, 4).astype(np.float32))
tp = tcrit.prepare([[0], []])
tl = jax.jit(lambda x, p: tcrit.loss({}, x, p))(te, tp)
vals = np.asarray(tl)
print("edge losses (T=1 target 'a', empty):", vals)
assert np.all(np.isfinite(vals) | (vals > 1e20)), vals

print("DRIVE OK")
