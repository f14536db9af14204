"""Forced per-step vs whole-scan differential at composed 200wp-LM scale
(~42k arcs) on the real chip: the arc-tiled per-step seg_lse kernel's
design case (the fallback tier must survive exactly the shapes where the
whole-scan gate gives up).  Asserts loss/grad agreement < 5e-3."""
import numpy as np, jax, jax.numpy as jnp, random, time
from gtn_applications_tpu.criterions import transducer as tmod
from gtn_applications_tpu.criterions.transducer import Transducer
from gtn_applications_tpu.ops import sparse
from gtn_applications_tpu.scripts import build_transitions as bt_mod
pyr = random.Random(0); rng = np.random.default_rng(5)
ntok = 200
lines = [[pyr.randrange(ntok) for _ in range(pyr.randint(5,15))] for _ in range(3000)]
counts = bt_mod.count_ngrams(lines, 2, {i:i for i in range(ntok)})
grams = bt_mod.add_blank_grams(bt_mod.prune_ngrams(counts,[0,3]), ntok, "optional")
lm = bt_mod.build_graph(bt_mod.add_self_loops(grams))
tmod._FACTORED_IMPL = "off"
crit = Transducer([(i,) for i in range(ntok)], {i:i for i in range(ntok)},
                  transitions=lm.copy(), blank="optional", reduction="mean")
B,T,L = 8,100,15
prep = crit.prepare([rng.integers(0,ntok,size=L).tolist() for _ in range(B)])
x = jnp.asarray(rng.normal(size=(B,T,ntok+1)).astype(np.float32))
p = {"transitions": jnp.asarray(np.random.default_rng(13).normal(size=(crit.num_transition_arcs,))*0.2, jnp.float32)}
res = {}
for impl in ("whole", "step"):
    sparse._SCAN_IMPL = impl
    f = jax.jit(lambda p,x,prep: jax.value_and_grad(
        lambda p,x: crit.loss(p,x,prep), argnums=(0,1))(p,x))
    t0=time.perf_counter(); v,g = f(p,x,prep); jax.block_until_ready(g)
    print(f"{impl}: compile+run {time.perf_counter()-t0:.1f}s loss={float(v):.5f}", flush=True)
    for _ in range(5): v,g = f(p,x,prep)
    jax.block_until_ready(g)
    t0=time.perf_counter()
    for _ in range(10): v,g = f(p,x,prep)
    jax.block_until_ready(g)
    print(f"{impl}: {(time.perf_counter()-t0)/10*1e3:.2f} ms/iter (chained)", flush=True)
    res[impl] = (float(v), g)
dv = abs(res["whole"][0]-res["step"][0])
dgp = float(jnp.max(jnp.abs(res["whole"][1][0]["transitions"]-res["step"][1][0]["transitions"])))
dge = float(jnp.max(jnp.abs(res["whole"][1][1]-res["step"][1][1])))
print(f"step-vs-whole @42k arcs: |dv|={dv:.2e} |dgp|={dgp:.2e} |dge|={dge:.2e}", flush=True)
assert dv < 5e-3 and dgp < 5e-3 and dge < 5e-3
print("STEP-SCALE DIFF OK", flush=True)
