"""Chip drive: factored custom-VJP (GTN_FACTORED_VJP) differential + timing.

Runs the ngram-2 ASG-style protocol (T=250, L=44, N=80+1, B=32) and the
word-decomps-style plain dense-adjacency path through BOTH settings of the
new gate, asserts loss/grad parity on the real chip, then times
readback-closed fwd and fwd+bwd for each.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

T, L, N, B = 250, 44, 80, 32


def timed(fn, warmup=3, iters=100):
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


def main():
    from gtn_applications_tpu.criterions.transducer import Transducer
    from gtn_applications_tpu.ops import factored as fact

    out = {}
    tokens = [(i,) for i in range(N)]
    crit = Transducer(tokens, {i: i for i in range(N)}, ngram=2,
                      reduction="mean")
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    targets = [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    prepared = crit.prepare(targets)
    assert "factored" in prepared
    params = crit.init_params()
    params = {"transitions": jnp.asarray(
        rng.randn(*np.asarray(params["transitions"]).shape).astype(np.float32)
    ) * 0.3}

    @jax.jit
    def fwd(p, x, prep):
        return crit.loss(p, x, prep)

    @jax.jit
    def fwd_bwd(p, x, prep):
        return jax.value_and_grad(
            lambda p, x: crit.loss(p, x, prep), argnums=(0, 1)
        )(p, x)

    results = {}
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        jax.clear_caches()
        v, g = fwd_bwd(params, inputs, prepared)
        v = float(v)
        gt = np.asarray(g[0]["transitions"])
        gx = np.asarray(g[1])
        ms_fb = timed(lambda: fwd_bwd(params, inputs, prepared)[0])
        ms_f = timed(lambda: fwd(params, inputs, prepared))
        results[impl] = (v, gt, gx, ms_f, ms_fb)
        print(f"[ngram2 {impl}] loss={v:.6f} fwd={ms_f:.3f} ms "
              f"fwd+bwd={ms_fb:.3f} ms", flush=True)

    va, gta, gxa, fa, fba = results["auto"]
    vo, gto, gxo, fo, fbo = results["off"]
    dl = abs(va - vo)
    dgt = float(np.max(np.abs(gta - gto)))
    dgx = float(np.max(np.abs(gxa - gxo)))
    print(f"[ngram2 diff] dloss={dl:.2e} dgrad_trans={dgt:.2e} "
          f"dgrad_em={dgx:.2e}", flush=True)
    assert dl < 1e-3 and dgt < 1e-3 and dgx < 1e-3
    out["ngram2"] = {"fwd_auto": fa, "fwdbwd_auto": fba,
                     "fwd_off": fo, "fwdbwd_off": fbo,
                     "dloss": dl, "dgrad": max(dgt, dgx)}

    # plain dense-adjacency path (transitions=None, the word-decomps
    # regime) at its own protocol-ish shape
    crit2 = Transducer(tokens, {i: i for i in range(N)}, blank="optional",
                       reduction="mean")
    inputs2 = jnp.asarray(rng.randn(B, 100, N + 1).astype(np.float32))
    prep2 = crit2.prepare(
        [rng.randint(0, N, size=15).tolist() for _ in range(B)])
    assert "factored" in prep2 and "factored_plain" in prep2

    @jax.jit
    def fwd_bwd2(x, prep):
        return jax.value_and_grad(
            lambda x: crit2.loss({}, x, prep))(x)

    res2 = {}
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        jax.clear_caches()
        v, g = fwd_bwd2(inputs2, prep2)
        ms_fb = timed(lambda: fwd_bwd2(inputs2, prep2)[0])
        res2[impl] = (float(v), np.asarray(g), ms_fb)
        print(f"[plain {impl}] loss={float(v):.6f} fwd+bwd={ms_fb:.3f} ms",
              flush=True)
    dl2 = abs(res2["auto"][0] - res2["off"][0])
    dg2 = float(np.max(np.abs(res2["auto"][1] - res2["off"][1])))
    print(f"[plain diff] dloss={dl2:.2e} dgrad={dg2:.2e}", flush=True)
    assert dl2 < 1e-3 and dg2 < 1e-3
    out["plain"] = {"fwdbwd_auto": res2["auto"][2],
                    "fwdbwd_off": res2["off"][2],
                    "dloss": dl2, "dgrad": dg2}

    with open("/tmp/drive_vjp.json", "w") as f:
        json.dump(out, f, indent=1)
    print("DRIVE_OK", flush=True)


if __name__ == "__main__":
    main()
