"""Chip drive: STC dense tier (GTN_STC_DENSE) A/B + parity at the bench
protocol shapes (T=250, L=30, N=80 + star channels, B=32)."""
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
    from gtn_applications_tpu.criterions import stc as stc_mod
    from gtn_applications_tpu.criterions.stc import STC

    B, T, C, L = 32, 250, 80, 30
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    targets = [rng.randint(0, C - 1, size=L).tolist() for _ in range(B)]
    crit = STC(p0=0.5, plast=0.1, thalf=100.0, reduction="mean",
               shift_targets=1)
    prep = crit.prepare(targets)
    assert "dense" in prep

    @jax.jit
    def fwd_bwd(x, prep):
        return jax.value_and_grad(
            lambda x: crit.loss({}, x, prep))(x)

    out = {}
    res = {}
    for impl in ("auto", "off"):
        stc_mod._DENSE_IMPL = impl
        jax.clear_caches()
        v, g = fwd_bwd(inputs, prep)
        ms = timed(lambda: fwd_bwd(inputs, prep)[0])
        res[impl] = (float(v), np.asarray(g), ms)
        print(f"[stc {impl}] loss={float(v):.6f} fwd+bwd={ms:.3f} ms",
              flush=True)
    dl = abs(res["auto"][0] - res["off"][0])
    dg = float(np.max(np.abs(res["auto"][1] - res["off"][1])))
    print(f"[stc diff] dloss={dl:.2e} dgrad={dg:.2e}", flush=True)
    assert dl < 1e-3 and dg < 1e-3
    out["stc"] = {"fwdbwd_dense": res["auto"][2],
                  "fwdbwd_sparse": res["off"][2],
                  "dloss": dl, "dgrad": dg}
    with open("/tmp/drive_stc.json", "w") as f:
        json.dump(out, f, indent=1)
    print("DRIVE_OK", flush=True)


if __name__ == "__main__":
    main()
