"""Chip drive: ASG scans A/B (GTN_FACTORED_VJP) at the bench protocol
(B=32, T=250, L=44, N=80 + replabel channels)."""
import json, sys, time
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
    from gtn_applications_tpu.ops import factored as fact
    from gtn_applications_tpu.ops import lattice

    B, T, C, L = 32, 250, 80, 44
    rng = np.random.RandomState(0)
    em = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    trans = jnp.asarray(rng.randn(C + 1, C).astype(np.float32) * 0.3)
    targets = jnp.asarray(rng.randint(0, C, size=(B, L)), jnp.int32)
    tlens = jnp.full((B,), L, jnp.int32)

    @jax.jit
    def fwd_bwd(e, w):
        return jax.value_and_grad(
            lambda e, w: lattice.asg_loss(e, w, targets, tlens),
            argnums=(0, 1))(e, w)

    res = {}
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        jax.clear_caches()
        v, g = fwd_bwd(em, trans)
        ms = timed(lambda: fwd_bwd(em, trans)[0])
        res[impl] = (float(v), np.asarray(g[0]), np.asarray(g[1]), ms)
        print(f"[asg {impl}] loss={float(v):.6f} fwd+bwd={ms:.3f} ms",
              flush=True)
    dl = abs(res["auto"][0] - res["off"][0])
    dg = max(float(np.max(np.abs(res["auto"][i] - res["off"][i])))
             for i in (1, 2))
    print(f"[asg diff] dloss={dl:.2e} dgrad={dg:.2e}", flush=True)
    with open("/tmp/drive_asg.json", "w") as f:
        json.dump({"asg_protocol": {
            "fwdbwd_vjp": res["auto"][3], "fwdbwd_off": res["off"][3],
            "dloss": dl, "dgrad": dg}}, f, indent=1)
    print("DRIVE_OK", flush=True)


if __name__ == "__main__":
    main()
