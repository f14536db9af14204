"""Chip drive: dense_ngram_norm (shared-K scan) A/B under
GTN_FACTORED_VJP at the ngram-2 protocol shape [32, 250, 80], plus the
FULL ngram-2 loss with a norm-only revert, to decide the norm's gate."""
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

    B, T, N = 32, 250, 80
    rng = np.random.RandomState(0)
    em = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    ws = jnp.asarray(rng.randn(N).astype(np.float32) * 0.3)
    W = jnp.asarray(rng.randn(N, N).astype(np.float32) * 0.3)
    we = jnp.asarray(rng.randn(N).astype(np.float32) * 0.3)

    @jax.jit
    def fwd_bwd(e, a, b, c):
        return jax.value_and_grad(
            lambda e, a, b, c: jnp.sum(fact.dense_ngram_norm(e, a, b, c)),
            argnums=(0, 1, 2, 3))(e, a, b, c)

    out = {}
    for impl in ("auto", "off"):
        fact._VJP_IMPL = impl
        jax.clear_caches()
        v, g = fwd_bwd(em, ws, W, we)
        ms = timed(lambda: fwd_bwd(em, ws, W, we)[0])
        out[f"norm_fwdbwd_{impl}"] = ms
        print(f"[norm {impl}] fwd+bwd={ms:.3f} ms", flush=True)
    with open("/tmp/drive_norm.json", "w") as f:
        json.dump({"dense_ngram_norm_protocol": out}, f, indent=1)
    print("DRIVE_OK", flush=True)


if __name__ == "__main__":
    main()
