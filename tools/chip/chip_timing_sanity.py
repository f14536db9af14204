"""Ground-truth the train-step timing methodology on the real chip.

SCALING_r02.json's chip section reported achieved_tflops above any
public TPU v5-family peak, which means either the XLA cost-analysis
flops or the chained-dispatch timing is wrong on this stack.  This
script separates the two:

  1. chained block_until_ready timing (the benchmark's method) at
     iters in {5, 20, 80} — if the method is sound, wall time scales
     linearly with iters;
  2. the same loop closed by ONE device->host readback (float(loss)),
     which cannot complete before the chain has truly finished — the
     readback is issued only after all timed work so the ~28 ms axon
     readback penalty amortizes over the iterations;
  3. reports per-step ms for both and their ratio.

Run LAST in a chip session: the readback in (2) poisons subsequent
block_until_ready latency for the process (CLAUDE.md gotcha #4).
"""

import sys
import time


sys.path.insert(0, "/root/repo")

import jax

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

from benchmarks.scaling_benchmark import _flagship_step, _step_flops


def chained(step, params, xs, prepared, iters):
    """Returns (seconds, live_params).  The step DONATES params: callers
    must thread the returned params into the next measurement — reusing
    the consumed originals executes on donated buffers, which chained
    block_until_ready does NOT surface on this stack (the executions
    fail async and the 'timing' measures garbage) but any readback does
    (INVALID_ARGUMENT) — itself evidence the chained timer is broken
    here."""
    key = jax.random.PRNGKey(1)
    p = params
    for _ in range(3):
        p, loss, _ = step(p, xs, prepared, key, 1.0)
    jax.block_until_ready(loss)
    start = time.perf_counter()
    for _ in range(iters):
        p, loss, _ = step(p, xs, prepared, key, 1.0)
    jax.block_until_ready(loss)
    return time.perf_counter() - start, p


def with_readback(step, params, xs, prepared, iters):
    """Returns (seconds, live_params); see ``chained`` on donation."""
    key = jax.random.PRNGKey(1)
    p = params
    for _ in range(3):
        p, loss, _ = step(p, xs, prepared, key, 1.0)
    float(loss)  # absorb the first (poisoning, ~3 s) readback untimed
    start = time.perf_counter()
    for _ in range(iters):
        p, loss, _ = step(p, xs, prepared, key, 1.0)
    _ = float(loss)  # ground truth: value must exist on the host
    return time.perf_counter() - start, p


def main():
    local_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    step, params, x, prepared, B = _flagship_step(local_batch, 1)
    import jax.numpy as jnp

    xs = jnp.asarray(x)
    flops = _step_flops(step, params, xs, prepared)
    print(f"B={B} flops/step={flops}")

    print("-- chained block_until_ready --")
    for iters in (5, 20, 80):
        t, params = chained(step, params, xs, prepared, iters)
        ms = t / iters * 1e3
        tf = (flops / (t / iters)) / 1e12 if flops else float("nan")
        print(f"iters={iters:3d}: {ms:8.3f} ms/step  ({tf:8.2f} TFLOP/s)")

    print("-- readback-closed (ground truth; poisons the process) --")
    for iters in (20, 80, 200):
        # the axon transfer path can intermittently fail a readback with
        # a generic InvalidArgument; treat each measurement as
        # independent so one flake doesn't kill the whole sanity pass
        try:
            t, params = with_readback(step, params, xs, prepared, iters)
        except Exception as e:  # pragma: no cover - tunnel flake
            print(f"iters={iters:3d}: readback FAILED "
                  f"({type(e).__name__}: {e})")
            continue
        ms = t / iters * 1e3
        tf = (flops / (t / iters)) / 1e12 if flops else float("nan")
        print(f"iters={iters:3d}: {ms:8.3f} ms/step  ({tf:8.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
