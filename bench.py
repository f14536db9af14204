#!/usr/bin/env python
"""Headline benchmark: CTC fwd+bwd at the reference protocol shapes.

Protocol from /root/reference/benchmarks/ctc_benchmark.py:17-31: T=250,
L=44, N=80, B=32, ms/iteration with warmup.  The baseline is the reference
implementation's own fallback path — torch.nn.functional.ctc_loss on CPU
(criterions/ctc.py:109-121 with use_pt=True) — measured here on identical
shapes.  vs_baseline = baseline_ms / tpu_ms (>1 means faster than
baseline).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

T, L, N, B = 250, 44, 80, 32
WARMUP, ITERS = 5, 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.common import pad_targets
    from gtn_applications_tpu.ops import lattice

    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    targets = [rng.randint(0, N - 1, size=L).tolist() for _ in range(B)]
    tg, ln = pad_targets(targets)

    # NOTE: every device array is a jit ARGUMENT — closed-over constants
    # are re-uploaded per call on this TPU stack (~29 ms penalty).
    @jax.jit
    def fwd_bwd(x, tg, ln):
        def f(x):
            lp = jax.nn.log_softmax(x, 2)
            return lattice.ctc_loss(lp, tg, ln, N - 1, "mean")
        loss, grad = jax.value_and_grad(f)(x)
        return loss, grad

    for _ in range(WARMUP):
        loss, grad = fwd_bwd(inputs, tg, ln)
        jax.block_until_ready(grad)
    start = time.perf_counter()
    for _ in range(ITERS):
        loss, grad = fwd_bwd(inputs, tg, ln)
        jax.block_until_ready(grad)
    ms = (time.perf_counter() - start) / ITERS * 1000
    log(f"tpu ctc fwd+bwd: {ms:.3f} ms/iter (loss={float(loss):.4f})")
    return ms


def bench_torch_cpu():
    try:
        import torch
    except ImportError:
        return None
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(B, T, N).astype(np.float32), requires_grad=True)
    targets = torch.tensor(
        rng.randint(0, N - 1, size=(B, L)), dtype=torch.long
    )
    input_lengths = torch.full((B,), T, dtype=torch.long)
    target_lengths = torch.full((B,), L, dtype=torch.long)

    def fwd_bwd():
        lp = torch.nn.functional.log_softmax(x, dim=2).permute(1, 0, 2)
        loss = torch.nn.functional.ctc_loss(
            lp, targets, input_lengths, target_lengths, blank=N - 1,
            zero_infinity=True,
        )
        loss.backward()
        x.grad = None
        return loss

    for _ in range(WARMUP):
        fwd_bwd()
    start = time.perf_counter()
    for _ in range(ITERS):
        loss = fwd_bwd()
    ms = (time.perf_counter() - start) / ITERS * 1000
    log(f"torch-cpu ctc fwd+bwd: {ms:.3f} ms/iter (loss={float(loss):.4f})")
    return ms


def main():
    tpu_ms = bench_tpu()
    base_ms = bench_torch_cpu()
    vs = (base_ms / tpu_ms) if base_ms else 0.0
    print(
        json.dumps(
            {
                "metric": "ctc_fwd_bwd_ms_per_iter_B32_T250_L44_N80",
                "value": round(tpu_ms, 3),
                "unit": "ms",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
