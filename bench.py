#!/usr/bin/env python
"""Headline benchmark: CTC fwd+bwd at the reference protocol shapes.

Protocol from /root/reference/benchmarks/ctc_benchmark.py:17-31: T=250,
L=44, N=80, B=32, ms/iteration with warmup.

Comparators (both measured here on identical shapes, host CPU):

* PRIMARY (``vs_baseline``): the reference's actual engine algorithm —
  per-sample emission-graph ∘ CTC-acceptor composition, log-semiring
  forward_score, graph autodiff, C++ thread pool over the batch
  (reference criterions/ctc.py:31-94 delegating to GTN).  Re-implemented
  natively in native/graph_compiler.cc (tw_ctc_engine_batch) and
  differential-tested against the JAX lattice in tests/test_native.py.
* secondary (``vs_torch_cpu``): torch.nn.functional.ctc_loss, the
  reference's use_pt fallback path (criterions/ctc.py:109-121).

Also reports TPU fwd+bwd ms for ASG (reference benchmarks/
asg_benchmark.py shapes) and the ngram=0 transducer (reference
benchmarks/transducer_benchmark.py:56-119 shapes) in the same JSON line.

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


def _time(fn, iters=ITERS, warmup=WARMUP):
    for _ in range(warmup):
        fn()
    start = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - start) / iters * 1000


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

    loss = None

    def run():
        nonlocal loss
        loss, grad = fwd_bwd(inputs, tg, ln)
        jax.block_until_ready(grad)

    ms = _time(run)
    # NOTE: do NOT read loss back here — the first device->host readback
    # permanently degrades block_until_ready to ~28 ms/call on this stack,
    # which would poison the ASG/transducer timing sections that follow.
    # main() logs the loss after all device timing is done.
    log(f"tpu ctc fwd+bwd: {ms:.3f} ms/iter")

    def readback_closed(iters=200):
        # ground-truth re-measure, run LAST (after the poisoning readback):
        # a device->host value transfer cannot complete before the chained
        # dispatches have; one readback amortized over `iters` bounds the
        # overhead at ~0.15 ms/iter
        last = None
        start = time.perf_counter()
        for _ in range(iters):
            last, _ = fwd_bwd(inputs, tg, ln)
        float(last)
        return (time.perf_counter() - start) / iters * 1000

    return ms, loss, readback_closed


def bench_asg_tpu():
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions import ASG

    rng = np.random.RandomState(0)
    crit = ASG(num_classes=N, num_replabels=0, use_garbage=False)
    inputs = jnp.asarray(rng.randn(B, T, crit.N).astype(np.float32))
    prepared = crit.prepare(
        [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    )
    params = crit.init_params()

    @jax.jit
    def fwd_bwd(p, x, prep):
        return jax.value_and_grad(
            lambda p, x: crit.loss(p, x, prep), argnums=(0, 1)
        )(p, x)

    def run():
        _, grads = fwd_bwd(params, inputs, prepared)
        jax.block_until_ready(grads[1])

    ms = _time(run)
    log(f"tpu asg fwd+bwd: {ms:.3f} ms/iter")

    def readback_closed(iters=200):
        last = None
        start = time.perf_counter()
        for _ in range(iters):
            last, _ = fwd_bwd(params, inputs, prepared)
        float(last)
        return (time.perf_counter() - start) / iters * 1000

    return ms, readback_closed


def bench_transducer_tpu():
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer

    # ngram-0 CTC-style protocol: 81 emission channels (the reference's
    # N=81) = 80 singleton tokens + the optional blank, so the blank
    # channel actually exists on both the TPU path and the graph-engine
    # comparator (the reference's own harness labels blank out of range,
    # which its composition silently drops).
    tokens = [(i,) for i in range(N)]
    crit = Transducer(
        tokens, {i: i for i in range(N)}, blank="optional",
        allow_repeats=False, reduction="mean",
    )
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, N + 1).astype(np.float32))
    prepared = crit.prepare(
        [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    )

    @jax.jit
    def fwd_bwd(x, prep):
        return jax.value_and_grad(lambda x: crit.loss({}, x, prep))(x)

    def run():
        _, grad = fwd_bwd(inputs, prepared)
        jax.block_until_ready(grad)

    ms = _time(run)
    log(f"tpu transducer ngram0 fwd+bwd: {ms:.3f} ms/iter")

    def readback_closed(iters=200):
        last = None
        start = time.perf_counter()
        for _ in range(iters):
            last, _ = fwd_bwd(inputs, prepared)
        float(last)
        return (time.perf_counter() - start) / iters * 1000

    return ms, readback_closed


def bench_transducer_ngram2_tpu():
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer

    # ngram-2 ASG-style protocol (reference transducer_benchmark.py:56-119
    # shapes): full bigram transitions with learnable arc weights.  Scores
    # through the transition-factored dense path (ops/factored.py): the
    # alignment lattice never composes with the transition graph.
    tokens = [(i,) for i in range(N)]
    crit = Transducer(
        tokens, {i: i for i in range(N)}, ngram=2, reduction="mean",
    )
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    prepared = crit.prepare(
        [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    )
    params = crit.init_params()

    @jax.jit
    def fwd_bwd(p, x, prep):
        return jax.value_and_grad(
            lambda p, x: crit.loss(p, x, prep), argnums=(0, 1)
        )(p, x)

    def run():
        _, grads = fwd_bwd(params, inputs, prepared)
        jax.block_until_ready(grads[1])

    ms = _time(run)
    log(f"tpu transducer ngram2 fwd+bwd: {ms:.3f} ms/iter")

    def readback_closed(iters=200):
        last = None
        start = time.perf_counter()
        for _ in range(iters):
            last, _ = fwd_bwd(params, inputs, prepared)
        float(last)
        return (time.perf_counter() - start) / iters * 1000

    return ms, readback_closed


def bench_graph_engine_cpu():
    """The honest denominator: the reference's own algorithm, natively."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.wfst import native

    if not native.available():
        return None
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, N).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(x), 2))
    targets = [rng.randint(0, N - 1, size=L).tolist() for _ in range(B)]

    def run():
        native.ctc_engine_batch(lp, targets, blank=N - 1)

    ms = _time(run, iters=10, warmup=2)
    log(f"graph-engine-cpu ctc fwd+bwd: {ms:.3f} ms/iter")
    return ms


def bench_asg_graph_engine_cpu():
    """Same-algorithm ASG denominator (free-energy + force-aligned graph
    compositions with autodiff, threaded) at the reference protocol."""
    from gtn_applications_tpu.wfst import native

    if not native.available():
        return None
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, N).astype(np.float32)
    trans = np.zeros((N + 1, N), np.float32)
    targets = [rng.randint(0, N, size=L).tolist() for _ in range(B)]

    def run():
        native.asg_engine_batch(x, targets, trans)

    ms = _time(run, iters=3, warmup=1)
    log(f"graph-engine-cpu asg fwd+bwd: {ms:.3f} ms/iter")
    return ms


def bench_transducer_graph_engine_cpu():
    """Same-algorithm transducer denominator (alignment-graph compose +
    autodiff, threaded) at the ngram-0 protocol shapes."""
    import jax
    import jax.numpy as jnp

    from gtn_applications_tpu.criterions.transducer import Transducer
    from gtn_applications_tpu.wfst import native

    if not native.available():
        return None
    crit = Transducer(
        [(i,) for i in range(N)], {i: i for i in range(N)},
        blank="optional", allow_repeats=False, reduction="mean",
    )
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, N + 1).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(x), 2))
    targets = [rng.randint(0, N, size=L).tolist() for _ in range(B)]

    def run():
        native.transducer_engine_batch(lp, crit.lexicon, crit.tokens, targets)

    ms = _time(run, iters=3, warmup=1)
    log(f"graph-engine-cpu transducer ngram0 fwd+bwd: {ms:.3f} ms/iter")
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

    ms = _time(fwd_bwd)
    log(f"torch-cpu ctc fwd+bwd: {ms:.3f} ms/iter")
    return ms


def main():
    def soft(fn, label):
        # secondary metrics must not take down the headline JSON line
        try:
            return fn()
        except Exception as e:  # pragma: no cover - defensive
            log(f"{label} FAILED: {type(e).__name__}: {e}")
            return None

    tpu_ms, ctc_loss, ctc_readback_closed = bench_tpu()
    asg = soft(bench_asg_tpu, "asg") or (None, None)
    trans = soft(bench_transducer_tpu, "transducer ngram0") or (None, None)
    trans2 = soft(
        bench_transducer_ngram2_tpu, "transducer ngram2"
    ) or (None, None)
    asg_disp_ms, asg_rb = asg
    trans_disp_ms, trans_rb = trans
    trans2_disp_ms, trans2_rb = trans2
    log(f"tpu ctc loss sanity: {float(ctc_loss):.4f}")  # first readback HERE
    # ground-truth timing AFTER the poisoning readback: a value transfer
    # cannot complete before the chained device work has.  The chained
    # (dispatch) numbers above can return early on this stack
    # (tools/chip/chip_timing_sanity.py), so every primary ms field below
    # is the readback-closed measurement, with the dispatch number kept
    # alongside as *_dispatch_ms.
    rb_ms = soft(ctc_readback_closed, "ctc readback-closed timing")
    if rb_ms:
        log(f"tpu ctc fwd+bwd readback-closed: {rb_ms:.3f} ms/iter")
    asg_ms = (asg_rb and soft(asg_rb, "asg readback-closed")) or asg_disp_ms
    trans_ms = (
        trans_rb and soft(trans_rb, "transducer ngram0 readback-closed")
    ) or trans_disp_ms
    trans2_ms = (
        trans2_rb and soft(trans2_rb, "transducer ngram2 readback-closed")
    ) or trans2_disp_ms
    ctc_ms = rb_ms or tpu_ms
    engine_ms = bench_graph_engine_cpu()
    asg_engine_ms = bench_asg_graph_engine_cpu()
    trans_engine_ms = bench_transducer_graph_engine_cpu()
    torch_ms = bench_torch_cpu()
    out = {
        "metric": "ctc_fwd_bwd_ms_per_iter_B32_T250_L44_N80",
        "value": round(ctc_ms, 3),
        "unit": "ms",
        "vs_baseline": round(engine_ms / ctc_ms, 3) if engine_ms else 0.0,
        "baseline": (
            "graph_engine_cpu: the reference's algorithm (per-sample graph "
            "compose + log-semiring autodiff, C++ thread pool) on this host"
        ),
        "timing": (
            "primary ms fields are readback-closed (ground truth on this "
            "stack); *_dispatch_ms are the chained block_until_ready "
            "numbers, which can return early here"
        ),
        "graph_engine_cpu_ms": round(engine_ms, 3) if engine_ms else None,
        "ctc_dispatch_ms": round(tpu_ms, 3),
        "torch_cpu_ms": round(torch_ms, 3) if torch_ms else None,
        "vs_torch_cpu": round(torch_ms / ctc_ms, 3) if torch_ms else None,
        "asg_fwd_bwd_ms": round(asg_ms, 3) if asg_ms else None,
        "asg_dispatch_ms": round(asg_disp_ms, 3) if asg_disp_ms else None,
        "asg_graph_engine_cpu_ms": (
            round(asg_engine_ms, 3) if asg_engine_ms else None
        ),
        "asg_vs_baseline": (
            round(asg_engine_ms / asg_ms, 3)
            if asg_engine_ms and asg_ms else None
        ),
        "transducer_ngram0_fwd_bwd_ms": (
            round(trans_ms, 3) if trans_ms else None
        ),
        "transducer_ngram0_dispatch_ms": (
            round(trans_disp_ms, 3) if trans_disp_ms else None
        ),
        "transducer_graph_engine_cpu_ms": (
            round(trans_engine_ms, 3) if trans_engine_ms else None
        ),
        "transducer_vs_baseline": (
            round(trans_engine_ms / trans_ms, 3)
            if trans_engine_ms and trans_ms else None
        ),
        "transducer_ngram2_fwd_bwd_ms": (
            round(trans2_ms, 3) if trans2_ms else None
        ),
        "transducer_ngram2_dispatch_ms": (
            round(trans2_disp_ms, 3) if trans2_disp_ms else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
