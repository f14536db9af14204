"""Benchmark timing harness (protocol parity: reference benchmarks/time_utils.py
— warmup then averaged wall-clock ms/iteration, with device sync).

Two timers:

* ``time_func`` — the reference harness's shape (chained
  ``block_until_ready``).  On this TPU stack the chained sync can RETURN
  EARLY (docs/chip_verification.md), so its numbers are dispatch-biased;
  keep them only for apples-to-apples with the reference harness.
* ``time_func_readback`` — ground truth here: dispatch ``iterations``
  async calls, then force ONE device->host scalar transfer, which cannot
  complete before the queued device work has.  The single readback adds
  at most ~28 ms / iterations of bias (the per-sync floor on this stack),
  so sub-ms metrics should use a few hundred iterations.  NOTE: the first
  readback in a process permanently raises sync latency — run all
  ``time_func`` measurements before any ``time_func_readback``.
"""

import time

import jax
import numpy as np


def time_func(fn, iterations=100, name="", warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    start = time.perf_counter()
    for _ in range(iterations):
        jax.block_until_ready(fn())
    elapsed = (time.perf_counter() - start) / iterations * 1000
    print(f"{name} took an average of {elapsed:.3f} ms per iteration")
    return elapsed


def time_func_readback(fn, iterations=200, name="", warmup=5):
    """Readback-closed ms/iteration; ``fn`` must return a (small) device
    array — the timer reads one scalar from the LAST result."""
    out = None
    for _ in range(warmup):
        out = fn()
    # prime the device->host sync path OUTSIDE the timed window: the
    # FIRST real readback in a process costs ~3 s on this stack
    # (block_until_ready alone does not pay it — it can return early),
    # which at 20 iterations showed up as a phantom +150 ms/iter on
    # whichever protocol was measured first
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0]
    start = time.perf_counter()
    out = None
    for _ in range(iterations):
        out = fn()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0]
    elapsed = (time.perf_counter() - start) / iterations * 1000
    print(f"{name} took an average of {elapsed:.3f} ms per iteration "
          "(readback-closed)")
    return elapsed
