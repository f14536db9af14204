"""Benchmark timing harness (protocol parity: reference benchmarks/time_utils.py
— warmup then averaged wall-clock ms/iteration, with device sync)."""

import time

import jax


def time_func(fn, iterations=100, name="", warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    start = time.perf_counter()
    for _ in range(iterations):
        jax.block_until_ready(fn())
    elapsed = (time.perf_counter() - start) / iterations * 1000
    print(f"{name} took an average of {elapsed:.3f} ms per iteration")
    return elapsed
