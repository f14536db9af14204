"""Weak-scaling efficiency gate (BASELINE.md north star: >=80%).

On the virtual CPU mesh all 8 devices share the host's cores, so the
meaningful scaling number is sharding-overhead efficiency: the same
global batch, unsharded on 1 device vs sharded over 8, must run within
80% — i.e. partitioning + gradient collectives cost <= 25% on identical
total compute.  (Real multi-chip adds per-chip compute isolation on top;
benchmarks/scaling_benchmark.py measures absolute chip numbers.)
"""

import pytest

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from scaling_benchmark import run_mesh_scaling  # noqa: E402


pytestmark = pytest.mark.slow  # timing-based efficiency measurement (~1 min)


def test_sharding_efficiency_at_least_80pct():
    out = run_mesh_scaling(local_batch=2, iters=5)
    assert out["samples_per_s_local_batch_1dev"] > 0
    assert out["step_s_global_unsharded_1dev"] > 0
    assert out["step_s_global_sharded_8dev"] > 0
    assert out["sharding_overhead_efficiency"] >= 0.8, out
