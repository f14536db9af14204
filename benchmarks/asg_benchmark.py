#!/usr/bin/env python
"""ASG fwd+bwd microbenchmark (protocol: reference benchmarks/asg_benchmark.py
— T=250, L=44, N=80, B=argv)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import ASG
from time_utils import time_func


def main():
    T, L, N = 250, 44, 80
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
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

    time_func(
        lambda: fwd_bwd(params, inputs, prepared)[1][1],
        100,
        f"asg fwd+bwd B={B}",
    )


if __name__ == "__main__":
    main()
