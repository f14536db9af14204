#!/usr/bin/env python
"""CTC fwd+bwd microbenchmark (protocol: reference benchmarks/ctc_benchmark.py
— T=250, L=44, N=80, B=argv)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions.common import pad_targets
from gtn_applications_tpu.ops import lattice
from time_utils import time_func


def main():
    T, L, N = 250, 44, 80
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    tg, ln = pad_targets([rng.randint(0, N - 1, size=L).tolist() for _ in range(B)])

    @jax.jit
    def fwd_bwd(x, tg, ln):
        def f(x):
            lp = jax.nn.log_softmax(x, 2)
            return lattice.ctc_loss(lp, tg, ln, N - 1, "mean")
        return jax.value_and_grad(f)(x)

    time_func(lambda: fwd_bwd(inputs, tg, ln)[1], 100, f"ctc fwd+bwd B={B}")


if __name__ == "__main__":
    main()
