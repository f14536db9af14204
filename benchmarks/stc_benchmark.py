#!/usr/bin/env python
"""STC fwd+bwd microbenchmark (CTC protocol shapes with partial labels;
the reference ships no STC benchmark — this rounds out the criterion
suite)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import STC
from time_utils import time_func


def main():
    T, L, N = 250, 30, 80
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.RandomState(0)
    crit = STC(0, p0=1.0, plast=0.1, thalf=100, reduction="mean",
               shift_targets=1)
    inputs = jnp.asarray(rng.randn(B, T, N + 1).astype(np.float32))
    prepared = crit.prepare(
        [rng.randint(0, N, size=L).tolist() for _ in range(B)]
    )

    @jax.jit
    def fwd_bwd(x, prep):
        return jax.value_and_grad(lambda x: crit.loss({}, x, prep))(x)

    time_func(lambda: fwd_bwd(inputs, prepared)[1], 50, f"stc fwd+bwd B={B}")


if __name__ == "__main__":
    main()
