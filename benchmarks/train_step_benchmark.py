#!/usr/bin/env python
"""Full training-step benchmark: flagship TDS2d + CTC at IAM scale
(configs/iamdb/tds2d.json shapes). Reports ms/step and images/s — the
end-to-end number that dominates real training (model fwd+bwd on the MXU
plus the lattice loss)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import CTC
from gtn_applications_tpu.models import TDS2d
from gtn_applications_tpu.train import make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else None
    H, W = 64, 512  # ~mean IAM line width after resize
    model = TDS2d(
        input_size=H, output_size=80, depth=4,
        tds_groups=[
            {"channels": 4, "num_blocks": 3, "stride": [2, 2]},
            {"channels": 16, "num_blocks": 3, "stride": [2, 2]},
            {"channels": 32, "num_blocks": 3, "stride": [2, 1]},
            {"channels": 64, "num_blocks": 3, "stride": [2, 1]},
        ],
        kernel_size=[5, 7], dropout=0.1, dtype=dtype,
    )
    rng = np.random.RandomState(0)
    targets = [rng.randint(0, 79, size=rng.randint(20, 60)).tolist() for _ in range(B)]
    if "--ngram2" in sys.argv:
        # diff-wfst recipe shape: letter transducer with learned full
        # bigram transitions (scores through ops/factored.py)
        from gtn_applications_tpu.criterions import Transducer

        criterion = Transducer(
            [(i,) for i in range(79)], {i: i for i in range(79)},
            ngram=2, blank="optional", reduction="mean",
        )
    else:
        criterion = CTC(blank=79)
    x = jnp.asarray(rng.randn(B, H, W).astype(np.float32))
    prepared = criterion.prepare(targets)

    params = {
        "model": model.init(jax.random.PRNGKey(0), x[:1]),
        "criterion": criterion.init_params(),
    }
    step = make_train_step(model, criterion, 0.1, 0.1, 5.0)
    key = jax.random.PRNGKey(1)

    p, loss, _ = step(params, x, prepared, key, 1.0)
    jax.block_until_ready(loss)
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        p, loss, _ = step(p, x, prepared, key, 1.0)
    jax.block_until_ready(loss)
    disp_ms = (time.perf_counter() - start) / iters * 1000
    # readback-closed ground truth (chained block_until_ready can return
    # early on this stack — tools/chip/chip_timing_sanity.py); one value
    # transfer amortized over 200 iterations biases by <0.15 ms
    rb_iters = 200
    float(loss)  # absorb the first (poisoning) readback untimed
    start = time.perf_counter()
    for _ in range(rb_iters):
        p, loss, _ = step(p, x, prepared, key, 1.0)
    float(loss)
    ms = (time.perf_counter() - start) / rb_iters * 1000
    tag = " bf16" if dtype is not None else ""
    tag += " ngram2-transducer" if "--ngram2" in sys.argv else ""
    print(f"train step B={B} H={H} W={W}{tag}: {ms:.2f} ms/step, "
          f"{B / ms * 1000:.1f} images/s (dispatch {disp_ms:.2f} ms)")


if __name__ == "__main__":
    main()
