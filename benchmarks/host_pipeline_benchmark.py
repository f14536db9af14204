"""Host input-pipeline sustainment benchmark (round-5 directive 7).

Measures whether the host-side IAM pipeline — the REAL transform stack:
PIL RandomResizeCrop + rotation + brightness/contrast jitter +
Normalize, then bucketed ``padding_collate`` — can feed the measured
device step rate.  Pixels are synthetic (no gated data needed); image
geometry is driven by a ``--width`` knob covering both regimes:

  * 128  — the flagship roofline protocol shape (64 x 128), whose B=128
           device rate is 32.2k samples/s (SCALING_r04);
  * 900  — IAM line crops at num_features=64 (reference boxes average
           ~1750 x 124 -> ~900 wide at h=64), the real-data regime.

Protocol per configuration: build an in-memory dataset of PIL images
(mirroring datasets/iamdb.py Dataset, which pre-resizes at load and
augments in __getitem__), then iterate ``utils.DataLoader`` with
``augment=True`` for the full epoch and report samples/s.  Sweeps
``num_workers`` (the round-5 DataLoader extension) to show the
threading headroom.  Host-only: never imports jax.

Usage: python benchmarks/host_pipeline_benchmark.py [--json OUT]
Reference: /root/reference/datasets/iamdb.py:47-75 (eager mp.Pool(16)
preload + per-__getitem__ augment), utils.py:28-35 (DataLoader workers).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gtn_applications_tpu import utils  # noqa: E402
from gtn_applications_tpu.datasets import iamdb  # noqa: E402


class _Pre:
    """Minimal preprocessor protocol for iamdb.Dataset.__getitem__."""

    def to_index(self, text):
        return np.asarray([ord(c) % 32 for c in text], np.int32)


def synthetic_iam(n, height, width_mean, width_jitter, seed=0,
                  fast_pipeline=False, augment=True):
    """A REAL iamdb.Dataset (same __getitem__/collate code paths) over
    synthetic in-memory PIL images, skipping only the disk load."""
    import PIL.Image

    rng = np.random.RandomState(seed)
    data = []
    for i in range(n):
        w = int(np.clip(
            rng.normal(width_mean, width_jitter),
            max(32, width_mean * 0.4), width_mean * 1.8,
        ))
        arr = rng.randint(0, 255, size=(height, w), dtype=np.uint8)
        text = "".join(
            rng.choice(list("abcdefghij "), size=max(4, w // 36))
        )
        data.append((PIL.Image.fromarray(arr), text))
    ds = iamdb.Dataset.__new__(iamdb.Dataset)
    ds.dataset = data
    ds.augment = augment
    ds.preprocessor = _Pre()
    ds.fast_pipeline = fast_pipeline
    return ds


def run_config(n, height, width, batch_size, workers, seed=0, fast=False):
    ds = synthetic_iam(n, height, width, width * 0.25, seed=seed,
                       fast_pipeline=fast)
    sampler = utils.BatchSortedSampler(ds, batch_size, seed=seed)
    loader = utils.DataLoader(
        ds, sampler, collate_fn=ds.collate_fn or utils.padding_collate,
        num_workers=workers)
    # warm one epoch fragment (thread spin-up, allocator)
    it = iter(loader)
    next(it)
    del it
    start = time.perf_counter()
    count = 0
    for batch, widths, targets in loader:
        count += batch.shape[0]
    dt = time.perf_counter() - start
    return count / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--device_rate_w128", type=float, default=32200.0,
                    help="measured flagship B=128 device samples/s "
                         "(SCALING_r04 chip_local_batch_128)")
    args = ap.parse_args(argv)

    out = {"batch_size": args.batch_size, "n": args.n,
           "device_rate_w128": args.device_rate_w128,
           "host_cores": os.cpu_count(), "configs": []}
    for width in (128, 900):
        for fast in (False, True):
            for workers in (1, 2, 4, 8):
                rate = run_config(args.n, 64, width, args.batch_size,
                                  workers, fast=fast)
                row = {"width": width, "fast_pipeline": fast,
                       "num_workers": workers,
                       "samples_per_s": round(rate, 1)}
                if width == 128:
                    row["vs_device_rate"] = round(
                        rate / args.device_rate_w128, 3)
                print(f"w={width:4d} fast={int(fast)} workers={workers:2d}: "
                      f"{rate:9.1f} samples/s", flush=True)
                out["configs"].append(row)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
