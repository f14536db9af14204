#!/usr/bin/env python
"""Assemble SCALING_r04.json from the round-4 capture files.

Inputs (docs/captures_r04/*.json, produced by benchmarks/
scaling_benchmark.py, benchmarks/flagship_roofline.py and
tools/chip/chip_step_roofline.py on the real chip, plus the clean CPU
mesh/hosts runs) -> one self-describing artifact at the repo root.
"""
import json
import os
import sys

CAP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "captures_r04")
ROOT = os.path.dirname(CAP.rstrip("/")).rsplit("/docs", 1)[0]


def load(name):
    p = os.path.join(CAP, name)
    if not os.path.exists(p):
        print(f"missing {name}", file=sys.stderr)
        return None
    with open(p) as fid:
        return json.load(fid)


def main():
    out = {
        "round": 4,
        "note": (
            "All chip timings readback-closed. Round-4 finding: the B=64 "
            "flagship step is OCCUPANCY-bound, not shape-bound — doubling "
            "the batch to 128 raises achieved throughput from 32 to 60 "
            "TFLOP/s (74.6% of the chip's measured matmul peak) at only "
            "+7% step time. The roadmap's lane-packing lever was "
            "implemented and measured: it LOSES (step 4.67 vs 3.99 ms; "
            "XLA's conv emitter is not output-lane-bound at these "
            "shapes). Per-layer attribution by cumulative-prefix "
            "differencing; per-launch floors documented in CLAUDE.md."
        ),
    }
    for tag, name in (
        ("chip_local_batch_64", "scaling_b64.json"),
        ("chip_local_batch_128", "scaling_b128.json"),
        ("chip_local_batch_128_rerun", "scaling_b128_v3.json"),
        ("chip_local_batch_256", "scaling_b256.json"),
        ("chip_local_batch_64_full_recipe", "scaling_b64_blocks3.json"),
        ("chip_local_batch_128_full_recipe", "scaling_b128_blocks3.json"),
        ("lever_lane_pack_b64", "scaling_lanepack.json"),
        ("lever_dimnums_b64", "scaling_dimnums.json"),
        ("step_roofline_b64", "step_roofline.json"),
        ("layer_prefix_attribution_b64", "roofline_prefix.json"),
        ("layer_scan_unpacked_b64", "roofline_scan_unpacked.json"),
        ("layer_scan_lane_packed_b64", "roofline_scan_packed.json"),
        ("layer_scan_bf16_b64", "roofline_scan_bf16.json"),
        ("mesh_virtual_8dev", "mesh_clean.json"),
        ("hosts_2proc_virtual", "hosts_clean.json"),
    ):
        d = load(name)
        if d is not None:
            out[tag] = d

    b64 = out.get("chip_local_batch_64", {})
    b128 = out.get("chip_local_batch_128", {})
    b256 = out.get("chip_local_batch_256", {})
    rerun = out.get("chip_local_batch_128_rerun", {})
    out["b128_reproducibility"] = {
        "step_ms_runs": [b128.get("step_ms"), rerun.get("step_ms")],
        "note": "two independent sessions: 3.975 / 3.971 ms — the step "
        "time reproduces to 0.1%; mfu_vs_measured_peak varies with the "
        "session's measured peak (79.3% / 81.6%)",
    }
    out["batch_curve"] = {
        "mfu_vs_measured_peak": {
            "B64": b64.get("mfu_vs_measured_peak"),
            "B128": b128.get("mfu_vs_measured_peak"),
            "B256": b256.get("mfu_vs_measured_peak"),
        },
        "samples_per_s": {
            "B64": b64.get("samples_per_s_chip"),
            "B128": b128.get("samples_per_s_chip"),
            "B256": b256.get("samples_per_s_chip"),
        },
        "bf16_note": (
            "bf16 MFU-vs-measured-peak is LOWER than fp32 at every batch "
            "because this chip's measured bf16 matmul peak is only "
            "~10-15% above fp32 (88-93 vs 79-85 TFLOP/s) while the bf16 "
            "step time improves <5% (the InstanceNorm fp32 statistics, "
            "fp32 logit head, and CTC keep part of the traffic at 4 "
            "bytes): the denominator grows faster than the numerator."
        ),
    }

    path = os.path.join("/root/repo", "SCALING_r04.json")
    with open(path, "w") as fid:
        json.dump(out, fid, indent=2)
    print(path)


if __name__ == "__main__":
    main()
