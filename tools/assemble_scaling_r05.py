#!/usr/bin/env python
"""Assemble SCALING_r05.json from the round-5 capture files.

Inputs (docs/captures_r05/*.json, produced by benchmarks/
scaling_benchmark.py --blocks, benchmarks/flagship_roofline.py
--blocks 3, tools/chip/chip_step_roofline.py (analytic floors), the
custom-VJP chip drive, and benchmarks/host_pipeline_benchmark.py) ->
one self-describing artifact at the repo root.
"""
import json
import os
import sys

CAP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "captures_r05")


def load(name):
    p = os.path.join(CAP, name)
    if not os.path.exists(p):
        print(f"missing {name}", file=sys.stderr)
        return None
    with open(p) as fid:
        return json.load(fid)


def main():
    out = {
        "round": 5,
        "note": (
            "All chip timings readback-closed; A/B pairs same-session. "
            "Round-5 findings: (1) the factored transducer backward is "
            "now an analytic alpha-beta custom VJP — ngram-2 protocol "
            "fwd+bwd 7.40 -> 2.33 ms (3.2x) same-session, grad parity "
            "<= 3.3e-4; (2) the production-depth (3 blocks/group) MFU "
            "gap vs the 1-block flagship is a SHAPE-MIX bound, not an "
            "occupancy failure: depth adds narrow-output grouped convs "
            "and the flops-weighted MXU shape efficiency falls 0.741 "
            "-> 0.610 (x0.82), matching the measured MFU ratio — see "
            "full_recipe_analysis; (3) the step roofline now uses "
            "analytic floors (FLOP floor at eff=1 vs unavoidable-"
            "traffic HBM floor) — every artifact satisfies measured >= "
            "attainable; cost_analysis bytes are diagnostic-only "
            "(CLAUDE.md gotcha 9); (4) host input-pipeline sustainment "
            "is measured: see host_pipeline; (5) the VJP's win boundary "
            "is mapped: STC dense tier 1.47x (stc_dense_chip_ab), "
            "word-decomps protocol neutral, ASG ~8% SLOWER (small "
            "shared-matmul / banded-VPU steps whose transposes are "
            "already cheap) and therefore reverted to XLA's transpose "
            "(asg_protocol_chip_ab records the losing A/B)."
        ),
    }
    for tag, name in (
        ("chip_local_batch_128_blk1_control", "r5_scale_b128_blk1.json"),
        ("chip_local_batch_64_full_recipe", "r5_scale_b64_blk3.json"),
        ("chip_local_batch_128_full_recipe", "r5_scale_b128_blk3.json"),
        ("chip_local_batch_256_full_recipe", "r5_scale_b256_blk3.json"),
        ("full_recipe_layer_table_b128", "r5_full_layers_b128.json"),
        ("full_recipe_prefix_attribution_b128",
         "r5_full_prefix_b128.json"),
        ("step_roofline_b64", "r5_step_roofline.json"),
        ("factored_vjp_chip_ab", "drive_vjp.json"),
        ("stc_dense_chip_ab", "drive_stc.json"),
        ("word_decomps_protocol_chip_ab", "drive_wd.json"),
        ("asg_protocol_chip_ab", "drive_asg.json"),
        ("host_pipeline", "r5_host_pipeline.json"),
    ):
        d = load(name)
        if d is not None:
            out[tag] = d

    ctl = out.get("chip_local_batch_128_blk1_control", {})
    b64 = out.get("chip_local_batch_64_full_recipe", {})
    b128 = out.get("chip_local_batch_128_full_recipe", {})
    b256 = out.get("chip_local_batch_256_full_recipe", {})
    out["full_recipe_batch_curve"] = {
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
        "blk1_control_B128_mfu": ctl.get("mfu_vs_measured_peak"),
    }
    out["full_recipe_analysis"] = {
        "claim": (
            "The 1-block flagship vs full-recipe MFU gap at B=128 is "
            "bounded by MXU shape mix, not occupancy: the recipe's "
            "added TDS blocks are grouped convs contracting "
            "[kh*kw*C -> C] with C in {4,16,32,64} (shape eff 0.018 / "
            "0.200 / 0.591 / 0.729 per group at depth 3), so the "
            "flops-weighted shape efficiency falls from 0.741 "
            "(1-block) to 0.610 (3-block)."
        ),
        "flops_weighted_shape_eff": {"blk1": 0.741, "blk3": 0.610},
        "predicted_mfu_ratio": round(0.610 / 0.741, 3),
        "per_group_shape_eff_blk3": {
            "g1": 0.018, "g2": 0.200, "g3": 0.591, "g4": 0.729,
        },
        "fwd_gflops": {"blk1": 103.9, "blk3": 187.6},
    }
    if ctl and b128:
        mf_ctl = ctl.get("mfu_vs_measured_peak")
        mf_full = b128.get("mfu_vs_measured_peak")
        if mf_ctl and mf_full:
            out["full_recipe_analysis"]["measured_mfu_ratio"] = round(
                mf_full / mf_ctl, 3
            )
    host = out.get("host_pipeline")
    if host:
        best128 = max(
            (c for c in host["configs"] if c["width"] == 128),
            key=lambda c: c["samples_per_s"],
        )
        out["host_pipeline_samples_per_s"] = best128["samples_per_s"]
        out["host_pipeline_note"] = (
            f"best w=128 config on this {host.get('host_cores')}-core "
            "bench host; with the shipped mitigations the augment stack "
            "sustains ~4.0k samples/s per producer at the flagship "
            "width (~1.1k at IAM line width 900) -> feeding the "
            "32.2k/s B=128 device rate needs ~8 cores of augment work "
            "at w=128 (~30 at w=900), a production TPU-host budget but "
            "5-10x beyond this 4-core dev host. Mitigations "
            "shipped+measured: DataLoader num_workers (order-preserving "
            "threads) and the iamdb fast_pipeline batch-vectorized "
            "collate (+38-58% at n=2048); thread scaling here is "
            "GIL/core-capped."
        )

    root = os.path.dirname(CAP.rstrip("/")).rsplit("/docs", 1)[0]
    path = os.path.join(root, "SCALING_r05.json")
    with open(path, "w") as fid:
        json.dump(out, fid, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
