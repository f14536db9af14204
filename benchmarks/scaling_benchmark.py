#!/usr/bin/env python
"""Train-step throughput scaling + MFU (BASELINE.md north stars:
samples/s/device at ndev in {1, 8} and >=80% weak-scaling efficiency;
MFU for the flagship TDS2d+CTC step).

Two measurement modes:

* CPU virtual mesh (default off-TPU, or --mesh): all virtual devices
  share the host's physical cores, so naive samples/s/device cannot
  weak-scale.  The honest scaling number on shared cores is
  *sharding overhead efficiency*: the same GLOBAL batch is timed
  unsharded on one device vs sharded over 8 (identical total compute,
  same cores) — efficiency = t_unsharded / t_sharded.  This isolates
  exactly what multi-chip scaling adds (partitioning + collectives),
  which is the part the virtual mesh can validate; per-chip compute
  isolation is what real chips add.

* Real TPU chip: absolute samples/s and MFU = achieved flops/s over the
  chip's peak (flops per step from XLA's compiled cost analysis, so the
  number tracks the actual HLO rather than a hand model).

Prints one JSON line:
  {"metric": "train_step_scaling",
   "samples_per_s_local_batch_1dev": ...,
   "sharding_overhead_efficiency": ..., "mfu": ...,
   "mfu_vs_measured_peak": ...}
"""

import argparse
import json
import sys
import time

import numpy as np

# bf16/fp32 peak FLOP/s per chip by device kind (public spec sheets;
# conservative bf16 numbers). Unknown kinds report mfu=null.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _flagship_step(local_batch, n_devices, dtype=None, lane_pack=False,
                   conv_layout="transpose", blocks_per_group=1):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship
    from gtn_applications_tpu.parallel import mesh as pmesh
    from gtn_applications_tpu.train import make_train_step

    model, criterion = _flagship(dtype=dtype, lane_pack=lane_pack,
                                 conv_layout=conv_layout,
                                 blocks_per_group=blocks_per_group)
    B = local_batch * n_devices
    H, W = 64, 128
    rng = np.random.RandomState(0)
    x = rng.randn(B, H, W).astype(np.float32)
    targets = [list(rng.randint(0, 79, size=8)) for _ in range(B)]
    prepared = criterion.prepare(targets)
    params = {
        "model": model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1])),
        "criterion": criterion.init_params(),
    }
    step = make_train_step(model, criterion, 0.01, 0.01, max_grad_norm=5.0)
    return step, params, x, prepared, B


def _time_step(step, params, xs, prepared, iters=20, warmup=3,
               return_params=False):
    import jax

    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        params, loss, _ = step(params, xs, prepared, key, 1.0)
    jax.block_until_ready(loss)
    start = time.perf_counter()
    for _ in range(iters):
        params, loss, _ = step(params, xs, prepared, key, 1.0)
    jax.block_until_ready(loss)
    t = (time.perf_counter() - start) / iters
    # the step donates params, so callers that time again must use the
    # live params returned here, not the consumed originals
    return (t, params) if return_params else t


def _time_step_rb(step, params, xs, prepared, iters=20):
    """Readback-closed ground truth (bench.py's methodology): a device->
    host value transfer cannot complete before the chained dispatches
    have, so one readback amortized over ``iters`` bounds the overhead.
    On this TPU stack chained ``block_until_ready`` has been measured to
    return early (tools/chip/chip_timing_sanity.py), inflating achieved
    flops past any public chip peak — this is the honest timer.  The
    first readback permanently degrades per-call sync latency, so call
    this only AFTER all chained-dispatch measurements are done.
    """
    import jax

    key = jax.random.PRNGKey(1)
    p = params
    for _ in range(2):
        p, loss, _ = step(p, xs, prepared, key, 1.0)
    float(loss)  # absorb the first (poisoning, ~3 s) readback untimed
    start = time.perf_counter()
    for _ in range(iters):
        p, loss, _ = step(p, xs, prepared, key, 1.0)
    float(loss)
    return (time.perf_counter() - start) / iters


def _analytic_fwd_flops(model, B, H, W):
    """Hand-counted forward matmul/conv FLOPs of the TDS2d encoder + final
    projection (2*MACs; relu/norm/lattice omitted — <1% at these shapes).
    Cross-checks XLA's cost analysis: a train step should land at ~3x this
    (forward + 2x-forward backward)."""
    depth, (kh, kw) = model.depth, tuple(model.kernel_size)
    c = model.in_channels
    h, w = H // c, W
    total = 0
    for g in model.tds_groups:
        out_c = depth * g["channels"]
        sh, sw = g["stride"]
        h, w = -(-h // sh), -(-w // sw)
        total += 2 * B * h * w * out_c * kh * kw * c
        c = out_c
        C = g["channels"]
        for _ in range(g["num_blocks"]):
            total += 2 * B * h * w * depth * C * kh * kw * C  # grouped conv
            total += 2 * 2 * B * h * w * c * c               # two Dense
    total += 2 * B * w * (c * h) * model.output_size
    return float(total)


def measure_matmul_peak(dtype, n=4096, iters=32):
    """Achievable matmul TFLOP/s on this chip, readback-closed: a chain of
    dependent n x n matmuls (rescaled to stay finite) closed by one scalar
    transfer.  The honest MFU denominator — the public spec peak for the
    advertised device kind need not match the remote device."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(n, n).astype(np.float32) / n, dtype)
    b = jnp.asarray(rng.randn(n, n).astype(np.float32) / np.sqrt(n), dtype)

    @jax.jit
    def chain(a, b):
        def body(c, _):
            return (c @ b) * jnp.asarray(0.125, dtype), None
        c, _ = jax.lax.scan(body, a, None, length=iters)
        return c[0, 0]

    float(chain(a, b))  # compile + warm
    best = 0.0
    for _ in range(3):
        start = time.perf_counter()
        float(chain(a, b))
        dt = time.perf_counter() - start
        best = max(best, 2.0 * n**3 * iters / dt)
    return best / 1e12


def _step_flops(step, params, xs, prepared):
    import jax

    try:
        lowered = step.lower(params, xs, prepared, jax.random.PRNGKey(1), 1.0)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def run_mesh_scaling(local_batch=2, iters=10):
    """Virtual-mesh sharding efficiency + per-config samples/s."""
    import jax
    from gtn_applications_tpu.parallel import mesh as pmesh

    devs = jax.devices()
    assert len(devs) >= 8, "need 8 (virtual) devices; set XLA_FLAGS"
    out = {}
    # reference point: the per-device work unit (LOCAL batch, 1 device)
    step, params, x, prepared, _ = _flagship_step(local_batch, 1)
    mesh1 = pmesh.make_mesh(devs[:1])
    with mesh1:
        p = pmesh.replicate(params, mesh1)
        xs = pmesh.shard_batch(x, mesh1)
        prep = pmesh.shard_pytree_batch(prepared, mesh1)
        t1 = _time_step(step, p, xs, prep, iters)
    out["local_batch"] = local_batch
    out["samples_per_s_local_batch_1dev"] = local_batch / t1

    # sharding-overhead experiment: the SAME global batch, unsharded on 1
    # virtual device vs sharded over 8 — identical total compute on the
    # same physical cores, so the ratio isolates exactly what partitioning
    # + collectives add.  (Absolute samples/s on a shared-core virtual
    # mesh is NOT a scaling number; per-chip rates live in the chip
    # section.)
    step, params, xg, prepg, Bg = _flagship_step(local_batch, 8)
    with mesh1:
        p = pmesh.replicate(params, mesh1)
        xs = pmesh.shard_batch(xg, mesh1)
        prep = pmesh.shard_pytree_batch(prepg, mesh1)
        t_unsharded = _time_step(step, p, xs, prep, iters)
    mesh8 = pmesh.make_mesh(devs[:8])
    with mesh8:
        p = pmesh.replicate(params, mesh8)
        xs = pmesh.shard_batch(xg, mesh8)
        prep = pmesh.shard_pytree_batch(prepg, mesh8)
        t_sharded = _time_step(step, p, xs, prep, iters)
    out["global_batch"] = Bg
    out["step_s_global_unsharded_1dev"] = t_unsharded
    out["step_s_global_sharded_8dev"] = t_sharded
    out["sharding_overhead_efficiency"] = t_unsharded / t_sharded
    return out


def run_chip_throughput(local_batch=8, iters=20, lane_pack=False,
                        conv_layout="transpose", blocks_per_group=1):
    """Absolute single-chip samples/s + MFU, fp32 and bf16 encoder."""
    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    # longest matching key wins ("TPU v5 lite" must not hit "TPU v5")
    matches = [
        (len(k), v) for k, v in _PEAK_FLOPS.items()
        if k.lower() in kind.lower()
    ]
    peak = max(matches)[1] if matches else None
    out = {"device_kind": kind, "peak_tflops_assumed": peak and peak / 1e12}
    # Pass 1: chained-dispatch timing for both dtypes (reported as
    # *_dispatch), keeping the process readback-free so per-call sync
    # latency stays undegraded across both measurements.
    cases = []
    for tag, dtype in (("", None), ("_bf16", jnp.bfloat16)):
        step, params, x, prepared, B = _flagship_step(
            local_batch, 1, dtype=dtype, lane_pack=lane_pack,
            conv_layout=conv_layout, blocks_per_group=blocks_per_group,
        )
        xs = jnp.asarray(x)
        flops = _step_flops(step, params, xs, prepared)
        t_disp, params = _time_step(
            step, params, xs, prepared, iters, return_params=True
        )
        out[f"step_ms_dispatch{tag}"] = t_disp * 1e3
        out[f"flops_per_step{tag}"] = flops
        cases.append((tag, step, params, xs, prepared, B, flops))
    # Pass 2 (after all dispatch timing — the first readback poisons sync
    # latency): readback-closed ground truth; all headline fields derive
    # from it.
    import jax.numpy as jnp
    from __graft_entry__ import _flagship

    for tag, step, params, xs, prepared, B, flops in cases:
        # each readback costs ~28 ms on this stack after the first one;
        # amortize the single closing readback over >=200 iterations so it
        # biases step_ms by <0.15 ms
        t = _time_step_rb(step, params, xs, prepared, max(iters, 200))
        out[f"samples_per_s_chip{tag}"] = B / t
        out[f"step_ms{tag}"] = t * 1e3
        out[f"achieved_tflops{tag}"] = flops and flops / t / 1e12
        out[f"mfu{tag}"] = (flops / t) / peak if (flops and peak) else None
    # Pass 3: the honest MFU denominator — the chip's MEASURED achievable
    # matmul throughput per dtype (readback-closed), plus an analytic
    # cross-check of XLA's cost-analysis FLOPs.
    model, _ = _flagship(lane_pack=lane_pack,
                         blocks_per_group=blocks_per_group)
    analytic_fwd = _analytic_fwd_flops(model, local_batch, 64, 128)
    out["flops_analytic_fwd"] = analytic_fwd
    if out.get("flops_per_step"):
        # fwd + ~2x-fwd backward: the ratio should sit near 3
        out["flops_xla_over_analytic_fwd"] = (
            out["flops_per_step"] / analytic_fwd
        )
    for tag, dtype in (("", jnp.float32), ("_bf16", jnp.bfloat16)):
        try:
            meas = measure_matmul_peak(dtype)
        except Exception:
            meas = None
        out[f"measured_matmul_tflops{tag}"] = meas
        ach = out.get(f"achieved_tflops{tag}")
        out[f"mfu_vs_measured_peak{tag}"] = (
            ach / meas if (ach and meas) else None
        )
    out["timing_note"] = (
        "step_ms / samples_per_s / mfu use the readback-closed timer "
        "(ground truth on this stack); step_ms_dispatch is the chained "
        "block_until_ready measurement, which chip_timing_sanity.py "
        "showed can return early here. mfu_vs_measured_peak divides by "
        "the chip's measured matmul throughput for the matching dtype "
        "(measured_matmul_tflops); mfu divides by the public spec peak "
        "for the advertised device kind, which need not match the "
        "remote device"
    )
    if any(
        out.get(f"mfu{t}") and out[f"mfu{t}"] > 1.0 for t in ("", "_bf16")
    ):
        out["mfu_note"] = (
            "achieved flops exceed the public spec peak for this "
            "device_kind string; the remote device differs from its "
            "advertised kind — mfu_vs_measured_peak is the meaningful "
            "utilization number"
        )
    return out


def run_host_scaling(local_batch=2, iters=5, nprocs=2, total_devices=8):
    """Multi-HOST efficiency on shared cores: the same global batch over
    the same ``total_devices`` virtual devices, measured with 1 process vs
    ``nprocs`` jax.distributed processes — the ratio isolates what
    multi-host adds (process-boundary collectives + global-array
    assembly via global_batch_from_local).  BASELINE.md's ">=2 hosts"
    scaling north star, measurable without multi-host hardware.
    """
    import json as json_mod
    import os
    import socket
    import subprocess
    import tempfile

    import jax
    from gtn_applications_tpu.parallel import mesh as pmesh

    # single-process reference: global batch sharded over all devices
    devs = jax.devices()
    assert len(devs) >= total_devices
    step, params, xg, prepg, Bg = _flagship_step(
        local_batch, total_devices
    )
    mesh = pmesh.make_mesh(devs[:total_devices])
    with mesh:
        p = pmesh.replicate(params, mesh)
        xs = pmesh.shard_batch(xg, mesh)
        prep = pmesh.shard_pytree_batch(prepg, mesh)
        t_one = _time_step(step, p, xs, prep, iters)

    # nprocs processes x (total_devices / nprocs) devices each
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    outdir = tempfile.mkdtemp()
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scaling_hosts_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={total_devices // nprocs}"
    )
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    procs, outs = [], []
    for pid in range(nprocs):
        out = os.path.join(outdir, f"rank{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), str(nprocs), str(port), out,
             str(local_batch), str(iters)],
            env=env,
            # workers report via their JSON files; keep gloo's connection
            # chatter off this process's stdout (it must stay one JSON line)
            stdout=subprocess.DEVNULL,
        ))
    for pr in procs:
        assert pr.wait(timeout=600) == 0, "host-scaling worker failed"
    ranks = [json_mod.load(open(o)) for o in outs]
    t_multi = max(r["step_s"] for r in ranks)
    out = {
        "step_s_1proc": t_one,
        "step_s_nproc": t_multi,
        "nprocs": nprocs,
        "global_batch": Bg,
        "host_scaling_efficiency": t_one / t_multi,
    }
    if all("allreduce_s" in r for r in ranks):
        # decomposition (VERDICT r3 #6): where the lost seconds go.
        #   local_step_s — same per-process work on a LOCAL mesh (no
        #     process boundary): its excess over t_one is pure core
        #     oversubscription / scheduling;
        #   allreduce_s — the cross-process gradient psum alone;
        #   assembly_s — per-step host->global-array data plumbing
        #     (overlappable; the train loop dispatches async).
        t_local = max(r["local_step_s"] for r in ranks)
        t_coll = max(r["allreduce_s"] for r in ranks)
        t_asm = max(r["assembly_s"] for r in ranks)
        lost = t_multi - t_one
        out["breakdown"] = {
            "local_step_s": t_local,
            "grad_allreduce_s": t_coll,
            "grad_allreduce_flat_s": max(
                r.get("allreduce_flat_s", 0) for r in ranks) or None,
            "grad_allreduce_scalar_s": max(
                r.get("allreduce_scalar_s", 0) for r in ranks) or None,
            "grad_allreduce_bf16_s": max(
                r.get("allreduce_bf16_s", 0) for r in ranks) or None,
            "batch_assembly_s": t_asm,
            "grad_bytes": ranks[0].get("grad_bytes"),
            "lost_s_total": lost,
            "lost_s_oversubscription": t_local - t_one,
            "lost_s_boundary_residual": lost - (t_local - t_one),
            "note": "max over ranks; oversubscription = excess of the "
            "collective-free local-mesh step over the 1-process step on "
            "the same shared cores; the residual bounds process-boundary "
            "cost (gradient psum + sync skew). assembly_s overlaps with "
            "device compute in the real train loop (async dispatch).",
        }
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", action="store_true",
                        help="force the virtual-mesh scaling measurement")
    parser.add_argument("--hosts", action="store_true",
                        help="multi-process host-scaling measurement (CPU)")
    parser.add_argument("--local_batch", type=int, default=None,
                    help="per-device batch (default: 2 mesh / 8 chip)")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--lane_pack", action="store_true",
                        help="width-pack small-channel convs (PackedConv)")
    parser.add_argument("--conv_layout", default="transpose",
                        choices=["transpose", "dimnums"],
                        help="TDS block conv layout")
    parser.add_argument("--blocks", type=int, default=1,
                        help="TDS blocks per group (3 = the full iamdb "
                             "recipe; 1 = the fast benchmark flagship)")
    args = parser.parse_args(argv)

    if args.mesh or args.hosts:
        # self-provision the virtual mesh: the flag must land in the
        # environment BEFORE jax initializes any backend (and the CPU
        # platform switch must come before the first backend query, or
        # the axon platform wins and the flag is never honored)
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.hosts:
        result = {"metric": "host_scaling"}
        result.update(run_host_scaling(args.local_batch or 2, args.iters))
        print(json.dumps(result))
        return result

    import jax

    result = {"metric": "train_step_scaling"}
    on_tpu = jax.default_backend() == "tpu" and not args.mesh
    if on_tpu:
        result.update(
            run_chip_throughput(args.local_batch or 8, iters=args.iters,
                                lane_pack=args.lane_pack,
                                conv_layout=args.conv_layout,
                                blocks_per_group=args.blocks)
        )
        if args.lane_pack:
            result["lane_pack"] = True
        if args.conv_layout != "transpose":
            result["conv_layout"] = args.conv_layout
        result["blocks_per_group"] = args.blocks
    else:
        jax.config.update("jax_platforms", "cpu")
        result.update(run_mesh_scaling(args.local_batch or 2, args.iters))
        # MFU denominator is chip peak; on CPU report flops only
        step, params, x, prepared, _ = _flagship_step(args.local_batch or 2, 1)
        import jax.numpy as jnp

        result["flops_per_step_dev1"] = _step_flops(
            step, params, jnp.asarray(x), prepared
        )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
