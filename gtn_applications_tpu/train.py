"""Training driver (TPU-native).

Capability parity with /root/reference/train.py: JSON experiment configs,
epoch loop with SGD + halving LR schedule, gradient clipping, per-epoch
train/validation CER/WER, best-checkpoint tracking, restore, phase timers.

TPU-native execution model (replaces torch DDP / NCCL / mp.spawn,
train.py:135-208,344-347): one process per host, a single
``Mesh(devices, ('data',))`` across all chips, parameters replicated and
the batch sharded over the mesh inside one jitted SPMD train step — XLA
inserts the gradient all-reduce over ICI where DDP used NCCL buckets.
Metric sync is a host allgather (utils.Meters.sync).
"""

import argparse
import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from . import utils
from .parallel import mesh as pmesh


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a handwriting / speech recognition model."
    )
    parser.add_argument("--config", type=str, help="JSON configuration file.")
    parser.add_argument(
        "--disable_tpu", action="store_true",
        help="Force CPU execution (parity with --disable_cuda)",
    )
    parser.add_argument("--restore", action="store_true")
    parser.add_argument("--last_epoch", type=int, default=0)
    parser.add_argument("--checkpoint_path", default="/tmp/", type=str)
    parser.add_argument(
        "--world_size", default=0, type=int,
        help="Expected number of processes (0 = whatever jax reports); "
        "multi-host rendezvous is via jax.distributed, not TCP urls",
    )
    parser.add_argument("--coordinator_address", default=None, type=str)
    parser.add_argument("--process_id", default=None, type=int)
    parser.add_argument(
        "--profile_dir", default=None, type=str,
        help="Capture a jax.profiler trace of the first training epoch "
        "into this directory (replaces the reference's CudaTimer-only "
        "instrumentation with full XLA/TPU traces)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return args


def make_mesh(seq_parallel=1):
    """Device mesh: 1-D ('data',) by default; a 2-D ('data', 'seq') grid
    when the config asks for sequence parallelism (optim.seq_parallel = n
    time shards — the long-context axis, SURVEY §5).  Falls back to
    data-only with a warning when the device count is indivisible."""
    devices = np.asarray(jax.devices())
    if seq_parallel > 1:
        if devices.size % seq_parallel == 0:
            return Mesh(
                devices.reshape(-1, seq_parallel), ("data", "seq")
            )
        logging.warning(
            "seq_parallel=%d does not divide %d devices; using a "
            "data-only mesh", seq_parallel, devices.size,
        )
    return Mesh(devices, ("data",))


def input_time_axis(inputs, num_features):
    """Time axis of a padded input batch: image layout
    [B, H=num_features, W=time] -> 2; feature-stream layout
    [B, T=time, F=num_features] -> 1.  None for non-3D inputs."""
    inputs = np.asarray(inputs)
    if inputs.ndim != 3:
        return None
    return 2 if inputs.shape[1] == num_features else 1


def shard_batch(batch, mesh, time_axis=None):
    """Shard the local batch's leading axis across the data mesh.

    Single-process: device_put with a batch-sharded NamedSharding (loud
    replicated fallback when indivisible).  Multi-process: each host feeds
    its own rank-dealt local batch and the global jax.Array is stitched
    with jax.make_array_from_process_local_data — the multi-host
    replacement for DDP's per-rank batches (reference train.py:135-208).
    On a ('data', 'seq') mesh the time axis additionally shards along
    'seq' (single-process only; multi-host seq sharding would need
    time-split host feeds)."""
    if jax.process_count() > 1:
        return pmesh.global_batch_from_local(batch, mesh)
    if time_axis is not None and "seq" in mesh.axis_names:
        return pmesh.shard_batch_time(batch, mesh, time_axis)
    return pmesh.shard_batch(batch, mesh)


def shard_prepared(prepared, mesh, local_batch_size):
    """Globalize a prepared-targets pytree on multi-host meshes (per-sample
    tables batch-sharded, shared tables replicated); identity single-host
    (jit's sharding propagation handles local arrays)."""
    if jax.process_count() > 1:
        return pmesh.global_pytree_from_local(prepared, mesh, local_batch_size)
    return prepared


def clip_global_norm(grads, max_norm):
    gnorm = jnp.sqrt(
        sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
    )
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def _train_step_body(model, criterion, lr_model, lr_crit, max_grad_norm):
    """The pure (unjitted) train-step function shared by the per-step and
    fused-scan entry points."""

    def step(params, inputs, prepared, dropout_rng, lr_scale, input_lengths=None):
        def loss_fn(p):
            outputs = model.apply(
                p["model"], inputs, train=True, rngs={"dropout": dropout_rng}
            )
            loss = criterion.loss(
                p["criterion"], outputs, prepared, input_lengths
            )
            return loss, outputs

        (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if max_grad_norm is not None:
            grads = clip_global_norm(grads, max_grad_norm)
        new_model = jax.tree_util.tree_map(
            lambda p, g: p - lr_model * lr_scale * g,
            params["model"], grads["model"],
        )
        new_crit = jax.tree_util.tree_map(
            lambda p, g: p - lr_crit * lr_scale * g,
            params["criterion"], grads["criterion"],
        )
        return {"model": new_model, "criterion": new_crit}, loss, outputs

    return step


def make_train_step(model, criterion, lr_model, lr_crit, max_grad_norm):
    """Build the jitted SPMD train step: forward, loss, grads, clip, SGD.

    ``input_lengths`` (None for reference parity — the reference scores
    zero-padded frames, train.py:259-265) masks padded frames out of the
    lattice when the config sets optim.use_input_lengths."""
    step = _train_step_body(model, criterion, lr_model, lr_crit,
                            max_grad_norm)
    # donate the params pytree: the SGD update writes in place instead of
    # allocating a fresh copy of every weight each step (the train loop
    # rebinds `params` to the returned pytree, never reusing the old one)
    return jax.jit(step, donate_argnums=(0,))


def make_fused_train_steps(model, criterion, lr_model, lr_crit,
                           max_grad_norm, num_steps):
    """``num_steps`` SGD steps fused into ONE executable via lax.scan.

    Each per-step dispatch through a remote-attached TPU costs ~0.3 ms
    of launch floor (docs/flagship_roofline.json); fusing K steps
    amortizes it K-fold.  Inputs carry a leading [K] axis: ``inputs``
    [K, B, ...], ``prepared`` leaves stacked on axis 0 (same bucket
    shape), ``dropout_rng`` is split per step inside.  Returns
    (new_params, mean_loss).  Semantically identical to calling the
    plain step K times on the K batches (same update order)."""
    step = _train_step_body(model, criterion, lr_model, lr_crit,
                            max_grad_norm)

    def fused(params, inputs_k, prepared_k, dropout_rng, lr_scale):
        keys = jax.random.split(dropout_rng, inputs_k.shape[0])

        def body(p, xs):
            x, prep, key = xs
            new_p, loss, _ = step(p, x, prep, key, lr_scale)
            return new_p, loss
        new_params, losses = jax.lax.scan(
            body, params, (inputs_k, prepared_k, keys))
        return new_params, jnp.mean(losses)

    return jax.jit(fused, donate_argnums=(0,))


def make_eval_step(model, criterion):
    def step(params, inputs, prepared, input_lengths=None):
        outputs = model.apply(params["model"], inputs)
        loss = criterion.loss(
            params["criterion"], outputs, prepared, input_lengths
        )
        return loss, outputs

    return jax.jit(step)


def prepared_batches(loader, criterion, prefetch=2):
    """Run criterion.prepare on a background thread so host graph
    compilation (transducer alignment tables, STC label graphs) overlaps
    device steps.  Yields (inputs, widths, targets, prepared)."""
    import queue as queue_mod
    import threading

    q = queue_mod.Queue(maxsize=prefetch)

    def produce():
        for inputs, widths, targets in loader:
            q.put((inputs, widths, targets, criterion.prepare(targets)))
        q.put(None)

    worker = threading.Thread(target=produce, daemon=True)
    worker.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    worker.join()


def output_lengths(model, widths):
    """Map input widths to encoder output frame counts via the model's
    total time stride."""
    stride = getattr(model, "time_stride", 1)
    return jnp.asarray(-(-np.asarray(widths) // stride), dtype=jnp.int32)


def test(model, criterion, params, data_loader, preprocessor, mesh, eval_step,
         use_lengths=False):
    meters = utils.Meters()
    pending_losses = []  # device scalars: one epoch-end readback

    def consume(pending):
        loss, handle, targets = pending
        # loss stays on device (readbacks cost ~30 ms each on remote TPU
        # stacks); weight by batch size without syncing
        pending_losses.append(loss * len(targets))
        meters.num_samples += len(targets)
        predictions = criterion.viterbi_finalize(handle)
        td, wd, nt, nw = utils.compute_edit_distance(
            predictions, targets, preprocessor
        )
        meters.edit_distance_tokens += td
        meters.num_tokens += nt
        meters.edit_distance_words += wd
        meters.num_words += nw

    # grouped pipeline: dispatch device decodes for up to GROUP batches
    # ahead, then pull all their results in ONE jax.device_get — per-array
    # readbacks cost ~25 ms of transport latency each on remote TPU stacks,
    # but a grouped transfer pays it once
    GROUP = 4
    group = []

    def flush():
        fetched = jax.device_get([h for (_, h, _) in group])
        for (loss, _, targets), handle in zip(group, fetched):
            consume((loss, handle, targets))
        group.clear()

    multihost = jax.process_count() > 1
    for inputs, widths, targets in data_loader:
        inputs = shard_batch(
            inputs, mesh, input_time_axis(inputs, preprocessor.num_features)
        )
        prepared = shard_prepared(
            criterion.prepare(targets), mesh, len(targets)
        )
        lens = output_lengths(model, widths) if use_lengths else None
        glens = shard_batch(lens, mesh) if (use_lengths and multihost) else lens
        loss, outputs = eval_step(params, inputs, prepared, glens)
        if multihost:
            # decode only this host's rows (per-rank metric accounting,
            # aggregated by Meters.sync) — the decode itself is host-local
            outputs = pmesh.local_rows(outputs)
        handle = criterion.viterbi_dispatch(outputs, params["criterion"], lens)
        group.append((loss, handle, targets))
        if len(group) >= GROUP:
            flush()
    flush()
    if pending_losses:
        meters.loss += float(jnp.sum(jnp.stack(pending_losses)))
    if jax.process_count() > 1:
        meters.sync()
    return meters.avg_loss, meters.cer, meters.wer


def load_experiment(config, checkpoint_path=None, world_rank=0, world_size=1, seed_override=None):
    """Shared setup for train.py / test.py: dataset module, preprocessor,
    criterion + model construction."""
    dataset_name = config["data"]["dataset"]
    from . import datasets as ds_pkg

    if not hasattr(ds_pkg, dataset_name):
        raise ValueError(f"Unknown dataset {dataset_name}")
    dataset = getattr(ds_pkg, dataset_name)

    input_size = config["data"]["num_features"]
    data_path = config["data"]["data_path"]
    preprocessor = dataset.Preprocessor(
        data_path,
        num_features=input_size,
        tokens_path=config["data"].get("tokens", None),
        lexicon_path=config["data"].get("lexicon", None),
        use_words=config["data"].get("use_words", False),
        prepend_wordsep=config["data"].get("prepend_wordsep", False),
    ) if dataset_name == "iamdb" else dataset.Preprocessor(
        data_path,
        num_features=input_size,
        tokens_path=config["data"].get("tokens", None),
        lexicon_path=config["data"].get("lexicon", None),
        prepend_wordsep=config["data"].get("prepend_wordsep", False),
    )
    criterion, output_size = utils.load_criterion(
        config.get("criterion_type", "ctc"),
        preprocessor,
        config.get("criterion", {}),
    )
    model = utils.load_model(
        config["model_type"], input_size, output_size, config["model"]
    )
    return dataset, preprocessor, criterion, model, input_size


def train(args):
    world_rank = jax.process_index()
    level = logging.INFO if world_rank == 0 else logging.CRITICAL
    logging.getLogger().setLevel(level)

    with open(args.config, "r") as fid:
        config = json.load(fid)
        logging.info("Using the config \n{}".format(json.dumps(config)))

    world_size = jax.process_count()
    seed = config.get("seed", 0)
    rng = jax.random.PRNGKey(seed)

    logging.info("Loading dataset ...")
    dataset, preprocessor, criterion, model, input_size = load_experiment(config)
    data_path = config["data"]["data_path"]
    # config extension: data.fast_pipeline moves the float/jitter/
    # normalize stages into a batch-vectorized collate on datasets that
    # support it (iamdb) — see utils.DataLoader / docs/design.md
    ds_kwargs = {}
    if config["data"].get("fast_pipeline", False):
        ds_kwargs["fast_pipeline"] = True
    trainset = dataset.Dataset(
        data_path, preprocessor, split="train", augment=True, **ds_kwargs
    )
    valset = dataset.Dataset(
        data_path, preprocessor, split="validation", **ds_kwargs
    )
    train_loader = utils.data_loader(trainset, config, world_rank, world_size, seed)
    val_loader = utils.data_loader(valset, config, world_rank, world_size, seed)

    logging.info("Loading model ...")
    mesh = make_mesh(config["optim"].get("seq_parallel", 1))

    # init params with a sample batch shape
    sample_inputs, _, sample_targets = next(iter(train_loader))
    rng, init_rng = jax.random.split(rng)
    model_params = model.init(init_rng, jnp.asarray(sample_inputs))
    params = {"model": model_params, "criterion": criterion.init_params()}

    num_updates = 0
    if args.restore:
        state = utils.load_checkpoint(args.checkpoint_path, load_last=True)
        params = state["params"]
        num_updates = state.get("num_updates", 0)
        if "rng" in state:
            rng = state["rng"]
        logging.info(f"Restored model from epoch {args.last_epoch}")

    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params["model"])
    )
    logging.info(
        "Training {} model with {:,} parameters.".format(
            config["model_type"], n_params
        )
    )

    epochs = config["optim"]["epochs"]
    lr = config["optim"]["learning_rate"]
    crit_lr = config["optim"].get("crit_learning_rate", lr)
    step_size = config["optim"]["step_size"]
    max_grad_norm = config["optim"].get("max_grad_norm", None)

    train_step = make_train_step(model, criterion, lr, crit_lr, max_grad_norm)
    eval_step = make_eval_step(model, criterion)

    timers = utils.Timer(
        [
            "ds_fetch", "model_fwd", "crit_fwd", "bwd", "optim", "metrics",
            "train_total", "test_total",
        ]
    )
    min_val_loss = float("inf")
    min_val_cer = float("inf")
    min_val_wer = float("inf")

    for epoch in range(args.last_epoch, epochs):
        if args.profile_dir and epoch == args.last_epoch:
            jax.profiler.start_trace(args.profile_dir)
        logging.info("Epoch {} started. ".format(epoch + 1))
        lr_scale = 0.5 ** (epoch // step_size)
        if hasattr(criterion, "train"):
            criterion.train()
        start_time = time.time()
        meters = utils.Meters()
        timers.reset()
        timers.start("train_total").start("ds_fetch")
        # Device->host readbacks cost ~30 ms each on remote TPU stacks and
        # the first one degrades per-call sync latency permanently, so the
        # loop stays async: losses accumulate as device scalars and train
        # CER/WER (which requires decoding on host) is sampled every
        # ``metrics_interval`` steps (1 = reference parity).
        metrics_interval = config["optim"].get("metrics_interval", 1)
        use_lengths = config["optim"].get("use_input_lengths", False)
        step_idx = 0
        pending_losses = []
        metric_group = []  # dispatched decodes, fetched 4 at a time

        def flush_metrics():
            fetched = jax.device_get([h for h, _ in metric_group])
            for handle, tgts in zip(fetched, [g[1] for g in metric_group]):
                td, wd, nt, nw = utils.compute_edit_distance(
                    criterion.viterbi_finalize(handle), tgts, preprocessor
                )
                meters.edit_distance_tokens += td
                meters.num_tokens += nt
                meters.edit_distance_words += wd
                meters.num_words += nw
            metric_group.clear()

        multihost = jax.process_count() > 1
        for inputs, widths, targets, prepared in prepared_batches(
            train_loader, criterion
        ):
            inputs = shard_batch(
                inputs, mesh, input_time_axis(inputs, input_size)
            )
            prepared = shard_prepared(prepared, mesh, len(targets))
            lens = output_lengths(model, widths) if use_lengths else None
            glens = (
                shard_batch(lens, mesh) if (use_lengths and multihost) else lens
            )
            timers.stop("ds_fetch").start("model_fwd")
            rng, dropout_rng = jax.random.split(rng)
            params, loss, outputs = train_step(
                params, inputs, prepared, dropout_rng, lr_scale, glens
            )
            timers.stop("model_fwd").start("metrics")
            num_updates += 1
            pending_losses.append(loss * len(targets))
            meters.num_samples += len(targets)
            if step_idx % metrics_interval == 0:
                dec_out = pmesh.local_rows(outputs) if multihost else outputs
                metric_group.append(
                    (
                        criterion.viterbi_dispatch(
                            dec_out, params["criterion"], lens
                        ),
                        targets,
                    )
                )
                if len(metric_group) >= 4:
                    flush_metrics()
            step_idx += 1
            timers.stop("metrics").start("ds_fetch")
        flush_metrics()
        if pending_losses:
            meters.loss += float(jnp.sum(jnp.stack(pending_losses)))
        # One device sync per epoch: the loss readback above (or params here)
        # drains the async-dispatch queue so train_total includes device
        # time.  Per-phase labels (ds_fetch/model_fwd/metrics) deliberately
        # measure host + dispatch cost only — syncing per step would add a
        # ~28 ms readback penalty to every iteration on this stack.
        timers.stop("ds_fetch").stop("train_total", sync=params)
        if args.profile_dir and epoch == args.last_epoch:
            jax.profiler.stop_trace()
            logging.info(f"Profiler trace written to {args.profile_dir}")
        epoch_time = time.time() - start_time
        if world_size > 1:
            meters.sync()
        logging.info(
            "Epoch {} complete. "
            "nUpdates {}, Loss {:.3f}, CER {:.3f}, WER {:.3f},"
            " Time {:.3f} (s), LR {:.3f}".format(
                epoch + 1, num_updates, meters.avg_loss, meters.cer,
                meters.wer, epoch_time, lr * lr_scale,
            ),
        )
        logging.info("Evaluating validation set..")
        timers.start("test_total")
        if hasattr(criterion, "eval"):
            criterion.eval()
        val_loss, val_cer, val_wer = test(
            model, criterion, params, val_loader, preprocessor, mesh,
            eval_step, use_lengths,
        )
        timers.stop("test_total")
        ckpt_format = config["optim"].get("checkpoint_format", "pickle")
        # pickle saves from rank 0 only; orbax saves are collective (every
        # host writes its own param shards)
        if world_rank == 0 or ckpt_format == "orbax":
            utils.save_checkpoint(
                args.checkpoint_path,
                {
                    "params": params,
                    "epoch": epoch,
                    "num_updates": num_updates,
                    "rng": rng,
                },
                save_best=(val_cer < min_val_cer),
                format=ckpt_format,
            )
        min_val_loss = min(val_loss, min_val_loss)
        min_val_cer = min(val_cer, min_val_cer)
        min_val_wer = min(val_wer, min_val_wer)
        logging.info(
            "Validation Set: Loss {:.3f}, CER {:.3f}, WER {:.3f}, "
            "Best Loss {:.3f}, Best CER {:.3f}, Best WER {:.3f}".format(
                val_loss, val_cer, val_wer, min_val_loss, min_val_cer,
                min_val_wer,
            ),
        )
        try:
            logging.info(
                "Timing Info (host+dispatch per phase; device time lands in "
                "train_total via the epoch-end sync): "
                + ", ".join(
                    "{} : {:.2f}ms".format(k, v * 1000.0)
                    for k, v in timers.value().items()
                )
            )
        except ValueError:
            pass
    return params


def main():
    args = parse_args()
    if args.disable_tpu:
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.world_size or None,
            process_id=args.process_id,
        )
    if args.world_size and jax.process_count() != args.world_size:
        logging.warning(
            "world_size=%d requested but jax reports %d processes",
            args.world_size, jax.process_count(),
        )
    train(args)


if __name__ == "__main__":
    main()
