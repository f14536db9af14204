"""Evaluation driver (parity with /root/reference/test.py): load a config +
checkpoint, run a split, print per-utterance HYP/REF and aggregate
loss/CER/WER."""

import argparse
import json
import logging

import jax

from . import utils
from .parallel import mesh as pmesh
from .train import (
    input_time_axis,
    load_experiment,
    make_eval_step,
    make_mesh,
    output_lengths,
    shard_batch,
    shard_prepared,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a model.")
    parser.add_argument("--config", type=str, help="JSON configuration file.")
    parser.add_argument("--checkpoint_path", default="/tmp/", type=str)
    parser.add_argument(
        "--load_last", action="store_true",
        help="Load the last saved model instead of the best",
    )
    parser.add_argument(
        "--split",
        default="test",
        choices=["train", "validation", "test"],
    )
    parser.add_argument(
        "--disable_tpu", action="store_true",
        help="Force CPU execution (parity with train.py)",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return args


def run_test(args):
    if getattr(args, "disable_tpu", False):
        jax.config.update("jax_platforms", "cpu")
    with open(args.config, "r") as fid:
        config = json.load(fid)

    dataset, preprocessor, criterion, model, input_size = load_experiment(config)
    data_path = config["data"]["data_path"]
    ds_kwargs = (
        {"fast_pipeline": True}
        if config["data"].get("fast_pipeline", False) else {}
    )
    ds = dataset.Dataset(data_path, preprocessor, split=args.split,
                         **ds_kwargs)
    loader = utils.data_loader(ds, config)

    state = utils.load_checkpoint(args.checkpoint_path, load_last=args.load_last)
    params = state["params"]
    if hasattr(criterion, "eval"):
        criterion.eval()

    mesh = make_mesh(config["optim"].get("seq_parallel", 1))
    eval_step = make_eval_step(model, criterion)
    meters = utils.Meters()
    pending_losses = []  # device scalars: one end-of-run readback

    def consume(pending):
        loss, handle, targets = pending
        pending_losses.append(loss * len(targets))
        meters.num_samples += len(targets)
        predictions = criterion.viterbi_finalize(handle)
        for p, t in zip(predictions, targets):
            p_text = preprocessor.tokens_to_text(p)
            t_text = preprocessor.to_text(t)
            print(f"HYP: {p_text}")
            print(f"REF: {t_text}")
            print("=" * 80)
        td, wd, nt, nw = utils.compute_edit_distance(
            predictions, targets, preprocessor
        )
        meters.edit_distance_tokens += td
        meters.num_tokens += nt
        meters.edit_distance_words += wd
        meters.num_words += nw

    # grouped pipeline (see train.test): decode readbacks for GROUP batches
    # are fetched in one jax.device_get
    GROUP = 4
    group = []

    def flush():
        fetched = jax.device_get([h for (_, h, _) in group])
        for (loss, _, targets), handle in zip(group, fetched):
            consume((loss, handle, targets))
        group.clear()

    use_lengths = config["optim"].get("use_input_lengths", False)
    multihost = jax.process_count() > 1
    for inputs, widths, targets in loader:
        inputs = shard_batch(
            inputs, mesh,
            input_time_axis(inputs, preprocessor.num_features),
        )
        prepared = shard_prepared(
            criterion.prepare(targets), mesh, len(targets)
        )
        lens = output_lengths(model, widths) if use_lengths else None
        glens = shard_batch(lens, mesh) if (use_lengths and multihost) else lens
        loss, outputs = eval_step(params, inputs, prepared, glens)
        if multihost:
            outputs = pmesh.local_rows(outputs)
        handle = criterion.viterbi_dispatch(outputs, params["criterion"], lens)
        group.append((loss, handle, targets))
        if len(group) >= GROUP:
            flush()
    flush()
    if pending_losses:
        import jax.numpy as jnp

        meters.loss += float(jnp.sum(jnp.stack(pending_losses)))
    if multihost:
        meters.sync()
    print(
        "Loss {:.3f}, CER {:.3f}, WER {:.3f}".format(
            meters.avg_loss, meters.cer, meters.wer
        )
    )
    return meters


def main():
    args = parse_args()
    run_test(args)


if __name__ == "__main__":
    main()
