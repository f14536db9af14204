"""Experiment runtime: factories, batching, metrics, timers.

Capability parity with /root/reference/utils.py, redesigned for the TPU
execution model: the batch sampler emits width-sorted *bucketed* static
shapes (so jit compiles a handful of step variants instead of one per
width), metrics sync with a single device reduction instead of NCCL
all_reduce, and timers bracket device work with ``block_until_ready``.
"""

import importlib.util
import logging
import os
import pickle
import sys
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Edit distance (replaces the `editdistance` pip dependency)
# ---------------------------------------------------------------------------


def edit_distance(a, b) -> int:
    """Levenshtein distance over any two sequences.

    Dispatches to the native C++ DP (wfst.native) when available — the
    per-step eval metric cost in the reference came from the external
    `editdistance` C module; this keeps the same property."""
    a, b = list(a), list(b)
    from .wfst import native as _native

    if _native.available():
        # map arbitrary hashable items to int ids
        ids = {}
        def enc(seq):
            out = np.empty(len(seq), dtype=np.int32)
            for i, x in enumerate(seq):
                out[i] = ids.setdefault(x, len(ids))
            return out
        return _native.edit_distance_i32(enc(a), enc(b))
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def compute_edit_distance(predictions, targets, preprocessor):
    """Token and word edit distances (reference train.py:74-87)."""
    tokens_dist = words_dist = n_tokens = n_words = 0
    for p, t in zip(predictions, targets):
        p = preprocessor.tokens_to_text(p)
        t = preprocessor.to_text(t)
        pw = list(filter(None, p.split(preprocessor.wordsep)))
        tw = list(filter(None, t.split(preprocessor.wordsep)))
        tokens_dist += edit_distance(p, t)
        words_dist += edit_distance(pw, tw)
        n_tokens += len(t)
        n_words += len(tw)
    return tokens_dist, words_dist, n_tokens, n_words


# ---------------------------------------------------------------------------
# Data loading
# ---------------------------------------------------------------------------


def module_from_file(module_name, file_path):
    """Import a module by path and register it (stdlib importlib recipe;
    the reference uses it for dynamic dataset loading, utils.py:38)."""
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def sample_sizes(self):
        sizes = list(self.dataset.sample_sizes())
        for idx in self.indices:
            yield sizes[idx]

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    @property
    def collate_fn(self):
        # forward a dataset-provided collate (e.g. iamdb fast_pipeline)
        return getattr(self.dataset, "collate_fn", None)

    def __len__(self):
        return len(self.indices)


class BatchSortedSampler:
    """Width-sorted batching with rank dealing (reference utils.py:60-79).

    Samples are sorted by input width, grouped into local batches of
    ``batch_size // world_size``, and batch ``rank + i * world_size`` is
    dealt to each rank.  Shuffling permutes batch order only, preserving
    the width homogeneity that keeps padding (and distinct jit shapes) low.
    """

    def __init__(self, dataset, batch_size, world_rank=0, world_size=1, shuffle=True, seed=0):
        local_batchsize = batch_size // world_size
        widths = (in_size[0] for in_size, _ in dataset.sample_sizes())
        sorted_indices = [
            i for i, _ in sorted(enumerate(widths), key=lambda x: x[1])
        ]
        chunks = [sorted_indices[i:i + local_batchsize]
                  for i in range(0, len(sorted_indices), local_batchsize)]
        # deal chunk (rank + i * world_size) to this rank
        self.length = len(chunks) // world_size
        self.batches = chunks[world_rank::world_size][: self.length]
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)

    def __iter__(self):
        order = (
            self._rng.permutation(self.length) if self.shuffle else range(self.length)
        )
        return (self.batches[i] for i in order)

    def __len__(self):
        return self.length


def round_up(x, multiple):
    return ((max(int(x), 1) + multiple - 1) // multiple) * multiple


def padding_collate(samples, width_multiple=16):
    """Zero-pad inputs to a bucketed max width and stack.

    Returns (inputs [B, H, W], input_widths [B], targets list).  Bucketing
    the width (SURVEY hard part #3) bounds the number of distinct compiled
    step shapes.
    """
    inputs, targets = zip(*samples)
    h = inputs[0].shape[0]
    max_w = round_up(max(ip.shape[1] for ip in inputs), width_multiple)
    batch = np.zeros((len(inputs), h, max_w), dtype=np.float32)
    widths = np.zeros((len(inputs),), dtype=np.int32)
    for e, ip in enumerate(inputs):
        batch[e, :, : ip.shape[1]] = ip
        widths[e] = ip.shape[1]
    return batch, widths, list(targets)


class DataLoader:
    """Loader with background-thread prefetch: sampler -> collated numpy
    batches, with up to ``prefetch`` batches prepared ahead so host data
    work (augmentation, collation, target padding) overlaps device steps
    (the reference leans on torch DataLoader workers, utils.py:28-35).

    ``num_workers`` > 1 fans batch production over that many threads
    (batch i is built by thread i % K and consumed in order, so batch
    order is identical to the single-producer path).  Threads, not
    processes: PIL/numpy release the GIL for the heavy transforms, and
    os.fork() after JAX initialization deadlocks on this stack.  The
    augment RNG is per-thread (random.random's lock-free thread-local
    use is safe; sequences differ from the 1-worker path but the
    distribution is identical)."""

    def __init__(self, dataset, sampler, collate_fn=padding_collate,
                 prefetch=2, num_workers=1):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.num_workers = max(1, int(num_workers))

    def _build(self, batch_indices):
        return self.collate_fn([self.dataset[i] for i in batch_indices])

    class _Raise:
        """Producer-thread exception carrier: re-raised at the consumer
        so a bad sample fails the epoch instead of deadlocking the
        queue (a silent futex hang was the previous failure mode)."""

        def __init__(self, exc):
            self.exc = exc

    def __iter__(self):
        if self.prefetch <= 0:
            for batch_indices in self.sampler:
                yield self._build(batch_indices)
            return
        import queue as queue_mod
        import threading

        def produce_into(q, indices_iter):
            try:
                for batch_indices in indices_iter:
                    q.put(self._build(batch_indices))
            except BaseException as exc:  # noqa: BLE001 — carried over
                q.put(DataLoader._Raise(exc))

        def check(item):
            if isinstance(item, DataLoader._Raise):
                raise item.exc
            return item

        K = self.num_workers
        if K == 1:
            q = queue_mod.Queue(maxsize=self.prefetch)

            def produce():
                produce_into(q, iter(self.sampler))
                q.put(None)

            worker = threading.Thread(target=produce, daemon=True)
            worker.start()
            while True:
                item = check(q.get())
                if item is None:
                    break
                yield item
            worker.join()
            return

        batches = list(self.sampler)
        depth = max(1, -(-self.prefetch // K))
        queues = [queue_mod.Queue(maxsize=depth) for _ in range(K)]
        workers = [
            threading.Thread(
                target=produce_into,
                args=(queues[k], (batches[i] for i in
                                  range(k, len(batches), K))),
                daemon=True,
            )
            for k in range(K)
        ]
        for w in workers:
            w.start()
        for i in range(len(batches)):
            yield check(queues[i % K].get())
        for w in workers:
            w.join()

    def __len__(self):
        return len(self.sampler)


def data_loader(dataset, config, world_rank=0, world_size=1, seed=0):
    num_samples = config["data"].get("num_samples", None)
    if num_samples is not None:
        logging.info(f"Using {num_samples} of {len(dataset)}.")
        rng = np.random.RandomState(seed)
        dataset = Subset(dataset, rng.permutation(len(dataset))[:num_samples])
    return DataLoader(
        dataset,
        BatchSortedSampler(
            dataset, config["optim"]["batch_size"], world_rank, world_size,
            seed=seed,
        ),
        # datasets may provide a batch-vectorized collate (iamdb
        # fast_pipeline); the generic padding_collate is the default
        collate_fn=getattr(dataset, "collate_fn", None) or padding_collate,
        # config extension (documented in docs/design.md): fan batch
        # production over N threads when the augment stack is the bound
        num_workers=config["data"].get("num_workers", 1),
    )


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


@dataclass
class Meters:
    loss: float = 0.0
    num_samples: int = 0
    num_tokens: int = 0
    edit_distance_tokens: int = 0
    num_words: int = 0
    edit_distance_words: int = 0

    def sync(self):
        """Cross-process reduction (replaces reference utils.py:107-126
        CUDA all_reduce): a psum over all devices via a one-shot pmap-free
        collective using jax.process_count-aware allreduce."""
        vals = jnp.asarray(
            [
                self.loss,
                self.num_samples,
                self.num_tokens,
                self.edit_distance_tokens,
                self.num_words,
                self.edit_distance_words,
            ],
            dtype=jnp.float32,
        )
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            vals = multihost_utils.process_allgather(vals).sum(axis=0)
        (
            self.loss,
            self.num_samples,
            self.num_tokens,
            self.edit_distance_tokens,
            self.num_words,
            self.edit_distance_words,
        ) = np.asarray(vals).tolist()

    # derived rates (reference utils.py:128-146 semantics: zero-safe,
    # error rates in percent)
    @staticmethod
    def _rate(total, count, scale=1.0):
        return scale * total / count if count > 0 else 0

    @property
    def avg_loss(self):
        return self._rate(self.loss, self.num_samples)

    @property
    def cer(self):
        return self._rate(self.edit_distance_tokens, self.num_tokens, 100.0)

    @property
    def wer(self):
        return self._rate(self.edit_distance_words, self.num_words, 100.0)


# ---------------------------------------------------------------------------
# Timers (reference utils.py:150-229; device timing brackets with
# block_until_ready instead of CUDA events)
# ---------------------------------------------------------------------------


class Timer:
    def __init__(self, keys):
        self.keys = keys
        self.reset()

    def start(self, key):
        self.running_time[key] = time.perf_counter()
        return self

    def stop(self, key, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        self.total_time[key] += time.perf_counter() - self.running_time[key]
        self.n[key] += 1
        self.running_time[key] = None
        return self

    def reset(self):
        self.total_time = {k: 0.0 for k in self.keys}
        self.running_time = {k: None for k in self.keys}
        self.n = {k: 0 for k in self.keys}
        return self

    def value(self):
        """Mean seconds per start/stop pair, for phases that ever ran.

        Phases with no samples are skipped rather than raising: the fused
        jitted train step has no separate crit_fwd/bwd/optim brackets, so
        those reference phase keys legitimately stay empty here.
        """
        vals = {}
        for k in self.keys:
            if self.n[k] == 0:
                continue
            vals[k] = self.total_time[k] / self.n[k]
        if not vals:
            raise ValueError("Trying to divide by zero in TimeMeter")
        return vals


CudaTimer = Timer  # API-compat alias; device sync is explicit via stop(sync=)


# ---------------------------------------------------------------------------
# Factories
# ---------------------------------------------------------------------------


def load_model(model_type, input_size, output_size, config):
    """Model factory (reference utils.py:232-242).  An optional "dtype"
    key ("bfloat16" / "float32") selects the compute dtype for TDS/TDS2d
    encoders — MXU-native bf16 activations with fp32 params and fp32
    logits."""
    import jax.numpy as jnp

    from .models import RNN, TDS, TDS2d, TDS2dTransducer

    config = dict(config)
    dtype = config.pop("dtype", None)
    if dtype is not None and model_type in ("tds", "tds2d"):
        config["dtype"] = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    if model_type == "rnn":
        return RNN(input_size=input_size, output_size=output_size, **config)
    elif model_type == "tds":
        return TDS(input_size=input_size, output_size=output_size, **config)
    elif model_type == "tds2d":
        return TDS2d(input_size=input_size, output_size=output_size, **config)
    elif model_type == "tds2d_transducer":
        return TDS2dTransducer(
            input_size=input_size, output_size=output_size, **config
        )
    else:
        raise ValueError(f"Unknown model type {model_type}")


def load_criterion(criterion_type, preprocessor, config):
    """Criterion factory (reference utils.py:245-273, plus STC which the
    reference ships but never wires in)."""
    from . import wfst
    from .criterions import ASG, CTC, STC, Transducer

    num_tokens = preprocessor.num_tokens
    if criterion_type == "asg":
        num_replabels = config.get("num_replabels", 0)
        use_garbage = config.get("use_garbage", True)
        return (
            ASG(num_tokens, num_replabels, use_garbage),
            num_tokens + num_replabels + int(use_garbage),
        )
    elif criterion_type == "ctc":
        use_pt = config.get("use_pt", True)
        impl = config.get("impl", "auto")
        chunk = config.get("chunk", None)
        return CTC(num_tokens, use_pt, impl, chunk), num_tokens + 1
    elif criterion_type == "stc":
        # model emits [blank, tokens...]; star channels are internal.
        # NOTE: the STC class defaults to reduction="none" (matching the
        # reference class, stc.py:135), but this factory defaults to "mean"
        # so configs compose with the other criteria's training semantics —
        # the reference never wires STC into its factory, so there is no
        # strict parity target; set criterion.reduction to override.
        return (
            STC(
                blank_idx=0,
                p0=config.get("p0", 1.0),
                plast=config.get("plast", 1.0),
                thalf=config.get("thalf", 1.0),
                reduction=config.get("reduction", "mean"),
                shift_targets=1,
            ),
            num_tokens + 1,
        )
    elif criterion_type == "transducer":
        blank = config.get("blank", "none")
        transitions = config.get("transitions", None)
        if transitions is not None:
            transitions = wfst.load(transitions)
        criterion = Transducer(
            preprocessor.tokens, preprocessor.graphemes_to_index,
            blank=blank, transitions=transitions, reduction="mean",
            ngram=config.get("ngram", 0),
            allow_repeats=config.get("allow_repeats", True),
        )
        return criterion, num_tokens + int(blank != "none")
    else:
        raise ValueError(f"Unknown criterion type {criterion_type}")


# ---------------------------------------------------------------------------
# Checkpointing (replaces torch.save state_dicts, train.py:111-120)
# ---------------------------------------------------------------------------


def save_checkpoint(checkpoint_path, state, save_best=False, format="pickle"):
    """Persist the train state.

    format="pickle" (default) gathers everything to host and writes one
    file per checkpoint — fine for single-host runs.  format="orbax"
    writes through orbax-checkpoint: sharded jax.Arrays are saved without
    gathering (each host writes only its shards), which is the multi-host
    path (reference utils.py:268-274 uses torch.save; per-shard writes
    replace its rank-0 gather)."""
    os.makedirs(checkpoint_path, exist_ok=True)
    if format == "orbax":
        _orbax_save(os.path.join(checkpoint_path, "model.orbax"), state)
        if save_best:
            _orbax_save(
                os.path.join(checkpoint_path, "model.orbax.best"), state
            )
        return
    payload = jax.device_get(state)
    path = os.path.join(checkpoint_path, "model.checkpoint")
    with open(path, "wb") as fid:
        pickle.dump(payload, fid)
    if save_best:
        with open(path + ".best", "wb") as fid:
            pickle.dump(payload, fid)


def _orbax_save(path, state):
    import orbax.checkpoint as ocp

    def to_host(x):
        # pre-transfer fully-addressable arrays: orbax's internal async
        # device->host path stalls on some TPU transports, and for
        # replicated params the copy is needed anyway.  Arrays sharded
        # across hosts (not fully addressable) stay on device so orbax
        # writes only the local shards.
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return np.asarray(x)
        return x

    state = jax.tree_util.tree_map(to_host, state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(checkpoint_path, load_last=False):
    """Load a train state; auto-detects orbax vs pickle checkpoints."""
    suffix = "" if load_last else ".best"
    opath = os.path.join(checkpoint_path, "model.orbax" + suffix)
    if os.path.isdir(opath):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(opath))
    path = os.path.join(checkpoint_path, "model.checkpoint" + suffix)
    with open(path, "rb") as fid:
        return pickle.load(fid)


def load_from_checkpoint(checkpoint_path, load_last=False):
    """Reference-API-shaped loader (utils.py:276-283): returns the
    (model_params, criterion_params) pair from a saved train state."""
    state = load_checkpoint(checkpoint_path, load_last)
    params = state["params"]
    return params["model"], params["criterion"]
