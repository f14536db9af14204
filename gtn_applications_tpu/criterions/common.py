"""Shared helpers for criteria: ragged target padding with shape bucketing."""

import numpy as np
import jax.numpy as jnp


def round_up(x, multiple):
    return ((max(int(x), 1) + multiple - 1) // multiple) * multiple


def pad_targets(targets, multiple=8, pad_value=0):
    """Pad a ragged list of int sequences to [B, L] plus lengths [B].

    L is rounded up to ``multiple`` to bound the number of distinct jit
    shapes (SURVEY.md hard part #3: static-shape bucketing).  Already-padded
    arrays pass through with inferred full lengths.
    """
    if isinstance(targets, (np.ndarray, jnp.ndarray)) and targets.ndim == 2:
        lengths = jnp.full((targets.shape[0],), targets.shape[1], dtype=jnp.int32)
        return jnp.asarray(targets, dtype=jnp.int32), lengths
    seqs = [np.asarray(t, dtype=np.int32).reshape(-1) for t in targets]
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    L = round_up(max((len(s) for s in seqs), default=1), multiple)
    out = np.full((len(seqs), L), pad_value, dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return jnp.asarray(out), jnp.asarray(lengths)
