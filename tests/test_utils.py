"""Runtime utility tests: edit distance, samplers, collation, meters,
replabel goldens (mirrors /root/reference/tests/utils_test.py and the
BatchSortedSampler contract at utils.py:60-79)."""

import numpy as np

from gtn_applications_tpu import utils
from gtn_applications_tpu.criterions import pack_replabels, unpack_replabels


def test_edit_distance():
    assert utils.edit_distance("kitten", "sitting") == 3
    assert utils.edit_distance([], []) == 0
    assert utils.edit_distance("abc", "") == 3
    assert utils.edit_distance([1, 2, 3], [1, 3]) == 1


def test_replabel_goldens():
    # reference tests/utils_test.py:16-35 semantics
    assert pack_replabels([0, 0, 1, 1, 1, 2], 2) == [2, 0, 3, 1, 4]
    assert unpack_replabels([2, 0, 3, 1, 4], 2) == [0, 0, 1, 1, 1, 2]


class _SizedDataset:
    def __init__(self, widths):
        self.widths = widths

    def sample_sizes(self):
        return [((w, 8), 3) for w in self.widths]

    def __getitem__(self, i):
        w = self.widths[i]
        return np.full((8, w), i, dtype=np.float32), np.asarray([i], np.int32)

    def __len__(self):
        return len(self.widths)


def test_batch_sorted_sampler_rank_dealing():
    widths = [10, 50, 20, 40, 30, 60, 70, 80]
    ds = _SizedDataset(widths)
    batches_r0 = list(
        utils.BatchSortedSampler(ds, batch_size=4, world_rank=0, world_size=2,
                                 shuffle=False)
    )
    batches_r1 = list(
        utils.BatchSortedSampler(ds, batch_size=4, world_rank=1, world_size=2,
                                 shuffle=False)
    )
    # local batches of 2, width-sorted; rank dealing r + i * world_size
    assert len(batches_r0) == len(batches_r1) == 2
    flat = [i for b in batches_r0 + batches_r1 for i in b]
    assert sorted(flat) == list(range(8))
    for b in batches_r0 + batches_r1:
        ws = [widths[i] for i in b]
        assert ws == sorted(ws)


def test_padding_collate_buckets():
    ds = _SizedDataset([10, 13])
    batch, widths, targets = utils.padding_collate(
        [ds[0], ds[1]], width_multiple=16
    )
    assert batch.shape == (2, 8, 16)  # rounded up to the bucket
    assert widths.tolist() == [10, 13]
    assert (batch[0, :, 10:] == 0).all()


def test_meters():
    m = utils.Meters()
    m.loss += 10.0
    m.num_samples += 2
    m.num_tokens += 10
    m.edit_distance_tokens += 1
    m.num_words += 4
    m.edit_distance_words += 2
    assert abs(m.avg_loss - 5.0) < 1e-9
    assert abs(m.cer - 10.0) < 1e-9
    assert abs(m.wer - 50.0) < 1e-9


def test_subset_sample_sizes():
    ds = _SizedDataset([10, 20, 30, 40])
    sub = utils.Subset(ds, [2, 0])
    sizes = list(sub.sample_sizes())
    assert sizes == [((30, 8), 3), ((10, 8), 3)]
    assert sub[0][0][0, 0] == 2


def test_checkpoint_formats(tmp_path):
    import jax.numpy as jnp

    state = {
        "params": {"model": {"w": jnp.arange(6.0).reshape(2, 3)},
                   "criterion": {}},
        "epoch": 2,
        "num_updates": 9,
        "rng": jnp.asarray(np.array([3, 4], np.uint32)),
    }
    for fmt in ("pickle", "orbax"):
        d = str(tmp_path / fmt)
        utils.save_checkpoint(d, state, save_best=True, format=fmt)
        for load_last in (False, True):
            back = utils.load_checkpoint(d, load_last=load_last)
            assert int(back["epoch"]) == 2
            assert int(back["num_updates"]) == 9
            np.testing.assert_array_equal(
                np.asarray(back["params"]["model"]["w"]),
                np.asarray(state["params"]["model"]["w"]),
            )


def test_dataloader_propagates_worker_exceptions():
    """A bad sample must fail the epoch at the consumer, not deadlock
    the prefetch queue (regression: a producer-thread exception used to
    hang every thread on a futex)."""
    import pytest as _pytest

    from gtn_applications_tpu import utils as U

    class Bad:
        def sample_sizes(self):
            return [((4, 4), 1)] * 8

        def __getitem__(self, i):
            if i >= 4:
                raise ValueError("bad sample")
            return (np.zeros((4, 4), np.float32), np.zeros(1, np.int32))

        def __len__(self):
            return 8

    for workers in (1, 3):
        ds = Bad()
        loader = U.DataLoader(
            ds, U.BatchSortedSampler(ds, 2, shuffle=False),
            num_workers=workers,
        )
        with _pytest.raises(ValueError, match="bad sample"):
            list(loader)
