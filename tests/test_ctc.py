"""CTC golden-value tests.

Golden loss/gradient tables match /root/reference/tests/gtn_ctc_test.py
(the classic 5x6 CTC table) so the TPU lattice scan is verified against the
same oracle the reference used.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import CTC
from gtn_applications_tpu.criterions.common import pad_targets
from gtn_applications_tpu.ops import lattice


def ctc_loss_fn(log_probs, targets_list, blank, reduction="none"):
    targets, lengths = pad_targets(targets_list)
    return lattice.ctc_loss(log_probs, targets, lengths, blank, reduction)


def test_fwd_trivial():
    T, N = 2, 2
    # log_probs chosen so the target path has probability one
    emissions = jnp.log(jnp.array([[1.0, 0.0], [0.0, 1.0]]) + 1e-35).reshape(1, T, N)
    loss = ctc_loss_fn(emissions, [[0, 1]], blank=0)
    # single alignment: label 0 then label 1 -> -log(1) = 0... blank=0 makes
    # state structure [b,0,b,1,b]; the only length-2 path to accept is (0,1).
    assert abs(float(loss)) < 1e-4


def test_fwd_uniform():
    # Uniform emissions: score = log(num_alignments * p^T)
    T, N = 3, 3
    log_probs = jnp.full((1, T, N), math.log(1.0 / N))
    # target "ab" (indices 0,1), blank=2: alignments of [a,b] into 3 frames:
    # aab, abb, ab_, a_b, _ab  -> 5 paths
    loss = ctc_loss_fn(log_probs, [[0, 1]], blank=2)
    expected = -math.log(5 * (1.0 / 27))
    assert abs(float(loss) - expected) < 1e-4


def test_ctc_golden_table():
    T, N = 5, 6
    emissions = np.array(
        [
            0.633766, 0.221185, 0.0917319, 0.0129757, 0.0142857, 0.0260553,
            0.111121, 0.588392, 0.278779, 0.0055756, 0.00569609, 0.010436,
            0.0357786, 0.633813, 0.321418, 0.00249248, 0.00272882, 0.0037688,
            0.0663296, 0.643849, 0.280111, 0.00283995, 0.0035545, 0.00331533,
            0.458235, 0.396634, 0.123377, 0.00648837, 0.00903441, 0.00623107,
        ],
        dtype=np.float32,
    ).reshape(1, T, N)
    log_probs = jnp.log(jnp.asarray(emissions))
    targets = [[0, 1, 2, 1, 0]]

    # The golden grad table is w.r.t. pre-softmax logits: the reference
    # criterion applies log_softmax internally (ctc.py:107) and each row of
    # the emission table already sums to one, so the loss is unchanged.
    def loss_fn(logits):
        lp = jax.nn.log_softmax(logits, axis=2)
        return ctc_loss_fn(lp, targets, blank=N - 1, reduction="none")

    loss, grad = jax.value_and_grad(loss_fn)(log_probs)
    assert abs(float(loss) - 3.34211) < 1e-4

    expected_grad = np.array(
        [
            -0.366234, 0.221185, 0.0917319, 0.0129757, 0.0142857, 0.0260553,
            0.111121, -0.411608, 0.278779, 0.0055756, 0.00569609, 0.010436,
            0.0357786, 0.633813, -0.678582, 0.00249248, 0.00272882, 0.0037688,
            0.0663296, -0.356151, 0.280111, 0.00283995, 0.0035545, 0.00331533,
            -0.541765, 0.396634, 0.123377, 0.00648837, 0.00903441, 0.00623107,
        ],
        dtype=np.float32,
    ).reshape(1, T, N)
    np.testing.assert_allclose(np.asarray(grad), expected_grad, rtol=1e-3, atol=1e-5)


def test_batched_and_padded_consistency():
    rng = np.random.RandomState(0)
    T, N = 12, 7
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(3, T, N).astype(np.float32)), 2)
    tgts = [[0, 1, 2], [3, 3], [1, 2, 3, 4, 5]]
    # batched padded loss == mean of singles
    batched = ctc_loss_fn(lp, tgts, blank=N - 1, reduction="mean")
    singles = [
        float(ctc_loss_fn(lp[i : i + 1], [tgts[i]], blank=N - 1, reduction="mean"))
        for i in range(3)
    ]
    assert abs(float(batched) - np.mean(singles)) < 1e-4


def test_input_lengths():
    rng = np.random.RandomState(1)
    T, N = 10, 5
    x = rng.randn(1, T, N).astype(np.float32)
    lp_full = jax.nn.log_softmax(jnp.asarray(x[:, :7]), 2)
    lp_pad = jax.nn.log_softmax(jnp.asarray(x), 2)
    tgts, lens = pad_targets([[0, 1, 2]])
    a = lattice.ctc_loss(lp_full, tgts, lens, blank=N - 1)
    b = lattice.ctc_loss(
        lp_pad, tgts, lens, blank=N - 1, input_lengths=jnp.array([7])
    )
    assert abs(float(a) - float(b)) < 1e-4


def test_viterbi_collapse():
    crit = CTC(blank=2)
    outputs = jnp.asarray(
        np.array(
            [
                [[5, 0, 0], [5, 0, 0], [0, 0, 5], [0, 5, 0], [0, 5, 0]],
            ],
            dtype=np.float32,
        )
    )
    preds = crit.viterbi(outputs)
    assert [p.tolist() for p in preds] == [[0, 1]]


def test_empty_target():
    T, N = 4, 3
    lp = jax.nn.log_softmax(jnp.zeros((1, T, N)), 2)
    loss = ctc_loss_fn(lp, [[]], blank=N - 1, reduction="mean")
    # all-blank path only: prob (1/3)^4
    assert abs(float(loss) - 4 * math.log(3.0)) < 1e-4
