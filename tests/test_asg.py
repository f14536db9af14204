"""ASG golden-value tests, mirroring /root/reference/tests/gtn_asg_test.py."""

import jax
import jax.numpy as jnp
import numpy as np

from gtn_applications_tpu.criterions import asg as asg_mod
from gtn_applications_tpu.criterions.common import pad_targets
from gtn_applications_tpu.ops import lattice

EMISSIONS = np.asarray([
    -0.4340, -0.0254, 0.3667, 0.4180, -0.3805, -0.1707,
    0.1060, 0.3631, -0.1122, -0.3825, -0.0031, -0.3801,
    0.0443, -0.3795, 0.3194, -0.3130, 0.0094, 0.1560,
    0.1252, 0.2877, 0.1997, -0.4554, 0.2774, -0.2526,
    -0.4001, -0.2402, 0.1295, 0.0172, 0.1805, -0.3299,
    0.3298, -0.2259, -0.0959, 0.4909, 0.2996, -0.2543,
    -0.2863, 0.3239, -0.3988, 0.0732, -0.2107, -0.4739,
    -0.0906, 0.0480, -0.1301, 0.3975, -0.3317, -0.1967,
    0.4372, -0.2006, 0.0094, 0.3281, 0.1873, -0.2945,
    0.2399, 0.0320, -0.3768, -0.2849, -0.2248, 0.3186,
    0.0225, -0.3867, -0.1929, -0.2904, -0.4958, -0.2533,
    0.4001, -0.1517, -0.2799, -0.2915, 0.4198, 0.4506,
    0.1446, -0.4753, -0.0711, 0.2876, -0.1851, -0.1066,
    0.2081, -0.1190, -0.3902, -0.1668, 0.1911, -0.2848,
    -0.3846, 0.1175, 0.1052, 0.2172, -0.0362, 0.3055,
], np.float32).reshape(3, 5, 6)

LABELS = [[2, 1, 5, 1, 3], [4, 3, 5], [3, 2, 2, 1]]


def test_asg_golden_fwd_bwd():
    N, B = 6, 3
    emissions = jnp.asarray(EMISSIONS)
    transitions = jnp.zeros((N + 1, N))
    targets, lengths = pad_targets(LABELS)

    def loss_fn(em, tr):
        return lattice.asg_loss(em, tr, targets, lengths, reduction="none")

    (loss, (g_em, g_tr)) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        emissions, transitions
    )
    assert abs(float(loss) - 7.47995) < 1e-4

    expected_grad = np.asarray([
        0.1060, 0.1595, -0.7639, 0.2485, 0.1118, 0.1380,
        0.1915, -0.7524, 0.1539, 0.1175, 0.1717, 0.1178,
        0.1738, 0.1137, 0.2288, 0.1216, 0.1678, -0.8057,
        0.1766, -0.7923, 0.1902, 0.0988, 0.2056, 0.1210,
        0.1212, 0.1422, 0.2059, -0.8160, 0.2166, 0.1300,
        0.2029, 0.1164, 0.1325, 0.2383, -0.8032, 0.1131,
        0.1414, 0.2602, 0.1263, -0.3441, -0.3009, 0.1172,
        0.1557, 0.1788, 0.1496, -0.5498, 0.0140, 0.0516,
        0.2306, 0.1219, 0.1503, -0.4244, 0.1796, -0.2579,
        0.2149, 0.1745, 0.1160, 0.1271, 0.1350, -0.7675,
        0.2195, 0.1458, 0.1770, -0.8395, 0.1307, 0.1666,
        0.2148, 0.1237, -0.6613, -0.1223, 0.2191, 0.2259,
        0.2002, 0.1077, -0.8386, 0.2310, 0.1440, 0.1557,
        0.2197, -0.1466, -0.5742, 0.1510, 0.2160, 0.1342,
        0.1050, -0.8265, 0.1714, 0.1917, 0.1488, 0.2094,
    ], np.float32).reshape(3, 5, 6) / B
    np.testing.assert_allclose(np.asarray(g_em), expected_grad, rtol=2e-3, atol=1e-4)

    expected_trans_grad = (
        np.asarray([
            0.3990, 0.3396, 0.3486, 0.3922, 0.3504, 0.3155,
            0.3666, 0.0116, -1.6678, 0.3737, 0.3361, -0.7152,
            0.3468, 0.3163, -1.1583, -0.6803, 0.3216, 0.2722,
            0.3694, -0.6688, 0.3047, -0.8531, -0.6571, 0.2870,
            0.3866, 0.3321, 0.3447, 0.3664, -0.2163, 0.3039,
            0.3640, -0.6943, 0.2988, -0.6722, 0.3215, -0.1860,
        ], np.float32).reshape(6, 6)
        / B
    )
    np.testing.assert_allclose(
        np.asarray(g_tr)[1:], expected_trans_grad, rtol=2e-3, atol=1e-4
    )


def test_replabel_pack_unpack():
    # Goldens from /root/reference/tests/utils_test.py semantics
    assert asg_mod.pack_replabels([0, 1, 1, 2], 1) == [1, 2, 0, 3]
    assert asg_mod.unpack_replabels([1, 2, 0, 3], 1) == [0, 1, 1, 2]
    tokens = [0, 0, 0, 1, 2, 2, 3]
    for k in range(1, 4):
        assert asg_mod.unpack_replabels(asg_mod.pack_replabels(tokens, k), k) == tokens


def test_asg_module_loss_runs():
    crit = asg_mod.ASG(num_classes=4, num_replabels=1, use_garbage=True)
    emissions = jnp.asarray(EMISSIONS)
    loss = crit(emissions, [[2, 1, 3], [0, 0, 1], [3]])
    assert np.isfinite(float(loss))


def test_asg_viterbi_golden():
    # Mirrors gtn_asg_test.py:107-124
    T, N = 4, 3
    num_replabels = 1
    crit = asg_mod.ASG(num_classes=N, num_replabels=num_replabels, use_garbage=False)
    inputs = jnp.asarray(
        np.array(
            [0, 0, 0, 7, 0, 5, 4, 3, 0, 5, 8, 5, 0, 5, 4, 3], dtype=np.float32
        ).reshape(1, T, N + num_replabels)
    )
    trans = np.array(
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 2, 0, 2, 0, 0],
        dtype=np.float32,
    ).reshape(N + num_replabels + 1, N + num_replabels)
    preds = crit.viterbi(inputs, {"transitions": jnp.asarray(trans)})
    assert preds[0].tolist() == [2, 1, 0]


def test_asg_fal_fcc_sanity():
    # fal <= fcc always (the aligned paths are a subset)
    rng = np.random.RandomState(3)
    B, T, N = 4, 15, 8
    em = jnp.asarray(rng.randn(B, T, N).astype(np.float32))
    tr = jnp.asarray(rng.randn(N + 1, N).astype(np.float32) * 0.1)
    tgts, lens = pad_targets([[0, 1, 2], [3, 3, 4, 5], [6], [7, 0, 7, 0, 7]])
    fcc = lattice.asg_fcc_score(em, tr)
    fal = lattice.asg_fal_score(em, tr, tgts, lens)
    assert np.all(np.asarray(fal) <= np.asarray(fcc) + 1e-4)
