"""STC's reason to exist: training from PARTIAL labels.

Drop ~33% of the target tokens on the synthetic glyph task, train a tiny
per-frame linear classifier with the STC loss (star insertions with the
annealed penalty absorbing the unlabeled glyphs), and assert the decoded
transcripts on held-out data recover the FULL targets well below the drop
rate.  At one frame per glyph, a CTC lattice is structurally infeasible
for adjacent repeated characters (no room for a separator blank) while
the self-less STC graph's token-to-token skip handles them — the loss
stays finite and trainable throughout.

Deterministic (seeded data, drops, and init on the CPU backend); measured
at authoring time: test CER 16.2 vs the 32.8% dropped fraction.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # inline training to convergence (~minutes)


STRIDE = 12  # glyph width: one frame per character


def _featurize(ds):
    feats, fulls = [], []
    for i in range(len(ds)):
        img, tgt = ds[i]
        T = img.shape[1] // STRIDE
        feats.append(img[:, : T * STRIDE].T.reshape(T, -1).astype(np.float32))
        fulls.append(list(np.asarray(tgt)))
    Tm = max(f.shape[0] for f in feats)
    X = np.zeros((len(feats), Tm, feats[0].shape[1]), np.float32)
    lens = np.zeros(len(feats), np.int32)
    for i, f in enumerate(feats):
        X[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
    return X, lens, fulls


def test_stc_recovers_dropped_labels():
    import jax
    import jax.numpy as jnp
    import optax

    from gtn_applications_tpu.criterions import STC
    from gtn_applications_tpu.datasets import synthetic
    from gtn_applications_tpu.utils import edit_distance

    pre = synthetic.Preprocessor("/tmp", num_features=16)
    Xtr, ltr, full_tr = _featurize(synthetic.Dataset("/tmp", pre, "train"))
    Xte, lte, full_te = _featurize(synthetic.Dataset("/tmp", pre, "test"))

    rng = np.random.RandomState(0)
    partial = [[t for t in tgt if rng.rand() > 0.3] for tgt in full_tr]
    drop_rate = 1 - sum(map(len, partial)) / sum(map(len, full_tr))
    assert 0.25 < drop_rate < 0.4  # sanity on the corruption level

    C = pre.num_tokens + 1  # blank at channel 0
    crit = STC(
        blank_idx=0, p0=1.0, plast=0.02, thalf=80.0,
        reduction="mean", shift_targets=1,
    )
    params = {
        "W": jax.random.normal(jax.random.PRNGKey(0), (Xtr.shape[-1], C)) * 0.1,
        "b": jnp.zeros((C,)),
    }
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, X, lens, prep):
        def f(p):
            lp = jax.nn.log_softmax(X @ p["W"] + p["b"], 2)
            return crit.loss({}, lp, prep, input_lengths=lens)
        loss, g = jax.value_and_grad(f)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    Xtr_d, ltr_d = jnp.asarray(Xtr), jnp.asarray(ltr)
    loss = None
    for _ in range(400):
        prep = crit.prepare(partial)  # bumps the annealing step
        params, opt_state, loss = step(params, opt_state, Xtr_d, ltr_d, prep)
    assert np.isfinite(float(loss))

    def cer(X, lens, fulls):
        lp = jax.nn.log_softmax(jnp.asarray(X) @ params["W"] + params["b"], 2)
        preds = crit.viterbi(np.asarray(lp), input_lengths=lens)
        errs = chars = 0
        for p, t in zip(preds, fulls):
            errs += edit_distance(list(p), t)
            chars += len(t)
        return errs / chars

    test_cer = cer(Xte, lte, full_te)
    # recovery: held-out decodes must beat the drop rate by a wide margin
    # (measured 0.162 vs drop 0.328; assert with slack for BLAS variance)
    assert test_cer <= 0.22, test_cer
    assert test_cer < drop_rate - 0.08, (test_cer, drop_rate)
