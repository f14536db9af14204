"""Config schema smoke tests: every shipped config whose data files are
self-contained constructs its model + criterion and runs a tiny forward."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtn_applications_tpu import utils

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


class _DummyPreprocessor:
    def __init__(self, num_tokens=8, num_features=64):
        self.tokens = [chr(ord("a") + i) for i in range(num_tokens)]
        self.graphemes = self.tokens
        self.graphemes_to_index = {t: i for i, t in enumerate(self.tokens)}
        self.tokens_to_index = dict(self.graphemes_to_index)
        self.num_features = num_features
        self.wordsep = "▁"
        self.lexicon = None

    @property
    def num_tokens(self):
        return len(self.tokens)


def _configs():
    out = []
    for path in sorted(glob.glob(os.path.join(CONFIG_DIR, "*", "*.json"))):
        cfg = json.load(open(path))
        blob = json.dumps(cfg)
        if "<replace_me>" in blob:
            continue  # needs generated token/lexicon assets
        out.append((os.path.relpath(path, CONFIG_DIR), cfg))
    return out


@pytest.mark.parametrize("name,cfg", _configs())
def test_config_constructs(name, cfg):
    pre = _DummyPreprocessor(num_features=cfg["data"]["num_features"])
    criterion, output_size = utils.load_criterion(
        cfg.get("criterion_type", "ctc"), pre, cfg.get("criterion", {})
    )
    model = utils.load_model(
        cfg["model_type"], cfg["data"]["num_features"], output_size, cfg["model"]
    )
    H = cfg["data"]["num_features"]
    x = jnp.zeros((1, H, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape[0] == 1 and out.shape[2] == output_size

    # loss runs with a short target
    prepared = criterion.prepare([[0, 1]])
    loss = criterion.loss(criterion.init_params(), out, prepared)
    assert np.isfinite(float(loss))
