"""Long-context synthetic glyph dataset (sequence-parallel smoke target).

The same deterministic glyph corpus as ``datasets.synthetic`` rendered at
a 512-pixel glyph width, so sample widths land in the 4-7k frame range —
the long-T regime the chunk-transfer associative CTC lattice
(ops.lattice.ctc_forward_score_assoc with a chunk) and the ('data', 'seq')
mesh exist for.  Shipped recipe: configs/synthetic/long_ctx_assoc.json.
"""

from . import synthetic
from .synthetic import Preprocessor  # noqa: F401  (same token inventory)

_LONG_GLYPH_W = 512


class Dataset(synthetic.Dataset):
    def __init__(self, data_path, preprocessor, split="train", augment=False):
        # 3-4 words of 2-4 chars (+ separators) at 512 px/glyph: widths in
        # [4096, 9728] — every sample is in the >= 4k-frame regime
        super().__init__(
            data_path, preprocessor, split, augment,
            glyph_w=_LONG_GLYPH_W, min_words=3, max_words=4,
        )
