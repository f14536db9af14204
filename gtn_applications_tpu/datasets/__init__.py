from . import (
    audio, audioset, iamdb, librispeech, synthetic, synthetic_audio,
    synthetic_long, text, wsj,
)
from .text import TextPreprocessor, WORDSEP
