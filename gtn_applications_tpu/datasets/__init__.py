from . import (
    audio, audioset, iamdb, librispeech, synthetic, synthetic_audio, text, wsj,
)
from .text import TextPreprocessor, WORDSEP
