from . import audio, audioset, iamdb, librispeech, synthetic, text, wsj
from .text import TextPreprocessor, WORDSEP
