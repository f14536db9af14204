"""Shared text preprocessing: grapheme/token/lexicon maps.

The token logic of the reference's per-dataset Preprocessors
(/root/reference/datasets/iamdb.py:124-218, audioset.py:70-165) extracted
into one array-native core: grapheme inventory from training text, optional
token list and word->wordpiece lexicon with letter fallback, the "▁"
word separator, and the inverse maps used for CER/WER scoring.
"""

import itertools

import numpy as np

WORDSEP = "▁"


class TextPreprocessor:
    """Token/lexicon maps shared by all dataset preprocessors.

    Args:
      train_text: iterable of training transcripts (wordsep-delimited).
      tokens_path: optional path to the model output token list.
      lexicon_path: optional word -> token-sequence lexicon; enables
        word-level tokenization with letter fallback
        (``lexicon.get(w, wordsep + w)``, iamdb.py:199).
      prepend_wordsep: prepend the word separator to every target
        (wordpiece decomposition training, audioset.py:147-151).
    """

    def __init__(
        self,
        train_text,
        tokens_path=None,
        lexicon_path=None,
        prepend_wordsep=False,
    ):
        self.wordsep = WORDSEP
        self._prepend_wordsep = prepend_wordsep

        graphemes = set()
        for text in train_text:
            graphemes.update(text)
        self.graphemes = sorted(graphemes)

        if tokens_path is not None:
            with open(tokens_path, "r") as fid:
                self.tokens = [l.strip() for l in fid]
        else:
            self.tokens = self.graphemes

        if lexicon_path is not None:
            with open(lexicon_path, "r") as fid:
                lexicon = (l.strip().split() for l in fid)
                self.lexicon = {l[0]: l[1:] for l in lexicon}
        else:
            self.lexicon = None

        self.graphemes_to_index = {t: i for i, t in enumerate(self.graphemes)}
        self.tokens_to_index = {t: i for i, t in enumerate(self.tokens)}

    @property
    def num_tokens(self):
        return len(self.tokens)

    def to_index(self, line):
        tok_to_idx = self.graphemes_to_index
        if self.lexicon is not None:
            if len(line) > 0:
                line = [
                    t
                    for w in line.split(self.wordsep)
                    for t in self.lexicon.get(w, self.wordsep + w)
                ]
            tok_to_idx = self.tokens_to_index
        if self._prepend_wordsep:
            line = itertools.chain([self.wordsep], line)
        return np.asarray([tok_to_idx[t] for t in line], dtype=np.int32)

    def to_text(self, indices):
        encoding = self.graphemes
        if self.lexicon is not None:
            encoding = self.tokens
        return self._post_process(encoding[int(i)] for i in indices)

    def tokens_to_text(self, indices):
        return self._post_process(self.tokens[int(i)] for i in indices)

    def _post_process(self, indices):
        return "".join(indices).strip(self.wordsep)
