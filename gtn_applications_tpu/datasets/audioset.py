"""Generic JSONL-manifest audio dataset (TPU-native, torch-free).

Capability parity with /root/reference/datasets/audioset.py: manifests are
``{split}.json`` files of JSON lines ``{"text":..., "duration":...,
"audio":...}`` (audioset.py:168-177); features are 25 ms / 10 ms-hop
log-mel spectrograms standardized per utterance; augmentation is a list of
callables (SpecAugment masks from .audio).
"""

import json
import os
import re

from .audio import MelSpectrogram, load_audio, log_normalize
from .text import TextPreprocessor, WORDSEP


def load_data_split(data_path, split, wordsep=WORDSEP):
    json_file = os.path.join(data_path, f"{split}.json")
    with open(json_file, "r") as fid:
        examples = [json.loads(l) for l in fid]
        for ex in examples:
            text = re.sub(r"\s", wordsep, ex["text"]).strip(wordsep)
            ex["text"] = text
    return examples


class Dataset:
    def __init__(
        self,
        data_path,
        preprocessor,
        split,
        splits,
        augmentation=None,
        sample_rate=16000,
    ):
        data = []
        for sp in splits[split]:
            data.extend(load_data_split(data_path, sp, preprocessor.wordsep))

        self.preprocessor = preprocessor
        self.mel = MelSpectrogram(
            sample_rate=sample_rate,
            n_fft=sample_rate * 25 // 1000,
            n_mels=preprocessor.num_features,
            hop_length=sample_rate * 10 // 1000,
        )
        self.augmentation = augmentation or []
        self.sample_rate = sample_rate

        audio = [ex["audio"] for ex in data]
        text = [ex["text"] for ex in data]
        duration = [ex["duration"] for ex in data]
        self.dataset = list(zip(audio, text, duration))

    def sample_sizes(self):
        """[( (duration, 1), target_len )] (audioset.py:52-57)."""
        return [((duration, 1), len(text)) for _, text, duration in self.dataset]

    def __getitem__(self, index):
        audio_file, text, _ = self.dataset[index]
        samples, sr = load_audio(audio_file)
        feats = log_normalize(self.mel(samples))
        for aug in self.augmentation:
            feats = aug(feats)
        outputs = self.preprocessor.to_index(text)
        return feats, outputs  # feats: [num_features, frames]

    def __len__(self):
        return len(self.dataset)


class Preprocessor(TextPreprocessor):
    """Audio dataset preprocessor (audioset.py:70-165)."""

    def __init__(
        self,
        data_path,
        num_features,
        splits,
        tokens_path=None,
        lexicon_path=None,
        use_words=False,
        prepend_wordsep=False,
    ):
        if use_words:
            raise ValueError("use_words not supported for audio dataset")
        data = []
        for sp in splits["train"]:
            data.extend(load_data_split(data_path, sp, WORDSEP))
        super().__init__(
            [ex["text"] for ex in data],
            tokens_path=tokens_path,
            lexicon_path=lexicon_path,
            prepend_wordsep=prepend_wordsep,
        )
        self.num_features = num_features

    @property
    def use_words(self):
        return False
