"""LibriSpeech dataset wrapper (parity: /root/reference/datasets/librispeech.py)."""

from . import audioset
from .audio import FrequencyMasking, TimeMasking

SPLITS = {
    "train": ["train-clean-100"],
    "validation": ["dev-clean"],
    "test": ["test-clean", "test-other"],
}
SAMPLE_RATE = 16000


def load_data_split(data_path, split, wordsep=audioset.WORDSEP):
    return audioset.load_data_split(data_path, split, wordsep)


class Dataset(audioset.Dataset):
    splits = SPLITS
    sample_rate = SAMPLE_RATE

    def __init__(self, data_path, preprocessor, split, augment=False):
        augmentation = []
        if augment:
            augmentation = [
                FrequencyMasking(27),
                FrequencyMasking(27),
                TimeMasking(100),
                TimeMasking(100),
            ]
        super().__init__(
            data_path,
            preprocessor,
            split,
            self.splits,
            augmentation=augmentation,
            sample_rate=self.sample_rate,
        )


class Preprocessor(audioset.Preprocessor):
    def __init__(self, data_path, num_features, **kwargs):
        super().__init__(data_path, num_features, SPLITS, **kwargs)
