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


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Compute data stats.")
    parser.add_argument("--data_path", type=str, help="Path to dataset JSONs.")
    parser.add_argument("--save_text", type=str, default=None)
    parser.add_argument("--save_tokens", type=str, default=None)
    args = parser.parse_args()

    pre = Preprocessor(args.data_path, 80)
    print(f"Number of tokens: {pre.num_tokens}")
    trainset = Dataset(args.data_path, pre, split="train")
    if args.save_text is not None:
        with open(args.save_text, "w") as fid:
            fid.write("\n".join(t for _, t, _ in trainset.dataset))
    if args.save_tokens is not None:
        with open(args.save_tokens, "w") as fid:
            fid.write("\n".join(pre.tokens))
    print(f"Training: {len(trainset)}")
    print(f"Validation: {len(Dataset(args.data_path, pre, split='validation'))}")
    print(f"Test: {len(Dataset(args.data_path, pre, split='test'))}")
