"""IAM handwriting dataset (TPU-native, torch-free).

Capability parity with /root/reference/datasets/iamdb.py: lines.txt /
words.txt metadata parsing with garbage-token cleanup and box extraction,
multiprocess image crop/resize loading, augmentation (random resize crop,
small rotation, brightness/contrast jitter), Normalize(0.912, 0.168), and
the ``sample_sizes`` protocol for width-sorted batching.  Images are numpy
``[H, W]`` float32 arrays.
"""

import collections
import os
import random
import re

import numpy as np

from .text import TextPreprocessor, WORDSEP

try:
    import PIL.Image
    import PIL.ImageOps

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

SPLITS = {
    "train": ["trainset"],
    "validation": ["validationset1"],
    "test": ["validationset2", "testset"],
}

NORM_MEAN = 0.912
NORM_STD = 0.168


def load_metadata(data_path, wordsep=WORDSEP, use_words=False):
    """Parse lines.txt / words.txt (iamdb.py:221-246)."""
    forms = collections.defaultdict(list)
    filename = "words.txt" if use_words else "lines.txt"
    with open(os.path.join(data_path, filename), "r") as fid:
        lines = (l.strip().split() for l in fid if l[0] != "#")
        for line in lines:
            if use_words and line[1] == "err":
                continue
            text = " ".join(line[8:])
            text = text.replace("#", "")
            text = re.sub(r"\|+|\s", wordsep, text).strip(wordsep)
            form_key = "-".join(line[0].split("-")[:2])
            line_key = "-".join(line[0].split("-")[:3])
            box_idx = 4 - use_words
            box = tuple(int(val) for val in line[box_idx : box_idx + 4])
            forms[form_key].append({"key": line_key, "box": box, "text": text})
    return forms


def load_image(example):
    """Crop the line/word box and resize to the target height."""
    img_file, box, height = example
    img = PIL.Image.open(img_file)
    x, y, w, h = box
    size_w = int((height / h) * w)
    img = img.crop((x, y, x + w, y + h)).resize(
        (size_w, height), PIL.Image.BILINEAR
    )
    return img


class RandomResizeCrop:
    """Pad-with-white, random crop offset, random aspect ratio
    (iamdb.py:102-121)."""

    def __init__(self, jitter=10, ratio=0.5):
        self.jitter = jitter
        self.ratio = ratio

    def __call__(self, img):
        w, h = img.size
        img = PIL.ImageOps.expand(img, border=self.jitter, fill=255)
        x = self.jitter + random.randint(-self.jitter, self.jitter)
        y = self.jitter + random.randint(-self.jitter, self.jitter)
        size_w = int(w * random.uniform(1 - self.ratio, 1 + self.ratio))
        img = img.crop((x, y, x + w, y + h)).resize(
            (size_w, h), PIL.Image.BILINEAR
        )
        return img


class Dataset:
    """IAM dataset with eager multiprocess image loading (iamdb.py:26-91)."""

    def __init__(self, data_path, preprocessor, split, augment=False):
        forms = load_metadata(
            data_path, preprocessor.wordsep, use_words=preprocessor.use_words
        )
        splits = SPLITS.get(split, None)
        if splits is None:
            split_names = ", ".join(f"'{k}'" for k in SPLITS.keys())
            raise ValueError(f"Invalid split {split}, must be in [{split_names}].")
        split_keys = []
        for s in splits:
            with open(os.path.join(data_path, f"{s}.txt"), "r") as fid:
                split_keys.extend(l.strip() for l in fid)
        split_keys = set(split_keys)

        self.preprocessor = preprocessor
        self.augment = augment

        images, text = [], []
        for key, examples in forms.items():
            for example in examples:
                if example["key"] not in split_keys:
                    continue
                img_file = os.path.join(data_path, f"{key}.png")
                images.append((img_file, example["box"], preprocessor.num_features))
                text.append(example["text"])
        # thread pool, not processes: PIL releases the GIL during
        # decode/resize and os.fork() after JAX initialization deadlocks
        from multiprocessing.pool import ThreadPool

        with ThreadPool(processes=16) as pool:
            images = pool.map(load_image, images)
        self.dataset = list(zip(images, text))

    def sample_sizes(self):
        """[( (width, height), target_len )] for width-sorted batching."""
        return [(img.size, len(text)) for img, text in self.dataset]

    def __getitem__(self, index):
        img, text = self.dataset[index]
        if self.augment:
            img = RandomResizeCrop()(img)
            angle = random.uniform(-2, 2)
            img = img.rotate(angle, PIL.Image.BILINEAR, fillcolor=255)
            arr = np.asarray(img, dtype=np.float32) / 255.0
            # brightness/contrast jitter (grayscale analogue of ColorJitter)
            arr = arr * random.uniform(0.5, 1.5)
            mean = arr.mean()
            arr = (arr - mean) * random.uniform(0.5, 1.5) + mean
            arr = np.clip(arr, 0.0, 1.0)
        else:
            arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - NORM_MEAN) / NORM_STD
        inputs = arr  # [H, W]
        outputs = self.preprocessor.to_index(text)
        return inputs, outputs

    def __len__(self):
        return len(self.dataset)


class Preprocessor(TextPreprocessor):
    """IAM preprocessor (iamdb.py:124-218)."""

    def __init__(
        self,
        data_path,
        num_features,
        tokens_path=None,
        lexicon_path=None,
        use_words=False,
        prepend_wordsep=False,
    ):
        self._use_words = use_words
        forms = load_metadata(data_path, WORDSEP, use_words=use_words)
        train_text = [line["text"] for _, form in forms.items() for line in form]
        super().__init__(
            train_text,
            tokens_path=tokens_path,
            lexicon_path=lexicon_path,
            prepend_wordsep=prepend_wordsep,
        )
        self.num_features = num_features

    @property
    def use_words(self):
        return self._use_words


if __name__ == "__main__":
    import argparse

    import PIL.ImageOps  # noqa: F401

    parser = argparse.ArgumentParser(description="Compute data stats.")
    parser.add_argument("--data_path", type=str, help="Path to dataset.")
    parser.add_argument("--use_words", default=False, action="store_true")
    parser.add_argument("--save_text", type=str, default=None)
    parser.add_argument("--save_tokens", type=str, default=None)
    parser.add_argument("--compute_stats", action="store_true", default=False)
    args = parser.parse_args()

    preprocessor = Preprocessor(args.data_path, 64, use_words=args.use_words)
    trainset = Dataset(args.data_path, preprocessor, split="train", augment=False)
    if args.save_text is not None:
        with open(args.save_text, "w") as fid:
            fid.write("\n".join(t for _, t in trainset.dataset))
    if args.save_tokens is not None:
        with open(args.save_tokens, "w") as fid:
            fid.write("\n".join(preprocessor.tokens))
    valset = Dataset(args.data_path, preprocessor, split="validation")
    testset = Dataset(args.data_path, preprocessor, split="test")
    print("Number of examples per dataset:")
    print(f"Training: {len(trainset)}")
    print(f"Validation: {len(valset)}")
    print(f"Test: {len(testset)}")

    if args.compute_stats:
        images = np.concatenate(
            [trainset[i][0] for i in range(len(trainset))], axis=1
        )
        print(f"Data mean {images.mean()} and standard deviation {images.std()}.")
        sizes = trainset.sample_sizes()
        print(f"Average image width {sum(w for (w, _), _ in sizes) / len(trainset)}")
        print(f"Average target length {sum(l for _, l in sizes) / len(trainset)}")
