"""Wordpiece vocabulary + lexicon builder CLI.

Capability parity with /root/reference/scripts/make_wordpieces.py: induce a
wordpiece vocabulary from the *training split only* of IAM / WSJ /
LibriSpeech and emit ``{prefix}_tokens_{N}.txt`` (the N pieces) and
``{prefix}_lex_{N}.txt`` (word -> piece decomposition).  The reference
shells out to SentencePiece; here the native unigram trainer
(scripts.wordpiece) is used.
"""

import argparse
import os

from . import wordpiece


def iamdb_pieces(args):
    from ..datasets import iamdb

    forms = iamdb.load_metadata(args.data_dir, "▁")
    ds_keys = set()
    for _, v in iamdb.SPLITS.items():
        for ds in v:
            with open(os.path.join(args.data_dir, f"{ds}.txt"), "r") as fid:
                ds_keys.update(l.strip() for l in fid)

    # train only on the training set (keys absent from the split lists)
    text = [
        l["text"]
        for _, lines in forms.items()
        for l in lines
        if l["key"] not in ds_keys
    ]
    vocab = sorted(set(w for t in text for w in t.split("▁") if w))
    model = wordpiece.train_unigram(
        text, args.num_pieces, user_symbols=["/"]
    )
    save_pieces(model, args.num_pieces, args.output_prefix, vocab)


def librispeech_pieces(args):
    from ..datasets import librispeech

    json_set_pieces(args, librispeech)


def wsj_pieces(args):
    from ..datasets import wsj

    vocab_file = os.path.join(args.data_dir, "vocab20ko.txt")
    with open(vocab_file, "r") as fid:
        vocab = [l.strip().lower() for l in fid if l[0] != "#"]
    json_set_pieces(args, wsj, vocab)


def json_set_pieces(args, dataset, vocab=None):
    train_text = []
    for subset in dataset.SPLITS["train"]:
        ds = dataset.load_data_split(args.data_dir, subset)
        train_text.extend(l["text"] for l in ds)
    if args.text_file is not None:
        with open(args.text_file, "r") as fid:
            spm_text = [l.strip() for l in fid]
    else:
        spm_text = train_text
    model = wordpiece.train_unigram(spm_text, args.num_pieces)
    if vocab is None:
        vocab = sorted(set(w for t in train_text for w in t.split("▁") if w))
    save_pieces(model, args.num_pieces, args.output_prefix, vocab)


def save_pieces(model, num_pieces, output_prefix, vocab):
    print(f"Generating word piece list of size {num_pieces}.")
    pieces = sorted(model.log_probs, key=model.log_probs.get, reverse=True)
    pieces = pieces[:num_pieces]
    print(f"Encoding vocabulary of size {len(vocab)}.")
    enc = model._native_encoder()
    if enc is not None:
        # encode() prepends the dummy "▁"; replicate for the batch call
        encoded_vocab = enc.encode_batch(["▁" + v for v in vocab])
    else:
        encoded_vocab = [model.encode(v) for v in vocab]

    with open(output_prefix + f"_tokens_{num_pieces}.txt", "w") as fid:
        fid.write("\n".join(pieces))
    with open(output_prefix + f"_lex_{num_pieces}.txt", "w") as fid:
        for v, p in zip(vocab, encoded_vocab):
            fid.write("{} {}\n".format(v, " ".join(p)))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Make the word piece list for a dataset."
    )
    parser.add_argument(
        "--dataset",
        default="iamdb",
        type=str,
        choices=["iamdb", "librispeech", "wsj"],
    )
    parser.add_argument("--data_dir", default="<data_path>", type=str)
    parser.add_argument("--text_file", default=None, type=str)
    parser.add_argument("--output_prefix", default="word_pieces", type=str)
    parser.add_argument("--num_pieces", default=1000, type=int)
    args = parser.parse_args(argv)
    print(f"Building word pieces for {args.dataset}")
    globals()[args.dataset + "_pieces"](args)


if __name__ == "__main__":
    main()
