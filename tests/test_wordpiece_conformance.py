"""Tokenizer conformance against an independent SentencePiece-compatible
implementation (BASELINE.md north star: byte-exact token ids over the
reference's published 1000-piece inventory).

The reference trains its tokenizer with the SentencePiece binary
(scripts/make_wordpieces.py:96-108) and publishes only the piece list —
no scores — so exact reproduction from the file alone is impossible for
ANY implementation.  The framework closes the gap in two steps:

1. scripts/fit_piece_scores.py EM-fits unigram scores for the FIXED
   published inventory (checked in: benchmarks/word_pieces_scores_1000.tsv);
2. encoding is *score-faithful*: given (piece, score) pairs, the Viterbi
   segmentation — and hence every token id — must be byte-exact against
   HuggingFace tokenizers' Unigram model, an independent production
   implementation of the same SentencePiece semantics.  A model trained
   by SentencePiece and exported as (piece, score) pairs therefore
   round-trips through this framework with identical ids.

A checked-in golden table pins the segmentations so regressions are
caught even where the referee library is unavailable.
"""

import json
import os

import numpy as np
import pytest

from gtn_applications_tpu.scripts.fit_piece_scores import load_scores, zipf_corpus
from gtn_applications_tpu.scripts.wordpiece import UnigramModel, WORDSEP, fit_scores

_SCORES = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "benchmarks", "word_pieces_scores_1000.tsv",
)
_GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "wordpiece_segmentations_1000.json"
)
_REF_PIECES = "/root/reference/benchmarks/word_pieces_tokens_1000.txt"


def _model():
    pieces, lp = load_scores(_SCORES)
    return pieces, lp, UnigramModel(lp), {p: i + 1 for i, p in enumerate(pieces)}


def _word_set(pieces):
    """Held-out words: NOT drawn from the score-fitting corpus (which uses
    Zipf-weighted single pieces) — these are piece-pair concatenations plus
    a hand-picked English set."""
    rng = np.random.RandomState(42)
    wordish = [p[1:] for p in pieces if p.startswith(WORDSEP) and len(p) > 1]
    hand = [
        "the", "move", "recognition", "handwriting", "sequence",
        "transducer", "probability", "differentiable", "automatic",
        "network",
    ]
    return hand + ["".join(rng.choice(wordish, size=2)) for _ in range(300)]


def test_scores_cover_reference_inventory():
    pieces, lp, _, _ = _model()
    if os.path.exists(_REF_PIECES):
        with open(_REF_PIECES) as fh:
            ref = [l.rstrip("\n") for l in fh if l.rstrip("\n")]
        assert pieces == ref  # same pieces, same id order
    assert len(pieces) == 1000
    assert all(np.isfinite(lp[p]) for p in pieces)


def test_golden_segmentations_stable():
    pieces, _, model, piece_to_id = _model()
    with open(_GOLDEN) as fh:
        golden = json.load(fh)
    assert len(golden) == 310
    for word, ids in golden.items():
        assert model.encode_ids(word, piece_to_id) == ids, word


def test_byte_exact_vs_independent_unigram():
    """Every token id byte-exact against HF tokenizers' Unigram — an
    independent implementation of SentencePiece's Viterbi encoding."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    pieces, lp, model, piece_to_id = _model()
    vocab = [("<unk>", -100.0)] + [(p, lp[p]) for p in pieces]
    referee = Tokenizer(Unigram(vocab, unk_id=0))

    words = _word_set(pieces)
    mismatches = [
        w for w in words
        if model.encode_ids(w, piece_to_id) != referee.encode(WORDSEP + w).ids
    ]
    # divergence rate documented: 0 — same scores => same Viterbi path
    assert mismatches == [], mismatches[:10]


def test_byte_exact_on_fitting_domain_sentences():
    """Full sentences from the pseudo-corpus domain (multi-word, ▁ joined)
    also encode byte-exact against the referee."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    pieces, lp, model, piece_to_id = _model()
    vocab = [("<unk>", -100.0)] + [(p, lp[p]) for p in pieces]
    referee = Tokenizer(Unigram(vocab, unk_id=0))
    for sent in zipf_corpus(pieces, num_sentences=50, seed=7):
        ours = model.encode_ids(sent, piece_to_id)
        theirs = referee.encode(WORDSEP + sent).ids
        assert ours == theirs, sent


def test_fit_scores_deterministic():
    """fit_scores on the same corpus reproduces the checked-in TSV."""
    pieces, lp, _, _ = _model()
    refit = fit_scores(zipf_corpus(pieces), pieces, em_iters=4)
    for p in pieces:
        np.testing.assert_allclose(refit.log_probs[p], lp[p], atol=1e-6)
