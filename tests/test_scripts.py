"""Offline builder tests: n-gram counting/pruning/blank/self-loop goldens and
backoff graph isomorphism (mirrors /root/reference/scripts/test_transitions.py),
ARPA loader parity against a direct backoff scorer, and wordpiece induction."""

import os
import tempfile

import pytest

from gtn_applications_tpu import wfst
from gtn_applications_tpu.scripts import build_transitions as bt
from gtn_applications_tpu.scripts import load_arpa
from gtn_applications_tpu.scripts import wordpiece
from gtn_applications_tpu.wfst import EPSILON, Graph

S, E = bt.START_IDX, bt.END_IDX


def test_count_ngrams():
    lines = [["a", "b", "a"], ["b", "b"]]
    tok = {"a": 0, "b": 1}
    counts = bt.count_ngrams(lines, 2, tok)
    # unigrams include <s>-less tokens and </s>
    assert counts[0][(0,)] == 2
    assert counts[0][(1,)] == 3
    assert counts[0][(E,)] == 2
    # bigrams include sentinels
    assert counts[1][(S, 0)] == 1
    assert counts[1][(S, 1)] == 1
    assert counts[1][(0, 1)] == 1
    assert counts[1][(1, 0)] == 1
    assert counts[1][(1, 1)] == 1
    assert counts[1][(0, E)] == 1
    assert counts[1][(1, E)] == 1


def test_prune():
    lines = [["a", "b", "a"], ["b", "b"], ["a", "b"]]
    tok = {"a": 0, "b": 1}
    counts = bt.count_ngrams(lines, 2, tok)
    pruned = bt.prune_ngrams(counts, [0, 1])
    assert set(pruned[0]) == {(0,), (1,), (E,)}
    assert set(pruned[1]) == {(0, 1), (S, 0), (1, E)}  # count > 1 only


def test_build_unigram_graph():
    # unigram graph: single state with one arc per kept token
    pruned = [[(0,), (1,), (E,)]]
    g = bt.build_graph(pruned)
    expected = Graph()
    expected.add_node(True, True)
    expected.add_arc(0, 0, 0)
    expected.add_arc(0, 0, 1)
    expected.add_arc(0, 0, EPSILON)
    assert wfst.isomorphic(g, expected)


def test_build_bigram_backoff_graph():
    pruned = [
        [(0,), (1,), (E,)],
        [(S, 0), (0, 1), (1, E)],
    ]
    g = bt.build_graph(pruned)
    # states: (), (<s>,), (0,), (1,), (</s>,)
    # unigram state () has token arcs; bigram arcs from context states;
    # backoff eps arcs from contexts to ().
    assert g.num_start() == 1
    eps_arcs = [
        (s, d) for s, d, il, ol, _ in g.arcs() if il == EPSILON and ol == EPSILON
    ]
    # each non-final context state backs off to ()
    assert len(eps_arcs) >= 2
    # scoring: the graph accepts "0 1" via bigram arcs
    sent = wfst.linear_graph([0, 1])
    inter = wfst.intersect(g, sent)
    assert wfst.forward_score(inter) > -1e29


def test_add_blank_grams_optional():
    # golden from reference test_transitions.py:173-232 (structure-level)
    pruned = [[(0,)], []]
    out = bt.add_blank_grams([list(p) for p in pruned], 2, "optional")
    # unigrams gain the blank token (2)
    assert (2,) in out[0]
    # bigrams enumerate blank placements around (0,)
    assert (2, 0) in out[1]
    assert (0, 2) in out[1]


def test_add_blank_grams_forced():
    pruned = [[(0,), (1,)], [(0, 1)]]
    out = bt.add_blank_grams([list(p) for p in pruned], 2, "forced")
    # forced: blank between/around all tokens; direct bigram (0,1) dropped
    assert (0, 1) not in out[1]
    assert (2, 0) in out[1] and (0, 2) in out[1]


def test_add_self_loops():
    pruned = [[(0,), (1,)], [(0, 1)]]
    out = bt.add_self_loops([list(p) for p in pruned])
    assert (0, 0) in out[1]
    assert (1, 1) in out[1]


def test_ill_formed_counts_raise():
    # bigram (0,1) kept but unigram (1,) missing
    pruned = [[(0,), (E,)], [(0, 1)]]
    with pytest.raises(ValueError):
        bt.build_graph(pruned)


ARPA = """\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-1.2\t<unk>\t-0.3
-90.0\t<s>\t-0.4
-1.1\t</s>
-0.7\twood\t-0.25
-0.8\tjean\t-0.2

\\2-grams:
-0.3\t<s> wood
-0.4\twood jean
-0.5\tjean </s>
-0.6\tjean wood

\\end\\
"""


def test_arpa_roundtrip_and_scoring():
    with tempfile.NamedTemporaryFile("w", suffix=".arpa", delete=False) as f:
        f.write(ARPA)
        path = f.name
    counts, vocab = load_arpa.read_counts_from_arpa(path)
    assert len(vocab) == 5
    g = load_arpa.build_lm_graph(counts, vocab)
    # WFST viterbi score == direct backoff recursion, for several sentences
    for sent in ["wood jean", "jean wood jean", "wood wood jean", "jean"]:
        gs = load_arpa.build_sentence_graph(sent, vocab)
        inter = wfst.intersect(g, gs)
        wscore = wfst.viterbi_score(inter)
        oracle = load_arpa.score_sentence(counts, vocab, sent)
        assert abs(wscore - oracle) < 1e-4, sent


def test_wordpiece_induction_and_encoding():
    # toy corpus with strong bigram structure: pieces should include
    # multi-char units and encoding must round-trip characters
    corpus = ["ab▁ab▁cd", "ab▁cd", "cd▁cd▁ab", "ab▁ab"] * 8
    model = wordpiece.train_unigram(corpus, vocab_size=12, em_iters=2)
    assert len(model.log_probs) <= 12
    assert any(len(p) > 1 for p in model.log_probs)
    pieces = model.encode("ab")
    assert "".join(pieces) == "▁ab"
    # deterministic: same input -> same pieces
    assert model.encode("ab▁cd") == model.encode("ab▁cd")


def test_wordpiece_lexicon_files():
    corpus = ["aba▁bab", "aba▁aba", "bab"] * 5
    model = wordpiece.train_unigram(corpus, vocab_size=10)
    from gtn_applications_tpu.scripts.make_wordpieces import save_pieces

    with tempfile.TemporaryDirectory() as d:
        prefix = os.path.join(d, "wp")
        save_pieces(model, 10, prefix, ["aba", "bab"])
        toks = open(prefix + "_tokens_10.txt").read().splitlines()
        lex = open(prefix + "_lex_10.txt").read().splitlines()
        assert len(toks) <= 10
        assert len(lex) == 2
        word, *pieces = lex[0].split()
        assert word == "aba"
        assert "".join(pieces) == "▁aba"


TOKENS_TSV = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "word_pieces_scores_1000.tsv",
)


def test_reference_vocab_conformance():
    """Tokenization with the 1k wordpiece benchmark vocabulary (same
    inventory the reference checks in as word_pieces_tokens_1000.txt,
    shipped here in benchmarks/word_pieces_scores_1000.tsv): deterministic
    ids via the lexicon path (the BASELINE conformance surface) and full
    grapheme coverage for Viterbi segmentation."""
    import math as _math

    from gtn_applications_tpu.datasets.text import TextPreprocessor
    from gtn_applications_tpu.scripts.wordpiece import UnigramModel

    with open(TOKENS_TSV) as fid:
        pieces = [l.rstrip("\n").split("\t")[0] for l in fid]
    assert len(pieces) == 1000

    # a uniform unigram model over the reference pieces segments any
    # training-domain string without unk fallback
    model = UnigramModel({p: -_math.log(len(pieces)) for p in pieces})
    for word in ["the", "move", "hello", "a", "recognition"]:
        seg = model.encode(word)
        assert "".join(seg) == "▁" + word
        assert model.encode(word) == model.encode(word)  # deterministic

    # Preprocessor.to_index through a lexicon built from the pieces is
    # byte-deterministic
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tok_path = os.path.join(d, "tokens.txt")
        with open(tok_path, "w") as fid:
            fid.write("\n".join(pieces))
        lex_path = os.path.join(d, "lex.txt")
        with open(lex_path, "w") as fid:
            for w in ["the", "move"]:
                fid.write("{} {}\n".format(w, " ".join(model.encode(w))))
        pre = TextPreprocessor(
            ["the▁move"], tokens_path=tok_path, lexicon_path=lex_path
        )
        ids1 = pre.to_index("the▁move").tolist()
        ids2 = pre.to_index("the▁move").tolist()
        assert ids1 == ids2
        assert pre.to_text(ids1) in ("the▁move", "▁the▁move")


REF_SMALL_ARPA = "/root/reference/scripts/lm_small.arpa"

# log10 Katz-backoff scores computed BY HAND from the lm_small.arpa entries
# (independent of score_sentence): each step is either the listed bigram
# log-prob or bow(history) + unigram log-prob when the bigram is unlisted.
#   "wood pittsburgh cindy jean": (-0.3064-0.6990) -0.2550 -0.2550 -0.2550 -0.5560
#   "jean wood":  (-0.3064-0.6990) -0.5560 (-0.2553-1.0000)
#   "cindy cindy": (-0.3064-0.6990) (-0.2553-0.6990) (-0.2553-1.0000)
#   "jean xyzzy wood" (<unk>): (-0.3064-0.6990) (-0.1973-1.0000) -0.2550 (-0.2553-1.0000)
HAND_GOLDENS = {
    "wood pittsburgh cindy jean": -2.3264,
    "jean wood": -2.8167,
    "cindy cindy": -3.2150,
    "jean xyzzy wood": -3.7130,
}


@pytest.mark.skipif(
    not os.path.exists(REF_SMALL_ARPA), reason="reference ARPA not mounted"
)
def test_arpa_hand_computed_goldens():
    """Both the WFST score and the backoff-recursion oracle must match a
    golden table derived by hand arithmetic on the ARPA file, so the oracle
    does not share authorship with the code it validates."""
    counts, vocab = load_arpa.read_counts_from_arpa(REF_SMALL_ARPA)
    g = load_arpa.build_lm_graph(counts, vocab)
    for sent, golden in HAND_GOLDENS.items():
        oracle = load_arpa.score_sentence(counts, vocab, sent)
        assert abs(oracle - golden) < 1e-4, (sent, oracle, golden)
        gs = load_arpa.build_sentence_graph(sent, vocab)
        wscore = wfst.viterbi_score(wfst.intersect(g, gs))
        assert abs(wscore - golden) < 1e-4, (sent, wscore, golden)


@pytest.mark.slow
def test_iamdb_repro_dry_run(tmp_path):
    """Every non-download stage of recipes/iamdb_repro.sh (the packaged
    real-data reproduction of the reference notebook's CER-17.0 claim)
    runs end-to-end on the synthetic fixture: export -> wordpieces ->
    transitions -> train -> eval with a printed test CER."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DRY_RUN="1", DRY_EPOCHS="1")
    proc = subprocess.run(
        ["bash", os.path.join(repo, "recipes", "iamdb_repro.sh"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=1500, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "reference quick-train claim" in proc.stdout
    assert "CER" in proc.stdout
    # stage artifacts all produced
    for f in ("train_text.txt", "train_tokens.txt",
              "word_pieces_tokens_30.txt", "word_pieces_lex_30.txt",
              "transitions_wp_0_5_10.bin", "repro_config.json",
              "test_eval.log"):
        assert (tmp_path / f).exists(), f


@pytest.mark.slow
def test_librispeech_repro_dry_run(tmp_path):
    """Every non-download stage of recipes/librispeech_repro.sh on the
    synthetic FLAC fixture (real flac_fixture-encoded streams, so the
    dry run also exercises native/flac.cc): manifests -> wordpieces ->
    train -> eval with a printed WER."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DRY_RUN="1", DRY_EPOCHS="1")
    proc = subprocess.run(
        ["bash", os.path.join(repo, "recipes", "librispeech_repro.sh"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=1500, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "WER" in proc.stdout
    for f in ("word_pieces_tokens_30.txt", "word_pieces_lex_30.txt",
              "repro_config.json", "test_eval.log"):
        assert (tmp_path / f).exists(), f
    assert (tmp_path / "data" / "train-clean-100.json").exists()
