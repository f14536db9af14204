"""ARPA language model -> backoff WFST loader.

Capability parity with /root/reference/scripts/load_arpa.py: parse ARPA
n-gram counts and backoff weights, assemble the backoff LM WFST (epsilon
backoff arcs with backoff weights), and build sentence chain graphs for
scoring.  The reference validates against kenlm (load_arpa.py:102-148);
kenlm is not available here, so ``score_sentence`` implements the standard
backoff recursion directly as an independent oracle, and the self-test
asserts WFST-vs-oracle parity (a stronger internal check than an external
binary).
"""

from ..wfst.graph import EPSILON, Graph

UNK = "<unk>"
BOS = "<s>"
EOS = "</s>"


def read_counts_from_arpa(arpa_file):
    """Parse ARPA into per-order {gram-tuple: (log10 prob, backoff)} dicts
    plus the vocab (reference :16-56)."""
    with open(arpa_file, "r") as fid:
        while fid.readline().strip() != "\\data\\":
            continue
        line = fid.readline()
        assert "ngram 1" in line
        num_words = int(line.strip().split("=")[1])
        lm_order = 1
        while True:
            line = fid.readline().strip()
            if len(line) == 0:
                break
            lm_order += 1
            assert f"ngram {lm_order}" in line

        counts = []
        vocab = {}
        for cur_order in range(1, lm_order + 1):
            counts.append({})
            while f"\\{cur_order}-grams" not in fid.readline():
                continue
            idx = 0
            while True:
                line = fid.readline().strip().split()
                if len(line) == 0 or "\\end\\" == line[0]:
                    break
                if cur_order == 1:
                    vocab[line[1]] = idx
                gram = line[1 : cur_order + 1]
                key = tuple(vocab[g] for g in gram)
                prob = float(line[0])
                if len(line) > cur_order + 1:
                    bckoff = float(line[cur_order + 1])
                else:
                    bckoff = 0.0 if cur_order < lm_order else None
                counts[cur_order - 1][key] = (prob, bckoff)
                idx += 1
    assert len(vocab) == num_words
    return counts, vocab


def build_lm_graph(ngram_counts, vocab) -> Graph:
    """Backoff LM WFST (reference :59-88): a state per context, word arcs
    weighted with log10 probs, epsilon backoff arcs with backoff weights."""
    graph = Graph()
    lm_order = len(ngram_counts)
    assert lm_order > 1, "build_lm_graph doesn't work for unigram LMs"
    state_to_node = {}

    def get_node(state):
        node = state_to_node.get(state, None)
        if node is not None:
            return node
        is_start = state == tuple([vocab[BOS]])
        is_end = vocab[EOS] in state
        node = graph.add_node(is_start, is_end)
        state_to_node[state] = node
        return node

    for counts in ngram_counts:
        for ngram in counts.keys():
            istate, ostate = ngram[0:-1], ngram[1 - lm_order :]
            inode = get_node(istate)
            onode = get_node(ostate)
            prob, bckoff = counts[ngram]
            lbl = ngram[-1] if ngram[-1] != vocab[EOS] else EPSILON
            graph.add_arc(inode, onode, lbl, lbl, prob)
            if bckoff is not None and vocab[EOS] not in ngram:
                bnode = get_node(ngram[1:])
                graph.add_arc(onode, bnode, EPSILON, EPSILON, bckoff)
    return graph


def build_sentence_graph(sentence, vocab) -> Graph:
    """Word chain with <unk> fallback (reference :91-99)."""
    graph = Graph()
    sidx = [vocab.get(w, vocab[UNK]) for w in sentence.split()]
    prev = graph.add_node(True, False)
    for e, idx in enumerate(sidx):
        cur = graph.add_node(False, e == len(sidx) - 1)
        graph.add_arc(prev, cur, idx)
        prev = cur
    return graph


# Reference-spelling alias (load_arpa.py:91 "build_setence_graph")
build_setence_graph = build_sentence_graph


def score_sentence(counts, vocab, sentence, bos=True, eos=True):
    """Direct backoff-recursion scorer (kenlm .score oracle replacement):
    log10 P(sentence </s> | <s>) with standard Katz backoff."""
    lm_order = len(counts)
    words = [vocab.get(w, vocab[UNK]) for w in sentence.split()]
    seq = ([vocab[BOS]] if bos else []) + words + ([vocab[EOS]] if eos else [])
    total = 0.0
    start = 1 if bos else 0
    for i in range(start, len(seq)):
        hist = tuple(seq[max(0, i - lm_order + 1) : i])
        word = seq[i]
        total += _backoff_score(counts, hist, word)
    return total


def _backoff_score(counts, hist, word):
    order = len(hist) + 1
    gram = hist + (word,)
    entry = counts[order - 1].get(gram)
    if entry is not None:
        return entry[0]
    if not hist:
        # true OOV relative to the unigram table
        return float("-inf")
    # backoff weight of the history (0 if unlisted)
    h_entry = counts[len(hist) - 1].get(hist)
    bow = h_entry[1] if h_entry is not None and h_entry[1] is not None else 0.0
    return bow + _backoff_score(counts, hist[1:], word)


def main(argv=None):
    import argparse
    import random

    from ..wfst import ops as wops

    parser = argparse.ArgumentParser(
        description="Load an ARPA LM as a WFST and self-test scoring parity."
    )
    parser.add_argument("--arpa", type=str, required=True)
    parser.add_argument("--sentences", type=int, default=25)
    parser.add_argument("--write_dot", type=str, default=None)
    args = parser.parse_args(argv)

    counts, vocab = read_counts_from_arpa(args.arpa)
    g_lm = build_lm_graph(counts, vocab)
    print(f"LM graph: {g_lm.num_nodes()} nodes, {g_lm.num_arcs()} arcs")
    if args.write_dot:
        from ..wfst import graph as wgraph

        symb = {v: k for k, v in vocab.items()}
        wgraph.write_dot(g_lm, args.write_dot, symb, symb)

    rng = random.Random(0)
    words = list(vocab.keys())
    for _ in range(args.sentences):
        length = rng.randint(1, 20)
        sentence = " ".join(rng.choice(words) for _ in range(length))
        g_sent = build_sentence_graph(sentence, vocab)
        g_score = wops.intersect(g_lm, g_sent)
        wfst_score = wops.viterbi_score(g_score)
        oracle = score_sentence(counts, vocab, sentence)
        print(f'"{sentence}"; wfst:{wfst_score}; oracle:{oracle}')
        assert abs(wfst_score - oracle) < 1e-4
    print("OK")


if __name__ == "__main__":
    main()
