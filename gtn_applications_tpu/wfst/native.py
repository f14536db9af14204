"""ctypes bindings for the native (C++) graph compiler.

Loads ``native/libtwgraph.so`` when present (build with ``make -C native``)
and exposes compose / remove / trim / project / scoring with the same
semantics as the pure-Python implementations in wfst.ops — which remain the
fallback and the differential-test oracle.  Disable with TW_NATIVE=0.
"""

import ctypes
import os

import numpy as np

from .graph import Graph

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.abspath(__file__))
    native_dir = os.path.join(here, "..", "..", "native")
    candidates = [
        os.path.join(native_dir, "libtwgraph.so"),
        os.path.join(here, "libtwgraph.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    # lazy one-shot build from source (g++ is in the image)
    src = os.path.join(native_dir, "graph_compiler.cc")
    if os.path.exists(src):
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", native_dir],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
        if os.path.exists(candidates[0]):
            return candidates[0]
    return None


def load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    if os.environ.get("TW_NATIVE", "1") == "0":
        return None
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.tw_graph_new.restype = ctypes.c_void_p
    lib.tw_graph_new.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tw_graph_free.argtypes = [ctypes.c_void_p]
    lib.tw_graph_warm.argtypes = [ctypes.c_void_p]
    for fn in ("tw_num_nodes", "tw_num_arcs", "tw_num_finals", "tw_has_prov"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.tw_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 8
    lib.tw_export_prov.argtypes = [ctypes.c_void_p] * 3
    lib.tw_compose.restype = ctypes.c_void_p
    lib.tw_compose.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    for fn in ("tw_remove", "tw_trim"):
        getattr(lib, fn).restype = ctypes.c_void_p
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.tw_project.restype = ctypes.c_void_p
    lib.tw_project.argtypes = [ctypes.c_void_p, ctypes.c_int]
    for fn in ("tw_forward_score", "tw_viterbi_score"):
        getattr(lib, fn).restype = ctypes.c_double
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.tw_ctc_engine_batch.restype = ctypes.c_int64
    lib.tw_ctc_engine_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.tw_asg_engine_batch.restype = ctypes.c_int64
    lib.tw_asg_engine_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.tw_transducer_engine_batch.restype = ctypes.c_int64
    lib.tw_transducer_engine_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.tw_transducer_ngram_engine_batch.restype = ctypes.c_int64
    lib.tw_transducer_ngram_engine_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.tw_transducer_viterbi_batch.restype = ctypes.c_int64
    lib.tw_transducer_viterbi_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.tw_acceptor_engine_batch.restype = ctypes.c_int64
    lib.tw_acceptor_engine_batch.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def available():
    return load_library() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class _Handle:
    """Owns a native graph handle."""

    def __init__(self, lib, h):
        self.lib = lib
        self.h = h

    def __del__(self):
        if self.h:
            self.lib.tw_graph_free(self.h)
            self.h = None


def to_native(g: Graph, warm=False):
    """Convert to a native handle; ``warm`` pre-builds the compose index
    (required before sharing the handle across threads)."""
    lib = load_library()
    start = np.asarray(g.start, dtype=np.uint8)
    finals = [(n, w) for n, ws in sorted(g.finals.items()) for w in ws]
    fnode = np.asarray([f[0] for f in finals], dtype=np.int64)
    fw = np.asarray([f[1] for f in finals], dtype=np.float32)
    src = np.asarray(g.arc_src, dtype=np.int32)
    dst = np.asarray(g.arc_dst, dtype=np.int32)
    il = np.asarray(g.arc_ilabel, dtype=np.int32)
    ol = np.asarray(g.arc_olabel, dtype=np.int32)
    w = np.asarray(g.arc_weight, dtype=np.float32)
    h = lib.tw_graph_new(
        len(start), _ptr(start, ctypes.c_uint8),
        _ptr(fnode, ctypes.c_int64), _ptr(fw, ctypes.c_float), len(fnode),
        len(src), _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
        _ptr(il, ctypes.c_int32), _ptr(ol, ctypes.c_int32),
        _ptr(w, ctypes.c_float),
    )
    handle = _Handle(lib, h)
    if warm:
        lib.tw_graph_warm(h)
    return handle


def from_native(handle: _Handle):
    lib = handle.lib
    n = lib.tw_num_nodes(handle.h)
    a = lib.tw_num_arcs(handle.h)
    nf = lib.tw_num_finals(handle.h)
    start = np.zeros(n, dtype=np.uint8)
    fnode = np.zeros(nf, dtype=np.int64)
    fw = np.zeros(nf, dtype=np.float32)
    src = np.zeros(a, dtype=np.int32)
    dst = np.zeros(a, dtype=np.int32)
    il = np.zeros(a, dtype=np.int32)
    ol = np.zeros(a, dtype=np.int32)
    w = np.zeros(a, dtype=np.float32)
    lib.tw_export(
        handle.h, start.ctypes.data, fnode.ctypes.data, fw.ctypes.data,
        src.ctypes.data, dst.ctypes.data, il.ctypes.data, ol.ctypes.data,
        w.ctypes.data,
    )
    g = Graph()
    for i in range(n):
        g.add_node(bool(start[i]), False)
    for node, weight in zip(fnode, fw):
        g.add_final(int(node), float(weight))
    g.arc_src = src.astype(int).tolist()
    g.arc_dst = dst.astype(int).tolist()
    g.arc_ilabel = il.astype(int).tolist()
    g.arc_olabel = ol.astype(int).tolist()
    g.arc_weight = w.astype(float).tolist()
    return g


def compose(g1: Graph, g2: Graph, return_arc_map=False):
    lib = load_library()
    h1, h2 = to_native(g1), to_native(g2)
    hr = _Handle(lib, lib.tw_compose(h1.h, h2.h, 1 if return_arc_map else 0))
    out = from_native(hr)
    if not return_arc_map:
        return out
    a = lib.tw_num_arcs(hr.h)
    p1 = np.zeros(a, dtype=np.int64)
    p2 = np.zeros(a, dtype=np.int64)
    if a:
        lib.tw_export_prov(hr.h, p1.ctypes.data, p2.ctypes.data)
    prov = list(zip(p1.astype(int).tolist(), p2.astype(int).tolist()))
    return out, prov


def remove(g: Graph):
    lib = load_library()
    h = to_native(g)
    hr = lib.tw_remove(h.h)
    if not hr:
        raise ValueError("epsilon cycle or explosion in native remove()")
    return from_native(_Handle(lib, hr))


def trim(g: Graph):
    lib = load_library()
    h = to_native(g)
    return from_native(_Handle(lib, lib.tw_trim(h.h)))


def forward_score(g: Graph) -> float:
    lib = load_library()
    h = to_native(g)
    s = lib.tw_forward_score(h.h)
    if np.isnan(s):
        raise ValueError("graph has cycles; forward_score requires a DAG")
    return float(s)


def viterbi_score(g: Graph) -> float:
    lib = load_library()
    h = to_native(g)
    s = lib.tw_viterbi_score(h.h)
    if np.isnan(s):
        raise ValueError("graph has cycles; viterbi_score requires a DAG")
    return float(s)


def ctc_engine_batch(log_probs, targets, blank):
    """Graph-engine CTC fwd+bwd over a batch on the host C++ tier.

    Reproduces the reference's execution model (reference criterions/
    ctc.py:31-94: per-sample emission-graph ∘ CTC-acceptor compose,
    log-semiring forward_score, graph autodiff, C++ thread pool over the
    batch).  Serves as bench.py's honest same-algorithm CPU denominator
    and as a differential grad oracle for the Pallas lattice kernels.

    Args: log_probs [B, T, C] float array; targets list of int lists;
    blank label id.  Returns (losses [B], grad [B, T, C]) with
    losses[b] = -log p(target_b) and grad = d losses / d log_probs
    (no batch reduction).
    """
    lib = load_library()
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    B, T, C = lp.shape
    lens = np.array([len(t) for t in targets], dtype=np.int64)
    lmax = max(1, int(lens.max()) if B else 1)
    tg = np.zeros((B, lmax), dtype=np.int32)
    for b, t in enumerate(targets):
        tg[b, : len(t)] = t
    losses = np.zeros(B, dtype=np.float32)
    grad = np.zeros((B, T, C), dtype=np.float32)
    fails = lib.tw_ctc_engine_batch(
        B, T, C, _ptr(lp, ctypes.c_float), _ptr(tg, ctypes.c_int32),
        _ptr(lens, ctypes.c_int64), lmax, blank,
        _ptr(losses, ctypes.c_float), _ptr(grad, ctypes.c_float),
    )
    if fails:
        raise ValueError(f"{fails} samples had no accepting CTC path")
    return losses, grad


def asg_engine_batch(log_probs, targets, transitions):
    """Graph-engine ASG fwd+bwd over a batch on the host C++ tier.

    The reference's execution model (reference criterions/asg.py:84-170:
    free-energy and force-aligned graph compositions, log-semiring
    forward_score, graph autodiff, thread pool over the batch).  Serves as
    bench.py's same-algorithm CPU denominator for ASG and as a
    differential oracle for ops.lattice.asg_loss.

    Args: log_probs [B, T, C]; targets: PREPARED id lists (replabels /
    garbage already applied); transitions: (C+1) x C matrix.  Returns
    (losses [B], grad_em [B, T, C], grad_trans [(C+1), C]) where
    losses[b] = logZ_free - logZ_forced and grad_trans is batch-summed.
    """
    lib = load_library()
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    B, T, C = lp.shape
    tw = np.ascontiguousarray(transitions, dtype=np.float32)
    assert tw.shape == (C + 1, C)
    lens = np.array([len(t) for t in targets], dtype=np.int64)
    lmax = max(1, int(lens.max()) if B else 1)
    tg = np.zeros((B, lmax), dtype=np.int32)
    for b, t in enumerate(targets):
        tg[b, : len(t)] = t
    losses = np.zeros(B, dtype=np.float32)
    grad_em = np.zeros((B, T, C), dtype=np.float32)
    grad_trans = np.zeros((C + 1, C), dtype=np.float32)
    fails = lib.tw_asg_engine_batch(
        B, T, C, _ptr(lp, ctypes.c_float), _ptr(tg, ctypes.c_int32),
        _ptr(lens, ctypes.c_int64), lmax, _ptr(tw, ctypes.c_float),
        _ptr(losses, ctypes.c_float), _ptr(grad_em, ctypes.c_float),
        _ptr(grad_trans, ctypes.c_float),
    )
    if fails:
        raise ValueError(f"{fails} samples had no accepting ASG path")
    return losses, grad_em, grad_trans


def transducer_engine_batch(log_probs, lexicon, tokens, targets):
    """Graph-engine transducer fwd+bwd (no transition model) on the host.

    Per sample: loss = -forward_score(emissions ∘ alignment_graph(target))
    where the alignment graph marginalizes decompositions through the
    lexicon (reference transducer.py:239-309 without transitions), with
    graph autodiff and a thread pool over the batch — bench.py's
    same-algorithm CPU denominator for the transducer protocols.

    Args: log_probs [B, T, C]; lexicon / tokens: host ``Graph``s (the
    criterion's ``self.lexicon`` / ``self.tokens``); targets: grapheme id
    lists.  Returns (losses [B], grad [B, T, C]).
    """
    lib = load_library()
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    B, T, C = lp.shape
    hl = to_native(lexicon, warm=True)
    ht = to_native(tokens, warm=True)
    lens = np.array([len(t) for t in targets], dtype=np.int64)
    lmax = max(1, int(lens.max()) if B else 1)
    tg = np.zeros((B, lmax), dtype=np.int32)
    for b, t in enumerate(targets):
        tg[b, : len(t)] = t
    losses = np.zeros(B, dtype=np.float32)
    grad = np.zeros((B, T, C), dtype=np.float32)
    fails = lib.tw_transducer_engine_batch(
        B, T, C, _ptr(lp, ctypes.c_float), hl.h, ht.h,
        _ptr(tg, ctypes.c_int32), _ptr(lens, ctypes.c_int64), lmax,
        _ptr(losses, ctypes.c_float), _ptr(grad, ctypes.c_float),
    )
    if fails:
        raise ValueError(f"{fails} samples had no accepting alignment path")
    return losses, grad


def transducer_viterbi_batch(log_probs, tokens, cap=None):
    """Graph-engine transducer decode (no transition model) on the host.

    Per sample: best path through the emissions, composed with the token
    graph, second best path, output-projected with epsilons dropped —
    the reference's Transducer.viterbi pipeline (transducer.py:199-234
    with transitions=None), threaded over the batch.  bench.py's
    same-algorithm CPU denominator for the word-decomps decode protocol
    (reference benchmarks/transducer_benchmark.py:44-50).

    Args: log_probs [B, T, C]; tokens: host ``Graph`` (the criterion's
    ``self.tokens``); cap: max labels per sample (default T).
    Returns a list of B int lists (decoded token ids).
    """
    lib = load_library()
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    B, T, C = lp.shape
    ht = to_native(tokens, warm=True)
    cap = int(cap or max(T, 1))
    out = np.full((B, cap), -1, dtype=np.int32)
    fails = lib.tw_transducer_viterbi_batch(
        B, T, C, _ptr(lp, ctypes.c_float), ht.h,
        _ptr(out, ctypes.c_int32), cap,
    )
    if fails:
        raise ValueError(f"{fails} samples had no accepting decode path")
    return [[int(v) for v in row[row >= 0]] for row in out]


def transducer_ngram_engine_batch(log_probs, lexicon, tokens, transitions,
                                  targets):
    """Graph-engine transducer fwd+bwd WITH a transition model on the host.

    Per sample: loss = logZ(em ∘ trans) - logZ(em ∘ (trans ∘ align(target)))
    — the reference's normalizer pipeline (transducer.py:239-309 with
    transitions) with graph autodiff for both the emissions and the
    learnable transition arc weights, thread pool over the batch.
    bench.py's same-algorithm CPU denominator for the ngram-1/2 protocols.

    Args: log_probs [B, T, C]; lexicon / tokens / transitions: host
    ``Graph``s (the criterion's attributes); targets: grapheme id lists.
    Returns (losses [B], grad_em [B, T, C], grad_trans [num_arcs]).
    """
    lib = load_library()
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    B, T, C = lp.shape
    hl = to_native(lexicon, warm=True)
    ht = to_native(tokens, warm=True)
    htr = to_native(transitions, warm=True)
    lens = np.array([len(t) for t in targets], dtype=np.int64)
    lmax = max(1, int(lens.max()) if B else 1)
    tg = np.zeros((B, lmax), dtype=np.int32)
    for b, t in enumerate(targets):
        tg[b, : len(t)] = t
    losses = np.zeros(B, dtype=np.float32)
    grad_em = np.zeros((B, T, C), dtype=np.float32)
    grad_trans = np.zeros(transitions.num_arcs(), dtype=np.float32)
    fails = lib.tw_transducer_ngram_engine_batch(
        B, T, C, _ptr(lp, ctypes.c_float), hl.h, ht.h, htr.h,
        _ptr(tg, ctypes.c_int32), _ptr(lens, ctypes.c_int64), lmax,
        _ptr(losses, ctypes.c_float), _ptr(grad_em, ctypes.c_float),
        _ptr(grad_trans, ctypes.c_float),
    )
    if fails:
        raise ValueError(f"{fails} samples had no accepting ngram path")
    return losses, grad_em, grad_trans


def acceptor_engine_batch(log_probs, graphs):
    """Generic per-sample acceptor engine: losses[b] = -logZ(em_b ∘ g_b).

    The reference's per-sample compose + forward_score + gtn.backward
    execution model for criteria whose graphs are built per batch (STC's
    star graphs, stc.py:84-118) — bench.py's same-algorithm CPU
    denominator.  graphs: list of B host ``Graph``s.  Returns
    (losses [B], grad [B, T, C]).
    """
    lib = load_library()
    lp = np.ascontiguousarray(log_probs, dtype=np.float32)
    B, T, C = lp.shape
    handles = [to_native(g) for g in graphs]  # keep alive until the call ends
    harr = (ctypes.c_void_p * B)(*[h.h for h in handles])
    losses = np.zeros(B, dtype=np.float32)
    grad = np.zeros((B, T, C), dtype=np.float32)
    fails = lib.tw_acceptor_engine_batch(
        B, T, C, _ptr(lp, ctypes.c_float),
        ctypes.cast(harr, ctypes.POINTER(ctypes.c_void_p)),
        _ptr(losses, ctypes.c_float), _ptr(grad, ctypes.c_float),
    )
    del handles
    if fails:
        raise ValueError(f"{fails} samples had no accepting path")
    return losses, grad


def _bind_pipeline(lib):
    if getattr(lib, "_pipeline_bound", False):
        return
    lib.tw_compile_alignment.restype = ctypes.c_void_p
    lib.tw_compile_alignment.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.tw_tables_free.argtypes = [ctypes.c_void_p]
    lib.tw_tables_sizes.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.tw_tables_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 11
    lib._pipeline_bound = True


def compile_alignment(lexicon_handle, tokens_handle, transitions_handle, target):
    """Full per-target transducer pipeline in one native call.

    Returns the same field layout as wfst.compile.CompiledGraph plus the
    transitions-arc widx arrays (emit and eps).
    """
    lib = load_library()
    _bind_pipeline(lib)
    tgt = np.asarray(target, dtype=np.int32)
    th = transitions_handle.h if transitions_handle is not None else None
    h = lib.tw_compile_alignment(
        lexicon_handle.h, tokens_handle.h, th,
        _ptr(tgt, ctypes.c_int32), len(tgt),
    )
    if not h:
        raise ValueError("native alignment pipeline failed (epsilon cycle?)")
    handle = _Handle(lib, None)  # manual free below (different dtor)
    try:
        sizes = np.zeros(4, dtype=np.int64)
        lib.tw_tables_sizes(h, sizes.ctypes.data)
        A, E, S, depth = (int(x) for x in sizes)
        src = np.zeros(A, np.int32)
        dst = np.zeros(A, np.int32)
        label = np.zeros(A, np.int32)
        weight = np.zeros(A, np.float32)
        widx = np.zeros(A, np.int64)
        start = np.zeros(S, np.float32)
        accept = np.zeros(S, np.float32)
        eps_src = np.zeros(E, np.int32)
        eps_dst = np.zeros(E, np.int32)
        eps_weight = np.zeros(E, np.float32)
        eps_widx = np.zeros(E, np.int64)
        lib.tw_tables_export(
            h, src.ctypes.data, dst.ctypes.data, label.ctypes.data,
            weight.ctypes.data, widx.ctypes.data, start.ctypes.data,
            accept.ctypes.data, eps_src.ctypes.data, eps_dst.ctypes.data,
            eps_weight.ctypes.data, eps_widx.ctypes.data,
        )
    finally:
        lib.tw_tables_free(h)
        handle.h = None
    return {
        "src": src, "dst": dst, "label": label, "weight": weight,
        "widx": widx.astype(np.int32),
        "start": start, "accept": accept,
        "eps_src": eps_src, "eps_dst": eps_dst, "eps_weight": eps_weight,
        "eps_widx": eps_widx.astype(np.int32),
        "eps_depth": depth,
    }


# ---------------------------------------------------------------------------
# Wordpiece encoder bindings
# ---------------------------------------------------------------------------


def _bind_wordpiece(lib):
    if getattr(lib, "_wp_bound", False):
        return
    lib.tw_wp_model_new.restype = ctypes.c_void_p
    lib.tw_wp_model_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.tw_wp_model_free.argtypes = [ctypes.c_void_p]
    lib.tw_wp_encode.restype = ctypes.c_int64
    lib.tw_wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.tw_wp_encode_batch.restype = ctypes.c_int64
    lib.tw_wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib._wp_bound = True


class WordpieceEncoder:
    """Native unigram Viterbi segmenter (scripts.wordpiece.UnigramModel
    semantics: codepoint DP, longest-piece tie-break, -100 unk fallback)."""

    def __init__(self, pieces, log_probs):
        lib = load_library()
        _bind_wordpiece(lib)
        self.lib = lib
        self.pieces = list(pieces)
        arr = (ctypes.c_char_p * len(self.pieces))(
            *[p.encode("utf-8") for p in self.pieces]
        )
        lp = np.asarray(log_probs, dtype=np.float32)
        self.h = lib.tw_wp_model_new(arr, _ptr(lp, ctypes.c_float), len(self.pieces))
        self._buf = np.zeros(4096, dtype=np.int32)

    def __del__(self):
        if getattr(self, "h", None):
            self.lib.tw_wp_model_free(self.h)
            self.h = None

    def encode(self, text):
        data = text.encode("utf-8")
        n = self.lib.tw_wp_encode(
            self.h, data, len(data), _ptr(self._buf, ctypes.c_int32),
            len(self._buf),
        )
        if n == -1:
            self._buf = np.zeros(len(self._buf) * 4, dtype=np.int32)
            return self.encode(text)
        if n < 0:
            raise ValueError("wordpiece encode failed")
        out = []
        for v in self._buf[:n]:
            if v >= 0:
                out.append(self.pieces[v])
            else:
                off = -1 - int(v)
                end = off + 1
                while end < len(data) and (data[end] & 0xC0) == 0x80:
                    end += 1
                out.append(data[off:end].decode("utf-8"))
        return out

    def encode_batch(self, texts):
        """Segment many texts in one native call.  Returns a list of piece
        lists (same semantics as encode per text)."""
        datas = [t.encode("utf-8") for t in texts]
        buf = b"".join(datas)
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(d) for d in datas], out=offsets[1:])
        cap = max(4096, sum(len(t) for t in texts) + len(texts))
        out = np.zeros(cap, dtype=np.int32)
        counts = np.zeros(len(texts), dtype=np.int64)
        n = self.lib.tw_wp_encode_batch(
            self.h, buf, _ptr(offsets, ctypes.c_int64), len(texts),
            _ptr(out, ctypes.c_int32), cap, _ptr(counts, ctypes.c_int64),
        )
        if n < 0:
            raise ValueError("wordpiece batch encode failed")
        ids_all = out[: int(n)].tolist()
        counts_l = counts.tolist()
        P = self.pieces
        results = []
        pos = 0
        if n == 0 or int(out[: int(n)].min()) >= 0:
            # no unknowns anywhere: pure table lookup
            for c in counts_l:
                results.append([P[v] for v in ids_all[pos : pos + c]])
                pos += c
            return results
        for i, d in enumerate(datas):
            pieces = []
            for v in ids_all[pos : pos + counts_l[i]]:
                if v >= 0:
                    pieces.append(P[v])
                else:
                    off = -1 - v
                    end = off + 1
                    while end < len(d) and (d[end] & 0xC0) == 0x80:
                        end += 1
                    pieces.append(d[off:end].decode("utf-8"))
            pos += counts_l[i]
            results.append(pieces)
        return results


def _bind_editdist(lib):
    if getattr(lib, "_ed_bound", False):
        return
    lib.tw_edit_distance.restype = ctypes.c_int64
    lib.tw_edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib._ed_bound = True


def edit_distance_i32(a, b):
    """Levenshtein over int32 numpy arrays via the native library."""
    lib = load_library()
    _bind_editdist(lib)
    a = np.ascontiguousarray(a, dtype=np.int32)
    b = np.ascontiguousarray(b, dtype=np.int32)
    return int(
        lib.tw_edit_distance(
            _ptr(a, ctypes.c_int32), len(a), _ptr(b, ctypes.c_int32), len(b)
        )
    )


def _bind_estep(lib):
    if getattr(lib, "_estep_bound", False):
        return
    lib.tw_wp_estep.restype = ctypes.c_double
    lib.tw_wp_estep.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    lib._estep_bound = True


def wordpiece_estep(encoder: "WordpieceEncoder", sentences):
    """Native forward-backward expected piece counts over all
    segmentations.  Returns ({piece: count}, total log likelihood)."""
    lib = encoder.lib
    _bind_estep(lib)
    data = bytearray()
    offsets = np.zeros(len(sentences) + 1, dtype=np.int64)
    for i, s in enumerate(sentences):
        data.extend(s.encode("utf-8"))
        offsets[i + 1] = len(data)
    expected = np.zeros(len(encoder.pieces), dtype=np.float64)
    buf = bytes(data)
    ll = lib.tw_wp_estep(
        encoder.h, buf, _ptr(offsets, ctypes.c_int64), len(sentences),
        _ptr(expected, ctypes.c_double),
    )
    counts = {
        p: float(c) for p, c in zip(encoder.pieces, expected) if c > 0.0
    }
    return counts, float(ll)


def _bind_flac(lib):
    if getattr(lib, "_flac_bound", False):
        return
    lib.tw_flac_decode_alloc.restype = ctypes.POINTER(ctypes.c_int32)
    lib.tw_flac_decode_alloc.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tw_flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    lib._flac_bound = True


def decode_flac(data: bytes):
    """Decode a FLAC stream (native/flac.cc) to PCM.

    Returns ``(samples, sample_rate)`` where samples is an int32 array of
    shape [frames, channels].  Raises ValueError on malformed input and
    RuntimeError when the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable; cannot decode FLAC")
    _bind_flac(lib)
    info = np.zeros(4, dtype=np.int64)
    ptr = lib.tw_flac_decode_alloc(data, len(data), _ptr(info, ctypes.c_int64))
    if not ptr:
        raise ValueError("malformed or unsupported FLAC stream")
    try:
        frames, channels = int(info[3]), int(info[1])
        samples = np.ctypeslib.as_array(ptr, shape=(frames * channels,))
        samples = samples.reshape(frames, channels).copy()
    finally:
        lib.tw_flac_free(ptr)
    return samples, int(info[0]), int(info[2])


def _bind_asg(lib):
    if getattr(lib, "_asg_bound", False):
        return
    lib.tw_asg_collapse.restype = ctypes.c_int64
    lib.tw_asg_collapse.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib._asg_bound = True


def _bind_forced(lib):
    if getattr(lib, "_forced_bound", False):
        return
    lib.tw_forced_collapse.restype = ctypes.c_int64
    lib.tw_forced_collapse.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib._forced_bound = True


def forced_collapse(paths, blank_idx, lengths=None):
    """Batched forced-blank transducer decode cleanup in one native call:
    run-collapse + feasibility check against the forced token graph
    (infeasible alignments decode to empty).  paths: int32 [B, T].
    Returns a list of int32 arrays, or None when the native library is
    unavailable."""
    lib = load_library()
    if lib is None or not hasattr(lib, "tw_forced_collapse"):
        return None
    _bind_forced(lib)
    paths = np.ascontiguousarray(paths, dtype=np.int32)
    B, T = paths.shape
    cap = max(B * T, 1)
    out = np.zeros(cap, dtype=np.int32)
    counts = np.zeros(B, dtype=np.int64)
    lens = (
        None if lengths is None
        else np.ascontiguousarray(lengths, dtype=np.int32)
    )
    n = lib.tw_forced_collapse(
        _ptr(paths, ctypes.c_int32), B, T,
        None if lens is None else _ptr(lens, ctypes.c_int32),
        int(blank_idx), _ptr(out, ctypes.c_int32), cap,
        _ptr(counts, ctypes.c_int64),
    )
    if n < 0:
        return None
    res = []
    pos = 0
    for b in range(B):
        res.append(out[pos : pos + counts[b]].copy())
        pos += counts[b]
    return res


def asg_collapse(paths, lengths=None, garbage_idx=None, num_replabels=0):
    """Batched ASG decode cleanup (collapse runs, drop garbage, unpack
    replabels) in one native call.  paths: int32 [B, T].  Returns a list of
    int32 arrays.  Returns None when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    _bind_asg(lib)
    paths = np.ascontiguousarray(paths, dtype=np.int32)
    B, T = paths.shape
    cap = B * T * (num_replabels + 1)
    out = np.zeros(cap, dtype=np.int32)
    counts = np.zeros(B, dtype=np.int64)
    lens = (
        None if lengths is None
        else np.ascontiguousarray(lengths, dtype=np.int32)
    )
    n = lib.tw_asg_collapse(
        _ptr(paths, ctypes.c_int32), B, T,
        None if lens is None else _ptr(lens, ctypes.c_int32),
        -1 if garbage_idx is None else int(garbage_idx),
        int(num_replabels), _ptr(out, ctypes.c_int32), cap,
        _ptr(counts, ctypes.c_int64),
    )
    if n < 0:
        return None
    res = []
    pos = 0
    for b in range(B):
        res.append(out[pos : pos + counts[b]].copy())
        pos += counts[b]
    return res
