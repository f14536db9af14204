// Native host-side WFST graph compiler for gtn_applications_tpu.
//
// This is the C++ tier of the framework's graph layer — the counterpart of
// the external GTN C++ library the reference delegates to (SURVEY.md §2.13).
// The device-side numeric core runs as Pallas TPU kernels; this library
// accelerates the *host* graph work that happens per vocabulary / target:
// epsilon-filter composition, path-preserving epsilon removal, trimming,
// projection, and host scoring.  Semantics mirror
// gtn_applications_tpu/wfst/ops.py exactly (differential-tested).
//
// C API (ctypes-friendly): graphs are opaque handles; arrays are exported
// via count + fill calls.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <tuple>
#include <unordered_map>
#include <vector>
#include <functional>
#include <thread>
#include <string>

namespace {

constexpr int32_t kEps = -1;
constexpr double kNeg = -1e30;

struct Graph {
  std::vector<uint8_t> start;
  // finals as multiset: parallel arrays (node, weight)
  std::vector<int64_t> final_node;
  std::vector<float> final_weight;
  std::vector<int32_t> src, dst, ilabel, olabel;
  std::vector<float> weight;
  // provenance (filled by tracked compose): per-arc source arc ids
  std::vector<int64_t> prov1, prov2;

  int64_t num_nodes() const { return (int64_t)start.size(); }
  int64_t num_arcs() const { return (int64_t)src.size(); }

  int add_node(bool is_start) {
    start.push_back(is_start ? 1 : 0);
    return (int)start.size() - 1;
  }
  void add_final(int64_t node, float w) {
    final_node.push_back(node);
    final_weight.push_back(w);
  }
  void add_arc(int32_t s, int32_t d, int32_t il, int32_t ol, float w) {
    src.push_back(s);
    dst.push_back(d);
    ilabel.push_back(il);
    olabel.push_back(ol);
    weight.push_back(w);
  }
  bool is_accept(int64_t node) const {
    for (auto n : final_node)
      if (n == node) return true;
    return false;
  }
  std::vector<std::vector<int64_t>> out_arcs() const {
    std::vector<std::vector<int64_t>> adj(num_nodes());
    for (int64_t i = 0; i < num_arcs(); ++i) adj[src[i]].push_back(i);
    return adj;
  }
  std::vector<std::vector<int64_t>> in_arcs() const {
    std::vector<std::vector<int64_t>> adj(num_nodes());
    for (int64_t i = 0; i < num_arcs(); ++i) adj[dst[i]].push_back(i);
    return adj;
  }
  std::unordered_map<int64_t, std::vector<float>> finals_map() const {
    std::unordered_map<int64_t, std::vector<float>> m;
    for (size_t i = 0; i < final_node.size(); ++i)
      m[final_node[i]].push_back(final_weight[i]);
    return m;
  }

  // lazily-built arc indexes, cached on the handle so repeated compositions
  // against the same (possibly ~10^6-arc) graph skip the rebuild
  struct ComposeIndex {
    bool built = false;
    std::unordered_map<int64_t, std::vector<int64_t>> in_by_label;  // (s,il)
    std::unordered_map<int64_t, std::vector<int64_t>> out_by_label;  // (s,ol)
    std::unordered_map<int64_t, std::vector<int64_t>> in_eps, out_eps;
    std::vector<std::vector<int64_t>> out_adj;
  };
  mutable ComposeIndex cidx;

  static int64_t pack_key(int64_t s, int32_t lbl) {
    return (s << 32) | (uint32_t)(lbl + 1);
  }

  const ComposeIndex& compose_index() const {
    if (!cidx.built) {
      for (int64_t i = 0; i < num_arcs(); ++i) {
        if (ilabel[i] == kEps)
          cidx.in_eps[src[i]].push_back(i);
        else
          cidx.in_by_label[pack_key(src[i], ilabel[i])].push_back(i);
        if (olabel[i] == kEps)
          cidx.out_eps[src[i]].push_back(i);
        else
          cidx.out_by_label[pack_key(src[i], olabel[i])].push_back(i);
      }
      cidx.out_adj = out_arcs();
      cidx.built = true;
    }
    return cidx;
  }
};

// ---------------------------------------------------------------------------
// trim (keep states on a start->accept path), with arc keep-map
// ---------------------------------------------------------------------------

Graph* trim_with_map(const Graph& g, std::vector<int64_t>* kept_arcs) {
  int64_t n = g.num_nodes();
  std::vector<uint8_t> fwd(n, 0), bwd(n, 0);
  {
    std::vector<int64_t> stack;
    auto adj = g.out_arcs();
    for (int64_t i = 0; i < n; ++i)
      if (g.start[i]) {
        fwd[i] = 1;
        stack.push_back(i);
      }
    while (!stack.empty()) {
      int64_t s = stack.back();
      stack.pop_back();
      for (auto a : adj[s]) {
        int64_t d = g.dst[a];
        if (!fwd[d]) {
          fwd[d] = 1;
          stack.push_back(d);
        }
      }
    }
  }
  {
    std::vector<int64_t> stack;
    auto adj = g.in_arcs();
    for (auto node : g.final_node)
      if (fwd[node] && !bwd[node]) {
        bwd[node] = 1;
        stack.push_back(node);
      }
    while (!stack.empty()) {
      int64_t s = stack.back();
      stack.pop_back();
      for (auto a : adj[s]) {
        int64_t d = g.src[a];
        if (!bwd[d]) {
          bwd[d] = 1;
          stack.push_back(d);
        }
      }
    }
  }
  std::vector<int64_t> remap(n, -1);
  Graph* out = new Graph();
  for (int64_t i = 0; i < n; ++i) {
    if (fwd[i] && bwd[i]) remap[i] = out->add_node(g.start[i]);
  }
  for (size_t i = 0; i < g.final_node.size(); ++i) {
    int64_t node = g.final_node[i];
    if (remap[node] >= 0) out->add_final(remap[node], g.final_weight[i]);
  }
  for (int64_t i = 0; i < g.num_arcs(); ++i) {
    int64_t s = remap[g.src[i]], d = remap[g.dst[i]];
    if (s >= 0 && d >= 0) {
      out->add_arc((int32_t)s, (int32_t)d, g.ilabel[i], g.olabel[i],
                   g.weight[i]);
      if (kept_arcs) kept_arcs->push_back(i);
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// compose with the 3-state epsilon-sequencing filter (mirrors ops.py)
// ---------------------------------------------------------------------------

struct KeyHash {
  size_t operator()(const std::tuple<int64_t, int64_t, int>& k) const {
    return std::hash<int64_t>()(std::get<0>(k) * 1315423911 ^
                                std::get<1>(k) * 2654435761 ^
                                std::get<2>(k));
  }
};

Graph* compose(const Graph& g1, const Graph& g2, bool track) {
  // Label-indexed matching from BOTH sides: per composite state the side
  // with fewer matching-relevant arcs drives the iteration.  This matters
  // for the token graph (allow_repeats=false gives ~V^2 arcs, V ~ 1000)
  // composed with small per-target lattices: iterating the dense side per
  // state is ~300x slower.
  const auto& idx1 = g1.compose_index();
  const auto& idx2 = g2.compose_index();
  const auto& g2_by_label = idx2.in_by_label;
  const auto& g1_by_olabel = idx1.out_by_label;
  const auto& g2_eps = idx2.in_eps;
  const auto& g1_oeps = idx1.out_eps;
  const auto& g1_out = idx1.out_adj;
  const auto& g2_out = idx2.out_adj;
  auto pack = Graph::pack_key;
  auto f1 = g1.finals_map();
  auto f2 = g2.finals_map();

  Graph* out = new Graph();
  // Composite-state dedup: a flat (s1, s2, filter) table when the product
  // space is small (the common case — per-sample emission/target lattices),
  // hashed fallback for huge graph pairs.  The flat path removes the hash
  // from the innermost arc loop (~2x on the bench compositions).
  int64_t n2 = g2.num_nodes();
  int64_t product = g1.num_nodes() * n2 * 3;
  bool flat_ok = product > 0 && product <= (int64_t)1 << 24;
  std::vector<int64_t> flat;
  if (flat_ok) flat.assign(product, -1);
  std::unordered_map<std::tuple<int64_t, int64_t, int>, int64_t, KeyHash>
      state_map;
  std::deque<std::tuple<int64_t, int64_t, int>> queue;

  auto get_state = [&](int64_t s1, int64_t s2, int f) -> int64_t {
    int64_t* slot = nullptr;
    if (flat_ok) {
      slot = &flat[(s1 * n2 + s2) * 3 + f];
      if (*slot >= 0) return *slot;
    } else {
      auto it = state_map.find(std::make_tuple(s1, s2, f));
      if (it != state_map.end()) return it->second;
    }
    int64_t node = out->add_node(false);
    if (slot)
      *slot = node;
    else
      state_map[std::make_tuple(s1, s2, f)] = node;
    queue.push_back(std::make_tuple(s1, s2, f));
    auto i1 = f1.find(s1);
    auto i2 = f2.find(s2);
    if (i1 != f1.end() && i2 != f2.end()) {
      for (float w1 : i1->second)
        for (float w2 : i2->second) out->add_final(node, w1 + w2);
    }
    return node;
  };

  for (int64_t s1 = 0; s1 < g1.num_nodes(); ++s1) {
    if (!g1.start[s1]) continue;
    for (int64_t s2 = 0; s2 < g2.num_nodes(); ++s2) {
      if (!g2.start[s2]) continue;
      int64_t node = get_state(s1, s2, 0);
      out->start[node] = 1;
    }
  }

  std::vector<int64_t> prov1, prov2;
  while (!queue.empty()) {
    auto key = queue.front();
    queue.pop_front();
    int64_t s1 = std::get<0>(key), s2 = std::get<1>(key);
    int f = std::get<2>(key);
    int64_t src_node = get_state(s1, s2, f);

    // g1-only epsilon-output moves (+ paired epsilons)
    auto e1 = g1_oeps.find(s1);
    if (e1 != g1_oeps.end()) {
      for (auto a1 : e1->second) {
        int64_t d1 = g1.dst[a1];
        int32_t il1 = g1.ilabel[a1];
        float w1 = g1.weight[a1];
        if (f != 2) {
          int64_t d = get_state(d1, s2, 1);
          out->add_arc((int32_t)src_node, (int32_t)d, il1, kEps, w1);
          if (track) {
            prov1.push_back(a1);
            prov2.push_back(-1);
          }
        }
        if (f == 0) {
          auto it = g2_eps.find(s2);
          if (it != g2_eps.end()) {
            for (auto a2 : it->second) {
              int64_t d = get_state(d1, g2.dst[a2], 0);
              out->add_arc((int32_t)src_node, (int32_t)d, il1, g2.olabel[a2],
                           w1 + g2.weight[a2]);
              if (track) {
                prov1.push_back(a1);
                prov2.push_back(a2);
              }
            }
          }
        }
      }
    }

    // matched moves, driven from the sparser side per state
    int64_t deg1 = (int64_t)g1_out[s1].size();
    int64_t deg2 = (int64_t)g2_out[s2].size();
    if (deg2 <= deg1) {
      for (auto a2 : g2_out[s2]) {
        int32_t il2 = g2.ilabel[a2];
        if (il2 == kEps) continue;
        auto it = g1_by_olabel.find(pack(s1, il2));
        if (it == g1_by_olabel.end()) continue;
        for (auto a1 : it->second) {
          int64_t d = get_state(g1.dst[a1], g2.dst[a2], 0);
          out->add_arc((int32_t)src_node, (int32_t)d, g1.ilabel[a1],
                       g2.olabel[a2], g1.weight[a1] + g2.weight[a2]);
          if (track) {
            prov1.push_back(a1);
            prov2.push_back(a2);
          }
        }
      }
    } else {
      for (auto a1 : g1_out[s1]) {
        int32_t ol1 = g1.olabel[a1];
        if (ol1 == kEps) continue;
        auto it = g2_by_label.find(pack(s2, ol1));
        if (it == g2_by_label.end()) continue;
        for (auto a2 : it->second) {
          int64_t d = get_state(g1.dst[a1], g2.dst[a2], 0);
          out->add_arc((int32_t)src_node, (int32_t)d, g1.ilabel[a1],
                       g2.olabel[a2], g1.weight[a1] + g2.weight[a2]);
          if (track) {
            prov1.push_back(a1);
            prov2.push_back(a2);
          }
        }
      }
    }
    if (f != 1) {
      auto it = g2_eps.find(s2);
      if (it != g2_eps.end()) {
        for (auto a2 : it->second) {
          int64_t d = get_state(s1, g2.dst[a2], 2);
          out->add_arc((int32_t)src_node, (int32_t)d, kEps, g2.olabel[a2],
                       g2.weight[a2]);
          if (track) {
            prov1.push_back(-1);
            prov2.push_back(a2);
          }
        }
      }
    }
  }

  std::vector<int64_t> kept;
  Graph* trimmed = trim_with_map(*out, &kept);
  delete out;
  if (track) {
    trimmed->prov1.reserve(kept.size());
    trimmed->prov2.reserve(kept.size());
    for (auto a : kept) {
      trimmed->prov1.push_back(prov1[a]);
      trimmed->prov2.push_back(prov2[a]);
    }
  }
  return trimmed;
}

// ---------------------------------------------------------------------------
// epsilon removal (path-multiplicity preserving; GTN boolean-accept parity)
// ---------------------------------------------------------------------------

Graph* remove_eps(const Graph& g) {
  int64_t n = g.num_nodes();
  std::unordered_map<int64_t, std::vector<int64_t>> eps_adj, nonteps;
  for (int64_t i = 0; i < g.num_arcs(); ++i) {
    if (g.ilabel[i] == kEps && g.olabel[i] == kEps)
      eps_adj[g.src[i]].push_back(i);
    else
      nonteps[g.src[i]].push_back(i);
  }
  auto finals = g.finals_map();

  Graph* out = new Graph();
  for (int64_t i = 0; i < n; ++i) out->add_node(g.start[i]);

  // DFS enumerating all eps paths from s (including the empty one)
  std::vector<std::pair<int64_t, float>> results;
  for (int64_t s = 0; s < n; ++s) {
    results.clear();
    std::vector<std::tuple<int64_t, float>> stack = {{s, 0.0f}};
    // cycle guard via on-path set per branch: track depth-limited by arcs
    // (epsilon graphs here are DAGs; guard with a generous expansion cap)
    std::vector<std::pair<int64_t, float>> work = {{s, 0.0f}};
    // iterative DFS carrying the path set is costly; assume acyclic (the
    // Python reference raises on cycles; builders never create them) and
    // cap expansions.
    size_t cap = 1000000;
    std::deque<std::pair<int64_t, float>> dq = {{s, 0.0f}};
    while (!dq.empty()) {
      auto [u, w] = dq.front();
      dq.pop_front();
      results.push_back({u, w});
      if (results.size() > cap) {
        delete out;
        return nullptr;  // epsilon explosion / cycle
      }
      auto it = eps_adj.find(u);
      if (it != eps_adj.end()) {
        for (auto a : it->second) dq.push_back({g.dst[a], w + g.weight[a]});
      }
    }
    bool has_final = false;
    float best_final = 0.0f;
    for (auto& [u, wp] : results) {
      auto fit = finals.find(u);
      if (fit != finals.end()) {
        for (float fw : fit->second) {
          float cand = wp + fw;
          if (!has_final || cand > best_final) {
            has_final = true;
            best_final = cand;
          }
        }
      }
      auto nit = nonteps.find(u);
      if (nit != nonteps.end()) {
        for (auto a : nit->second) {
          out->add_arc((int32_t)s, g.dst[a], g.ilabel[a], g.olabel[a],
                       wp + g.weight[a]);
        }
      }
    }
    if (has_final) out->add_final(s, best_final);
  }
  Graph* trimmed = trim_with_map(*out, nullptr);
  delete out;
  return trimmed;
}

// ---------------------------------------------------------------------------
// host scoring (DAG log / tropical)
// ---------------------------------------------------------------------------

bool topo_order(const Graph& g, std::vector<int64_t>* order) {
  int64_t n = g.num_nodes();
  std::vector<int64_t> indeg(n, 0);
  for (auto d : g.dst) indeg[d]++;
  order->clear();
  for (int64_t i = 0; i < n; ++i)
    if (indeg[i] == 0) order->push_back(i);
  auto adj = g.out_arcs();
  for (size_t h = 0; h < order->size(); ++h) {
    int64_t s = (*order)[h];
    for (auto a : adj[s]) {
      if (--indeg[g.dst[a]] == 0) order->push_back(g.dst[a]);
    }
  }
  return (int64_t)order->size() == n;
}

double logadd(double a, double b) {
  if (a <= kNeg / 2) return b;
  if (b <= kNeg / 2) return a;
  double m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// Flat CSR adjacency (arc ids grouped by source node) — avoids the
// vector-of-vectors construction on multi-million-arc composed graphs.
struct Csr {
  std::vector<int64_t> off;  // [n + 1]
  std::vector<int64_t> arc;  // [A], arc ids sorted by src
};

Csr out_csr(const Graph& g) {
  Csr c;
  int64_t n = g.num_nodes(), A = g.num_arcs();
  c.off.assign(n + 1, 0);
  for (auto s : g.src) c.off[s + 1]++;
  for (int64_t i = 0; i < n; ++i) c.off[i + 1] += c.off[i];
  c.arc.resize(A);
  std::vector<int64_t> cur(c.off.begin(), c.off.end() - 1);
  for (int64_t a = 0; a < A; ++a) c.arc[cur[g.src[a]]++] = a;
  return c;
}

bool topo_order_csr(const Graph& g, const Csr& c,
                    std::vector<int64_t>* order) {
  int64_t n = g.num_nodes();
  std::vector<int64_t> indeg(n, 0);
  for (auto d : g.dst) indeg[d]++;
  order->clear();
  order->reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (indeg[i] == 0) order->push_back(i);
  for (size_t h = 0; h < order->size(); ++h) {
    int64_t s = (*order)[h];
    for (int64_t k = c.off[s]; k < c.off[s + 1]; ++k)
      if (--indeg[g.dst[c.arc[k]]] == 0) order->push_back(g.dst[c.arc[k]]);
  }
  return (int64_t)order->size() == n;
}

double score(const Graph& g, bool tropical) {
  std::vector<int64_t> order;
  if (!topo_order(g, &order)) return std::nan("");
  std::vector<double> alpha(g.num_nodes(), kNeg);
  for (int64_t i = 0; i < g.num_nodes(); ++i)
    if (g.start[i]) alpha[i] = 0.0;
  auto adj = g.out_arcs();
  for (auto s : order) {
    if (alpha[s] <= kNeg / 2) continue;
    for (auto a : adj[s]) {
      double v = alpha[s] + g.weight[a];
      if (tropical)
        alpha[g.dst[a]] = std::max(alpha[g.dst[a]], v);
      else
        alpha[g.dst[a]] = logadd(alpha[g.dst[a]], v);
    }
  }
  double total = kNeg;
  for (size_t i = 0; i < g.final_node.size(); ++i) {
    double v = alpha[g.final_node[i]];
    if (v <= kNeg / 2) continue;
    v += g.final_weight[i];
    total = tropical ? std::max(total, v) : logadd(total, v);
  }
  return total;
}

// ---------------------------------------------------------------------------
// Graph-engine CTC: per-sample compose + log-semiring autodiff, threaded
// over the batch.  This reproduces the reference's actual execution model
// (/root/reference/criterions/ctc.py:31-94 — GTN's linear emission graph
// intersected with the CTC acceptor, forward_score, gtn.backward, one C++
// thread-pool task per sample) so bench.py can report an honest
// same-algorithm CPU denominator, and doubles as a differential gradient
// oracle for the Pallas lattice kernels.
// ---------------------------------------------------------------------------

// alpha/beta over a DAG; *arc_grad = d(logZ)/d(weight) = arc posteriors.
bool score_with_grad(const Graph& g, double* total_out,
                     std::vector<double>* arc_grad) {
  Csr adj = out_csr(g);
  std::vector<int64_t> order;
  if (!topo_order_csr(g, adj, &order)) return false;
  int64_t n = g.num_nodes();
  std::vector<double> alpha(n, kNeg), beta(n, kNeg);
  for (int64_t i = 0; i < n; ++i)
    if (g.start[i]) alpha[i] = 0.0;
  for (auto s : order) {
    if (alpha[s] <= kNeg / 2) continue;
    for (int64_t k = adj.off[s]; k < adj.off[s + 1]; ++k) {
      int64_t a = adj.arc[k];
      alpha[g.dst[a]] = logadd(alpha[g.dst[a]], alpha[s] + g.weight[a]);
    }
  }
  double total = kNeg;
  for (size_t i = 0; i < g.final_node.size(); ++i) {
    double v = alpha[g.final_node[i]];
    if (v <= kNeg / 2) continue;
    total = logadd(total, v + g.final_weight[i]);
  }
  *total_out = total;
  if (total <= kNeg / 2) return false;
  for (size_t i = 0; i < g.final_node.size(); ++i)
    beta[g.final_node[i]] =
        logadd(beta[g.final_node[i]], g.final_weight[i]);
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    int64_t s = *it;
    for (int64_t k = adj.off[s]; k < adj.off[s + 1]; ++k) {
      int64_t a = adj.arc[k];
      beta[s] = logadd(beta[s], g.weight[a] + beta[g.dst[a]]);
    }
  }
  arc_grad->assign(g.num_arcs(), 0.0);
  for (int64_t a = 0; a < g.num_arcs(); ++a) {
    double lp = alpha[g.src[a]] + g.weight[a] + beta[g.dst[a]] - total;
    if (lp > kNeg / 2) (*arc_grad)[a] = std::exp(lp);
  }
  return true;
}

// CTC acceptor over the interleaved blank/label rows.  Row r consumes
// label(r) on every arc that ENTERS it (self-loop consumes its own label);
// a blank row may be skipped only between two distinct labels.  Single
// start row 0; accepting rows 2L and 2L-1.
Graph* ctc_acceptor(const int32_t* target, int64_t L, int32_t blank) {
  Graph* g = new Graph();
  int64_t rows = 2 * L + 1;
  auto row_label = [&](int64_t r) -> int32_t {
    return (r % 2 == 0) ? blank : target[r / 2];
  };
  // single start row: every alignment's first frame is reachable from row 0
  // (self-loop = blank, 0->1 = first label); adding row 1 as a start would
  // double-count label-initial paths under the enters-row convention.
  for (int64_t r = 0; r < rows; ++r) g->add_node(r == 0);
  for (int64_t r = 0; r < rows; ++r) {
    int32_t lbl = row_label(r);
    g->add_arc((int32_t)r, (int32_t)r, lbl, lbl, 0.0f);
    if (r + 1 < rows) {
      int32_t nl = row_label(r + 1);
      g->add_arc((int32_t)r, (int32_t)(r + 1), nl, nl, 0.0f);
    }
    if (r + 2 < rows && r % 2 == 1 && row_label(r + 2) != lbl) {
      int32_t sl = row_label(r + 2);
      g->add_arc((int32_t)r, (int32_t)(r + 2), sl, sl, 0.0f);
    }
  }
  g->add_final(rows - 1, 0.0f);
  if (L > 0) g->add_final(rows - 2, 0.0f);
  return g;
}

// T-frame emission lattice: arc (t, c) carries weight w[t*C + c].
Graph* emission_graph(int64_t T, int64_t C, const float* w) {
  Graph* g = new Graph();
  for (int64_t t = 0; t <= T; ++t) g->add_node(t == 0);
  for (int64_t t = 0; t < T; ++t)
    for (int64_t c = 0; c < C; ++c)
      g->add_arc((int32_t)t, (int32_t)(t + 1), (int32_t)c, (int32_t)c,
                 w[t * C + c]);
  g->add_final(T, 0.0f);
  return g;
}

// One sample: loss = -logZ(emissions ∘ ctc); grad (T*C floats, ADDED to
// grad_out) = d(loss)/d(emission weights), scattered through the tracked
// compose provenance.  Returns false on an empty composition.
bool ctc_engine_sample(int64_t T, int64_t C, const float* log_probs,
                       const int32_t* target, int64_t L, int32_t blank,
                       float* loss_out, float* grad_out) {
  Graph* em = emission_graph(T, C, log_probs);
  Graph* ctc = ctc_acceptor(target, L, blank);
  Graph* full = compose(*em, *ctc, true);
  delete ctc;
  delete em;
  if (!full || full->num_arcs() == 0) {
    delete full;
    return false;
  }
  double logz = 0.0;
  std::vector<double> arc_grad;
  bool ok = score_with_grad(*full, &logz, &arc_grad);
  if (ok) {
    *loss_out = (float)(-logz);
    for (int64_t a = 0; a < full->num_arcs(); ++a) {
      int64_t src_arc = full->prov1[a];
      if (src_arc >= 0) grad_out[src_arc] += (float)(-arc_grad[a]);
    }
  }
  delete full;
  return ok;
}

// ASG graphs (same conventions as criterions/asg.py create_transitions_graph
// / the reference's builders): node 0 starts, node i+1 accepts label i, and
// the arc order equals the row-major (C+1) x C weight layout, so arc k's
// weight is trans_w[k] and gradients scatter back by arc index.
Graph* asg_transitions_graph(int64_t C, const float* w) {
  Graph* g = new Graph();
  g->add_node(true);
  for (int64_t i = 1; i <= C; ++i) {
    g->add_node(false);
    g->add_final(i, 0.0f);
    g->add_arc(0, (int32_t)i, (int32_t)(i - 1), (int32_t)(i - 1),
               w[i - 1]);
  }
  for (int64_t i = 0; i < C; ++i)
    for (int64_t j = 0; j < C; ++j)
      g->add_arc((int32_t)(j + 1), (int32_t)(i + 1), (int32_t)i, (int32_t)i,
                 w[(i + 1) * C + j]);
  return g;
}

// Force-align chain: position l emits target[l] once then self-loops on it.
Graph* asg_fal_graph(const int32_t* tgt, int64_t L) {
  Graph* g = new Graph();
  g->add_node(true);
  for (int64_t l = 0; l < L; ++l) {
    g->add_node(false);
    g->add_arc((int32_t)l, (int32_t)(l + 1), tgt[l], tgt[l], 0.0f);
    g->add_arc((int32_t)(l + 1), (int32_t)(l + 1), tgt[l], tgt[l], 0.0f);
  }
  g->add_final(L, 0.0f);
  return g;
}

// One ASG sample: loss = logZ(em ∘ trans) - logZ(em ∘ (fal ∘ trans)).
// Emission grads ADD to grad_em [T*C]; transition grads ADD to
// grad_trans [(C+1)*C] (arc index == flat weight index).
bool asg_engine_sample(int64_t T, int64_t C, const float* log_probs,
                       const int32_t* target, int64_t L,
                       const Graph& trans, float* loss_out, float* grad_em,
                       float* grad_trans) {
  Graph* em = emission_graph(T, C, log_probs);

  Graph* fcc = compose(*em, trans, true);
  double z_fcc = 0.0;
  std::vector<double> g_fcc;
  bool ok = fcc && score_with_grad(*fcc, &z_fcc, &g_fcc);

  Graph* ft = nullptr;
  Graph* fal_full = nullptr;
  double z_fal = 0.0;
  std::vector<double> g_fal;
  if (ok) {
    Graph* fal = asg_fal_graph(target, L);
    ft = compose(*fal, trans, true);
    delete fal;
    fal_full = ft ? compose(*em, *ft, true) : nullptr;
    ok = fal_full && score_with_grad(*fal_full, &z_fal, &g_fal);
  }
  if (ok) {
    *loss_out = (float)(z_fcc - z_fal);
    for (int64_t a = 0; a < fcc->num_arcs(); ++a) {
      if (fcc->prov1[a] >= 0) grad_em[fcc->prov1[a]] += (float)g_fcc[a];
      if (fcc->prov2[a] >= 0) grad_trans[fcc->prov2[a]] += (float)g_fcc[a];
    }
    for (int64_t a = 0; a < fal_full->num_arcs(); ++a) {
      if (fal_full->prov1[a] >= 0)
        grad_em[fal_full->prov1[a]] -= (float)g_fal[a];
      int64_t fta = fal_full->prov2[a];
      if (fta >= 0 && ft->prov2[fta] >= 0)
        grad_trans[ft->prov2[fta]] -= (float)g_fal[a];
    }
  }
  delete fal_full;
  delete ft;
  delete fcc;
  delete em;
  return ok;
}

// ---------------------------------------------------------------------------
// Transducer alignment pipeline + arc-table compilation (single native call
// per target: avoids per-op Python<->C++ graph marshaling)
// ---------------------------------------------------------------------------

Graph* project(const Graph& g, bool input_side) {
  Graph* out = new Graph(g);
  if (input_side)
    out->olabel = out->ilabel;
  else
    out->ilabel = out->olabel;
  return out;
}

Graph* chain_graph(const int32_t* seq, int64_t len) {
  Graph* g = new Graph();
  g->add_node(true);
  if (len == 0) {
    g->add_final(0, 0.0f);
    return g;
  }
  for (int64_t i = 0; i < len; ++i) {
    g->add_node(false);
    g->add_arc((int32_t)i, (int32_t)(i + 1), seq[i], seq[i], 0.0f);
  }
  g->add_final(len, 0.0f);
  return g;
}

struct CompiledTables {
  std::vector<int32_t> src, dst, label;
  std::vector<float> weight;
  std::vector<int64_t> widx;  // transitions-arc index per emitting arc (-1)
  std::vector<float> start, accept;
  std::vector<int32_t> eps_src, eps_dst;
  std::vector<float> eps_weight;
  std::vector<int64_t> eps_widx;
  int64_t num_states = 0;
  int64_t eps_depth = 0;
};

int64_t eps_depth_of(const Graph& g) {
  std::unordered_map<int64_t, std::vector<int64_t>> eps_out;
  for (int64_t i = 0; i < g.num_arcs(); ++i)
    if (g.ilabel[i] == kEps && g.olabel[i] == kEps)
      eps_out[g.src[i]].push_back(g.dst[i]);
  std::unordered_map<int64_t, int64_t> depth;
  std::vector<int64_t> order;
  // simple memoized DFS (acyclic assumption, guarded by visit count)
  std::function<int64_t(int64_t, int64_t)> dfs = [&](int64_t s,
                                                     int64_t guard) -> int64_t {
    auto it = depth.find(s);
    if (it != depth.end()) return it->second;
    if (guard > (int64_t)g.num_nodes()) return 0;
    int64_t best = 0;
    auto eit = eps_out.find(s);
    if (eit != eps_out.end())
      for (auto d : eit->second) best = std::max(best, 1 + dfs(d, guard + 1));
    depth[s] = best;
    return best;
  };
  int64_t best = 0;
  for (int64_t s = 0; s < g.num_nodes(); ++s) best = std::max(best, dfs(s, 0));
  return best;
}

CompiledTables* compile_tables(const Graph& g, const std::vector<int64_t>& prov) {
  CompiledTables* t = new CompiledTables();
  int64_t S = g.num_nodes();
  t->num_states = S;
  t->start.assign(S, (float)kNeg);
  t->accept.assign(S, (float)kNeg);
  for (int64_t i = 0; i < S; ++i)
    if (g.start[i]) t->start[i] = 0.0f;
  auto finals = g.finals_map();
  for (auto& [node, ws] : finals) {
    double acc = kNeg;
    for (float w : ws) acc = logadd(acc, w);
    t->accept[node] = (float)acc;
  }
  for (int64_t i = 0; i < g.num_arcs(); ++i) {
    int64_t p = prov.empty() ? -1 : prov[i];
    if (g.ilabel[i] == kEps && g.olabel[i] == kEps) {
      t->eps_src.push_back(g.src[i]);
      t->eps_dst.push_back(g.dst[i]);
      t->eps_weight.push_back(g.weight[i]);
      t->eps_widx.push_back(p);
    } else {
      t->src.push_back(g.src[i]);
      t->dst.push_back(g.dst[i]);
      t->label.push_back(g.ilabel[i]);
      t->weight.push_back(g.weight[i]);
      t->widx.push_back(p);
    }
  }
  t->eps_depth = eps_depth_of(g);
  return t;
}

// Tropical best path with backpointers (gtn.viterbi_path semantics:
// reference transducer.py:221,228 call sites).  Fills *path with the
// best accepting path's arc ids in traversal order; false if none.
bool viterbi_arcs(const Graph& g, std::vector<int64_t>* path) {
  std::vector<int64_t> order;
  if (!topo_order(g, &order)) return false;
  int64_t n = g.num_nodes();
  std::vector<double> alpha(n, kNeg);
  std::vector<int64_t> bp(n, -1);
  for (int64_t i = 0; i < n; ++i)
    if (g.start[i]) alpha[i] = 0.0;
  auto adj = g.out_arcs();
  for (auto s : order) {
    if (alpha[s] <= kNeg / 2) continue;
    for (auto a : adj[s]) {
      double v = alpha[s] + g.weight[a];
      if (v > alpha[g.dst[a]]) {
        alpha[g.dst[a]] = v;
        bp[g.dst[a]] = a;
      }
    }
  }
  double best = kNeg;
  int64_t best_node = -1;
  for (size_t i = 0; i < g.final_node.size(); ++i) {
    double v = alpha[g.final_node[i]];
    if (v <= kNeg / 2) continue;
    v += g.final_weight[i];
    if (v > best) {
      best = v;
      best_node = g.final_node[i];
    }
  }
  if (best_node < 0) return false;
  path->clear();
  for (int64_t node = best_node; bp[node] >= 0; node = g.src[bp[node]])
    path->push_back(bp[node]);
  std::reverse(path->begin(), path->end());
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

void* tw_graph_new(int64_t n_nodes, const uint8_t* start,
                   const int64_t* final_node, const float* final_weight,
                   int64_t n_finals, int64_t n_arcs, const int32_t* src,
                   const int32_t* dst, const int32_t* ilabel,
                   const int32_t* olabel, const float* weight) {
  Graph* g = new Graph();
  g->start.assign(start, start + n_nodes);
  g->final_node.assign(final_node, final_node + n_finals);
  g->final_weight.assign(final_weight, final_weight + n_finals);
  g->src.assign(src, src + n_arcs);
  g->dst.assign(dst, dst + n_arcs);
  g->ilabel.assign(ilabel, ilabel + n_arcs);
  g->olabel.assign(olabel, olabel + n_arcs);
  g->weight.assign(weight, weight + n_arcs);
  return g;
}

void tw_graph_free(void* h) { delete (Graph*)h; }

// Pre-build the cached compose index so concurrent compositions against a
// shared handle only READ it (the lazy build is not thread-safe).
void tw_graph_warm(void* h) { ((Graph*)h)->compose_index(); }

int64_t tw_num_nodes(void* h) { return ((Graph*)h)->num_nodes(); }
int64_t tw_num_arcs(void* h) { return ((Graph*)h)->num_arcs(); }
int64_t tw_num_finals(void* h) { return ((Graph*)h)->final_node.size(); }
int64_t tw_has_prov(void* h) { return ((Graph*)h)->prov1.size() > 0; }

void tw_export(void* h, uint8_t* start, int64_t* final_node,
               float* final_weight, int32_t* src, int32_t* dst,
               int32_t* ilabel, int32_t* olabel, float* weight) {
  Graph* g = (Graph*)h;
  std::memcpy(start, g->start.data(), g->start.size());
  std::memcpy(final_node, g->final_node.data(),
              g->final_node.size() * sizeof(int64_t));
  std::memcpy(final_weight, g->final_weight.data(),
              g->final_weight.size() * sizeof(float));
  std::memcpy(src, g->src.data(), g->src.size() * sizeof(int32_t));
  std::memcpy(dst, g->dst.data(), g->dst.size() * sizeof(int32_t));
  std::memcpy(ilabel, g->ilabel.data(), g->ilabel.size() * sizeof(int32_t));
  std::memcpy(olabel, g->olabel.data(), g->olabel.size() * sizeof(int32_t));
  std::memcpy(weight, g->weight.data(), g->weight.size() * sizeof(float));
}

void tw_export_prov(void* h, int64_t* prov1, int64_t* prov2) {
  Graph* g = (Graph*)h;
  std::memcpy(prov1, g->prov1.data(), g->prov1.size() * sizeof(int64_t));
  std::memcpy(prov2, g->prov2.data(), g->prov2.size() * sizeof(int64_t));
}

void* tw_compose(void* h1, void* h2, int track) {
  return compose(*(Graph*)h1, *(Graph*)h2, track != 0);
}

void* tw_remove(void* h) { return remove_eps(*(Graph*)h); }

void* tw_trim(void* h) { return trim_with_map(*(Graph*)h, nullptr); }

void* tw_project(void* h, int input_side) {
  Graph* g = new Graph(*(Graph*)h);
  if (input_side)
    g->olabel = g->ilabel;
  else
    g->ilabel = g->olabel;
  return g;
}

double tw_forward_score(void* h) { return score(*(Graph*)h, false); }
double tw_viterbi_score(void* h) { return score(*(Graph*)h, true); }

// Batched graph-engine CTC (see ctc_engine_sample).  log_probs is
// [B, T, C] row-major; targets is [B, Lmax] padded, lens gives true
// lengths.  losses[b] = -logZ_b; grad [B, T, C] gets d(losses[b])/d(lp)
// (no batch-mean scaling — callers apply reduction).  One thread-pool
// task per sample, mirroring the reference engine's gtn.parallel_for.
// Returns the number of samples that failed (empty composition).
int64_t tw_ctc_engine_batch(int64_t B, int64_t T, int64_t C,
                            const float* log_probs, const int32_t* targets,
                            const int64_t* lens, int64_t Lmax, int32_t blank,
                            float* losses, float* grad) {
  std::memset(grad, 0, (size_t)(B * T * C) * sizeof(float));
  std::vector<int64_t> fails(B, 0);
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 16), B);
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      bool ok = ctc_engine_sample(T, C, log_probs + b * T * C,
                                  targets + b * Lmax, lens[b], blank,
                                  losses + b, grad + b * T * C);
      if (!ok) {
        fails[b] = 1;
        losses[b] = 0.0f;
      }
    }
  };
  if (n_threads <= 1) {
    work(0, B);
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t)
      pool.emplace_back(work, B * t / n_threads, B * (t + 1) / n_threads);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto f : fails) total += f;
  return total;
}

// Batched graph-engine ASG (see asg_engine_sample).  Shapes as in
// tw_ctc_engine_batch; trans_w is the (C+1) x C row-major transition
// matrix; grad_trans gets the batch-SUMMED transition gradient.  Fewer
// threads than the CTC engine: each in-flight sample materializes a
// ~T*(C+1)*C-arc composed graph.
int64_t tw_asg_engine_batch(int64_t B, int64_t T, int64_t C,
                            const float* log_probs, const int32_t* targets,
                            const int64_t* lens, int64_t Lmax,
                            const float* trans_w, float* losses,
                            float* grad_em, float* grad_trans) {
  std::memset(grad_em, 0, (size_t)(B * T * C) * sizeof(float));
  std::memset(grad_trans, 0, (size_t)((C + 1) * C) * sizeof(float));
  Graph* trans = asg_transitions_graph(C, trans_w);
  trans->compose_index();  // pre-build: threads only read it
  std::vector<int64_t> fails(B, 0);
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 8), B);
  std::vector<std::vector<float>> gt_local(
      n_threads, std::vector<float>((C + 1) * C, 0.0f));
  auto work = [&](int64_t tid, int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      bool ok = asg_engine_sample(T, C, log_probs + b * T * C,
                                  targets + b * Lmax, lens[b], *trans,
                                  losses + b, grad_em + b * T * C,
                                  gt_local[tid].data());
      if (!ok) {
        fails[b] = 1;
        losses[b] = 0.0f;
      }
    }
  };
  if (n_threads <= 1) {
    work(0, 0, B);
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t)
      pool.emplace_back(work, t, B * t / n_threads, B * (t + 1) / n_threads);
    for (auto& th : pool) th.join();
  }
  delete trans;
  for (int64_t t = 0; t < n_threads; ++t)
    for (int64_t k = 0; k < (C + 1) * C; ++k) grad_trans[k] += gt_local[t][k];
  int64_t total = 0;
  for (auto f : fails) total += f;
  return total;
}

// -- transducer alignment pipeline ------------------------------------------

// target chain ∘ lexicon -> project_output -> remove;
// tokens ∘ that -> remove -> project_input; optionally transitions ∘ that
// (tracked); then compile to arc tables.  Returns a CompiledTables handle.
// target chain ∘ lexicon -> project_output -> remove; tokens ∘ that ->
// remove -> project_input.  The marginalized-decomposition alignment
// acceptor (reference transducer.py:260-296), shared by the table
// compiler and the graph-engine comparator.
Graph* alignment_graph(const Graph& lexicon, const Graph& tokens,
                       const int32_t* target, int64_t target_len) {
  Graph* chain = chain_graph(target, target_len);
  Graph* c1 = compose(*chain, lexicon, false);
  delete chain;
  Graph* p1 = project(*c1, false);
  delete c1;
  Graph* r1 = remove_eps(*p1);
  delete p1;
  if (!r1) return nullptr;
  Graph* c2 = compose(tokens, *r1, false);
  delete r1;
  Graph* r2 = remove_eps(*c2);
  delete c2;
  if (!r2) return nullptr;
  Graph* align = project(*r2, true);
  delete r2;
  return align;
}

void* tw_compile_alignment(void* lexicon_h, void* tokens_h,
                           void* transitions_h, const int32_t* target,
                           int64_t target_len) {
  Graph* align =
      alignment_graph(*(Graph*)lexicon_h, *(Graph*)tokens_h, target,
                      target_len);
  if (!align) return nullptr;
  CompiledTables* out;
  if (transitions_h) {
    Graph* final_g = compose(*(Graph*)transitions_h, *align, true);
    delete align;
    out = compile_tables(*final_g, final_g->prov1);
    delete final_g;
  } else {
    out = compile_tables(*align, {});
    delete align;
  }
  return out;
}

// Batched graph-engine transducer (no transition model): per sample,
// loss = -logZ(emissions ∘ alignment_graph(target)); emission grads via
// tracked provenance.  The reference execution model for the ngram-0
// protocols (transducer.py:239-309 without the transitions term), used
// as bench.py's same-algorithm CPU denominator.  Shapes as in
// tw_ctc_engine_batch.  Returns the number of failed samples.
int64_t tw_transducer_engine_batch(int64_t B, int64_t T, int64_t C,
                                   const float* log_probs, void* lexicon_h,
                                   void* tokens_h, const int32_t* targets,
                                   const int64_t* lens, int64_t Lmax,
                                   float* losses, float* grad) {
  std::memset(grad, 0, (size_t)(B * T * C) * sizeof(float));
  Graph* lexicon = (Graph*)lexicon_h;
  Graph* tokens = (Graph*)tokens_h;
  lexicon->compose_index();  // warm shared indexes before the pool
  tokens->compose_index();
  std::vector<int64_t> fails(B, 0);
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 16), B);
  auto task = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      bool ok = false;
      Graph* align =
          alignment_graph(*lexicon, *tokens, targets + b * Lmax, lens[b]);
      if (align) {
        Graph* em = emission_graph(T, C, log_probs + b * T * C);
        Graph* full = compose(*em, *align, true);
        delete em;
        delete align;
        if (full && full->num_arcs() > 0) {
          double logz = 0.0;
          std::vector<double> arc_grad;
          ok = score_with_grad(*full, &logz, &arc_grad);
          if (ok) {
            losses[b] = (float)(-logz);
            float* gb = grad + b * T * C;
            for (int64_t a = 0; a < full->num_arcs(); ++a)
              if (full->prov1[a] >= 0)
                gb[full->prov1[a]] -= (float)arc_grad[a];
          }
        }
        delete full;
      } else {
        delete align;
      }
      if (!ok) {
        fails[b] = 1;
        losses[b] = 0.0f;
      }
    }
  };
  if (n_threads <= 1) {
    task(0, B);
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t)
      pool.emplace_back(task, B * t / n_threads, B * (t + 1) / n_threads);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto f : fails) total += f;
  return total;
}

// Batched graph-engine transducer decode WITHOUT a transition model —
// the reference's Transducer.viterbi (transducer.py:199-234 with
// transitions=None): per sample, tropical best path through the linear
// emission graph, composed with the token graph, second best path for
// the shortest ambiguous transduction, output labels with epsilons
// dropped.  Threaded over the batch; `out` is a [B, cap] int32 array the
// caller pre-fills with -1 (labels written front-aligned).  Returns the
// number of samples with no accepting decode.  This is bench.py's
// same-algorithm CPU denominator for the word-decomps decode protocol
// (reference benchmarks/transducer_benchmark.py:44-50).
int64_t tw_transducer_viterbi_batch(int64_t B, int64_t T, int64_t C,
                                    const float* log_probs, void* tokens_h,
                                    int32_t* out, int64_t cap) {
  Graph* tokens = (Graph*)tokens_h;
  tokens->compose_index();
  std::vector<int64_t> fails(B, 0);
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 16), B);
  auto task = [&](int64_t lo, int64_t hi) {
    std::vector<int64_t> path;
    for (int64_t b = lo; b < hi; ++b) {
      bool ok = false;
      Graph* em = emission_graph(T, C, log_probs + b * T * C);
      if (viterbi_arcs(*em, &path)) {
        std::vector<int32_t> chain(path.size());
        for (size_t i = 0; i < path.size(); ++i)
          chain[i] = em->ilabel[path[i]];
        Graph* ch = chain_graph(chain.data(), (int64_t)chain.size());
        Graph* full = compose(*ch, *tokens, false);
        delete ch;
        if (full && viterbi_arcs(*full, &path)) {
          int64_t k = 0;
          int32_t* ob = out + b * cap;
          for (auto a : path) {
            int32_t ol = full->olabel[a];
            if (ol != kEps && k < cap) ob[k++] = ol;
          }
          ok = true;
        }
        delete full;
      }
      delete em;
      if (!ok) fails[b] = 1;
    }
  };
  if (n_threads <= 1) {
    task(0, B);
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t)
      pool.emplace_back(task, B * t / n_threads, B * (t + 1) / n_threads);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto f : fails) total += f;
  return total;
}

// Batched graph-engine transducer WITH a transition model: per sample,
// loss = logZ(em ∘ trans) - logZ(em ∘ (trans ∘ alignment_graph(target)))
// (the reference's transitions pipeline, transducer.py:239-309 with the
// normalizer term), with emission grads via provenance and transition
// arc-weight grads via the prov2 chain — bench.py's same-algorithm CPU
// denominator for the ngram-1/2 protocols.  grad_trans has
// trans->num_arcs() entries (batch-summed d loss / d arc weight).
// Returns the number of failed samples.
int64_t tw_transducer_ngram_engine_batch(
    int64_t B, int64_t T, int64_t C, const float* log_probs, void* lexicon_h,
    void* tokens_h, void* trans_h, const int32_t* targets,
    const int64_t* lens, int64_t Lmax, float* losses, float* grad_em,
    float* grad_trans) {
  std::memset(grad_em, 0, (size_t)(B * T * C) * sizeof(float));
  Graph* lexicon = (Graph*)lexicon_h;
  Graph* tokens = (Graph*)tokens_h;
  Graph* trans = (Graph*)trans_h;
  int64_t n_trans_arcs = trans->num_arcs();
  std::memset(grad_trans, 0, (size_t)n_trans_arcs * sizeof(float));
  lexicon->compose_index();  // warm shared indexes before the pool
  tokens->compose_index();
  trans->compose_index();
  std::vector<int64_t> fails(B, 0);
  unsigned hw = std::thread::hardware_concurrency();
  // each in-flight sample holds an em ∘ trans product — cap like ASG
  int64_t n_threads = std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 8), B);
  std::vector<std::vector<float>> gt_local(
      n_threads, std::vector<float>((size_t)n_trans_arcs, 0.0f));
  auto task = [&](int64_t tid, int64_t lo, int64_t hi) {
    float* gt = gt_local[tid].data();
    for (int64_t b = lo; b < hi; ++b) {
      bool ok = false;
      Graph* em = emission_graph(T, C, log_probs + b * T * C);
      // normalizer: logZ(em ∘ trans)
      Graph* fcc = compose(*em, *trans, true);
      double z_fcc = 0.0;
      std::vector<double> g_fcc;
      ok = fcc && fcc->num_arcs() > 0 && score_with_grad(*fcc, &z_fcc, &g_fcc);
      // aligned term: logZ(em ∘ (trans ∘ align))
      Graph* ta = nullptr;
      Graph* full = nullptr;
      double z_al = 0.0;
      std::vector<double> g_al;
      if (ok) {
        Graph* align =
            alignment_graph(*lexicon, *tokens, targets + b * Lmax, lens[b]);
        ta = align ? compose(*trans, *align, true) : nullptr;
        delete align;
        full = ta ? compose(*em, *ta, true) : nullptr;
        ok = full && full->num_arcs() > 0 &&
             score_with_grad(*full, &z_al, &g_al);
      }
      if (ok) {
        losses[b] = (float)(z_fcc - z_al);
        float* ge = grad_em + b * T * C;
        for (int64_t a = 0; a < fcc->num_arcs(); ++a) {
          if (fcc->prov1[a] >= 0) ge[fcc->prov1[a]] += (float)g_fcc[a];
          if (fcc->prov2[a] >= 0) gt[fcc->prov2[a]] += (float)g_fcc[a];
        }
        for (int64_t a = 0; a < full->num_arcs(); ++a) {
          if (full->prov1[a] >= 0) ge[full->prov1[a]] -= (float)g_al[a];
          int64_t taa = full->prov2[a];
          if (taa >= 0 && ta->prov1[taa] >= 0)
            gt[ta->prov1[taa]] -= (float)g_al[a];
        }
      } else {
        fails[b] = 1;
        losses[b] = 0.0f;
      }
      delete full;
      delete ta;
      delete fcc;
      delete em;
    }
  };
  if (n_threads <= 1) {
    task(0, 0, B);
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t)
      pool.emplace_back(task, t, B * t / n_threads, B * (t + 1) / n_threads);
    for (auto& th : pool) th.join();
  }
  for (int64_t t = 0; t < n_threads; ++t)
    for (int64_t a = 0; a < n_trans_arcs; ++a)
      grad_trans[a] += gt_local[t][a];
  int64_t total = 0;
  for (auto f : fails) total += f;
  return total;
}

// Batched generic acceptor engine: per sample b, loss = -logZ(em_b ∘ g_b)
// for a caller-built acceptor graph (STC's per-sample star graphs, or any
// criterion graph), with emission grads via provenance.  Mirrors the
// reference's per-sample compose + forward_score + backward under a
// thread pool.  Returns the number of failed samples.
int64_t tw_acceptor_engine_batch(int64_t B, int64_t T, int64_t C,
                                 const float* log_probs, void** graphs,
                                 float* losses, float* grad) {
  std::memset(grad, 0, (size_t)(B * T * C) * sizeof(float));
  std::vector<int64_t> fails(B, 0);
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(std::min<int64_t>(hw ? hw : 1, 16), B);
  auto task = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      bool ok = false;
      Graph* em = emission_graph(T, C, log_probs + b * T * C);
      Graph* full = compose(*em, *(Graph*)graphs[b], true);
      delete em;
      if (full && full->num_arcs() > 0) {
        double logz = 0.0;
        std::vector<double> arc_grad;
        ok = score_with_grad(*full, &logz, &arc_grad);
        if (ok) {
          losses[b] = (float)(-logz);
          float* gb = grad + b * T * C;
          for (int64_t a = 0; a < full->num_arcs(); ++a)
            if (full->prov1[a] >= 0)
              gb[full->prov1[a]] -= (float)arc_grad[a];
        }
      }
      delete full;
      if (!ok) {
        fails[b] = 1;
        losses[b] = 0.0f;
      }
    }
  };
  if (n_threads <= 1) {
    task(0, B);
  } else {
    std::vector<std::thread> pool;
    for (int64_t t = 0; t < n_threads; ++t)
      pool.emplace_back(task, B * t / n_threads, B * (t + 1) / n_threads);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto f : fails) total += f;
  return total;
}

int64_t tw_wp_encode(void* h, const char* text, int64_t text_len,
                     int32_t* out, int64_t out_cap);

// Batch encode: sentences as one buffer with offsets[n+1]; results appended
// to out (capacity out_cap) with per-sentence counts in out_counts.
// Returns total ids written, or -1 if out_cap is too small.
int64_t tw_wp_encode_batch(void* h, const char* text, const int64_t* offsets,
                           int64_t n_sent, int32_t* out, int64_t out_cap,
                           int64_t* out_counts) {
  // Parallel phase: each sentence's ids fit in its byte span (ids <=
  // codepoints <= bytes), so thread t encodes its range into a scratch
  // buffer at the sentence's own byte offset; a serial pass compacts.
  int64_t total_bytes = offsets[n_sent];
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(hw ? hw : 1, 16);
  if (n_sent < n_threads || total_bytes < (1 << 15)) n_threads = 1;
  std::vector<int32_t> scratch((size_t)total_bytes);
  std::vector<int64_t> errs(n_threads, 0);
  auto work = [&](int64_t t) {
    int64_t lo = n_sent * t / n_threads, hi = n_sent * (t + 1) / n_threads;
    for (int64_t i = lo; i < hi; ++i) {
      int64_t cap = offsets[i + 1] - offsets[i];
      int64_t n = tw_wp_encode(h, text + offsets[i], cap,
                               scratch.data() + offsets[i], cap);
      if (n < 0) { errs[t] = -1; return; }
      out_counts[i] = n;
    }
  };
  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> ths;
    for (int64_t t = 0; t < n_threads; ++t) ths.emplace_back(work, t);
    for (auto& th : ths) th.join();
  }
  for (int64_t t = 0; t < n_threads; ++t)
    if (errs[t] < 0) return -1;
  int64_t total = 0;
  for (int64_t i = 0; i < n_sent; ++i) {
    if (total + out_counts[i] > out_cap) return -1;
    std::memcpy(out + total, scratch.data() + offsets[i],
                out_counts[i] * sizeof(int32_t));
    total += out_counts[i];
  }
  return total;
}

// Batched ASG decode cleanup: collapse consecutive repeats, drop the
// garbage label, and unpack replabels (criterions/asg.py viterbi host
// loop).  paths [B*T]; lengths may be null (use T).  Writes tokens to out
// (capacity B*T*(num_replabels+1) worst case is bounded by caller using
// B*T*(num_replabels+1)); per-sample counts to out_counts.  Returns total.
int64_t tw_asg_collapse(const int32_t* paths, int64_t B, int64_t T,
                        const int32_t* lengths, int32_t garbage_idx,
                        int32_t num_replabels, int32_t* out,
                        int64_t out_cap, int64_t* out_counts) {
  int64_t total = 0;
  for (int64_t b = 0; b < B; ++b) {
    int64_t len = lengths ? lengths[b] : T;
    if (len > T) len = T;
    int64_t start = total;
    int32_t prev_frame = INT32_MIN;
    int32_t prev_tok = -1;  // replabel-unpack state
    for (int64_t t = 0; t < len; ++t) {
      int32_t p = paths[b * T + t];
      if (p == prev_frame) continue;  // run collapse
      prev_frame = p;
      if (garbage_idx >= 0 && p == garbage_idx) continue;
      // inline unpack_replabels (asg.py:52-67)
      if (p >= num_replabels) {
        if (total >= out_cap) return -1;
        out[total++] = p - num_replabels;
        prev_tok = p;
      } else if (prev_tok != -1) {
        for (int32_t k = 0; k <= p; ++k) {
          if (total >= out_cap) return -1;
          out[total++] = prev_tok - num_replabels;
        }
        prev_tok = -1;
      }
    }
    out_counts[b] = total - start;
  }
  return total;
}

// Batched forced-blank transducer decode cleanup (criterions/transducer.py
// _alignment_to_tokens for blank='forced'; behavioral spec: reference
// criterions/transducer.py:199-234 compose with the forced token graph).
// The forced token graph accepts an alignment iff it is empty or begins
// and ends with a blank run with no two token runs adjacent; a feasible
// alignment transduces to one token per token run, an infeasible one to
// the empty output (empty composition).  paths [B*T], negative labels are
// dead frames and skipped; lengths may be null (use T).  Returns total
// tokens written, or -1 on overflow.
int64_t tw_forced_collapse(const int32_t* paths, int64_t B, int64_t T,
                           const int32_t* lengths, int32_t blank_idx,
                           int32_t* out, int64_t out_cap,
                           int64_t* out_counts) {
  int64_t total = 0;
  for (int64_t b = 0; b < B; ++b) {
    int64_t len = lengths ? lengths[b] : T;
    if (len > T) len = T;
    int64_t start = total;
    int32_t prev = INT32_MIN;
    bool feasible = true, seen_any = false, prev_is_tok = false;
    for (int64_t t = 0; t < len && feasible; ++t) {
      int32_t p = paths[b * T + t];
      if (p < 0 || p == prev) continue;
      prev = p;
      bool is_tok = (p != blank_idx);
      if (is_tok && (!seen_any || prev_is_tok)) {
        feasible = false;  // token before any blank, or adjacent token runs
        break;
      }
      seen_any = true;
      prev_is_tok = is_tok;
      if (is_tok) {
        if (total >= out_cap) return -1;
        out[total++] = p;
      }
    }
    if (prev_is_tok) feasible = false;  // must end on a blank run
    if (!feasible) total = start;
    out_counts[b] = total - start;
  }
  return total;
}

void tw_tables_free(void* h) { delete (CompiledTables*)h; }

void tw_tables_sizes(void* h, int64_t* sizes) {
  CompiledTables* t = (CompiledTables*)h;
  sizes[0] = (int64_t)t->src.size();
  sizes[1] = (int64_t)t->eps_src.size();
  sizes[2] = t->num_states;
  sizes[3] = t->eps_depth;
}

// -- wordpiece Viterbi encoder ----------------------------------------------
//
// Unigram-LM segmentation (scripts/wordpiece.py UnigramModel.encode) over
// UTF-8 text: DP over codepoint boundaries, piece lookup by byte substring,
// single-codepoint unknown fallback at a strong penalty.  This is the
// framework's hot string op (the BASELINE bytes/s north-star metric).

struct WpModel {
  // Pieces <= 15 bytes (the overwhelming majority) live in an
  // integer-keyed map: string keys cost a heap indirection + byte-wise
  // hash per probe and dominate the segmentation DP.
  struct K16 {
    uint64_t a, b;
    bool operator==(const K16& o) const { return a == o.a && b == o.b; }
  };
  struct K16Hash {
    size_t operator()(const K16& k) const {
      return std::hash<uint64_t>()(k.a * 0x9E3779B97F4A7C15ull ^ k.b);
    }
  };
  std::unordered_map<K16, std::pair<float, int32_t>, K16Hash> short_pieces;
  std::unordered_map<std::string, std::pair<float, int32_t>> pieces;  // > 15 bytes
  int64_t max_cp_len = 1;  // max piece length in codepoints
  int64_t max_bytes = 1;

  static bool pack16(const char* p, int64_t n, K16* out) {
    if (n > 15) return false;  // keep the top byte of b free for the length
    out->a = 0;
    out->b = 0;
    std::memcpy(&out->a, p, std::min<int64_t>(n, 8));
    if (n > 8) std::memcpy(&out->b, p + 8, n - 8);
    out->b |= ((uint64_t)n) << 56;
    return true;
  }

  const std::pair<float, int32_t>* find(const char* p, int64_t n) const {
    if (n > max_bytes) return nullptr;
    K16 k;
    if (pack16(p, n, &k)) {
      auto it = short_pieces.find(k);
      return it == short_pieces.end() ? nullptr : &it->second;
    }
    auto it = pieces.find(std::string(p, p + n));
    return it == pieces.end() ? nullptr : &it->second;
  }

  // Byte trie for the Viterbi encoder's forward walk: from a start
  // boundary, extending a match one byte at a time dies after a few bytes
  // on natural text, where the hash map costs max_cp_len full probes
  // (memcpy + 16-byte hash each) per boundary regardless.
  struct TrieNode {
    int32_t child_off = 0;   // into edge_bytes / edge_next
    int32_t piece_id = -1;   // terminal piece, -1 if none
    float lp = 0.0f;
    int16_t n_children = 0;
  };
  std::vector<TrieNode> trie;
  std::vector<unsigned char> edge_bytes;
  std::vector<int32_t> edge_next;
  int32_t trie_root[256];  // first byte -> node, -1 if absent

  inline int32_t trie_child(int32_t node, unsigned char c) const {
    const TrieNode& nd = trie[node];
    const unsigned char* b = edge_bytes.data() + nd.child_off;
    for (int16_t i = 0; i < nd.n_children; ++i)
      if (b[i] == c) return edge_next[nd.child_off + i];
    return -1;
  }

  void build_trie() {
    // Temporary pointer-free trie with per-node child maps, then flatten.
    struct TmpNode {
      std::map<unsigned char, int32_t> kids;
      int32_t piece_id = -1;
      float lp = 0.0f;
    };
    std::vector<TmpNode> tmp(1);  // 0 = root
    auto insert = [&](const char* p, size_t n, float lp, int32_t id) {
      int32_t cur = 0;
      for (size_t i = 0; i < n; ++i) {
        unsigned char c = (unsigned char)p[i];
        auto it = tmp[cur].kids.find(c);
        if (it == tmp[cur].kids.end()) {
          tmp.push_back(TmpNode());
          it = tmp[cur].kids.emplace(c, (int32_t)tmp.size() - 1).first;
        }
        cur = it->second;
      }
      tmp[cur].piece_id = id;
      tmp[cur].lp = lp;
    };
    for (auto& kv : short_pieces) {
      // unpack the K16 key back to bytes
      char buf[16];
      std::memcpy(buf, &kv.first.a, 8);
      uint64_t b_lo = kv.first.b & 0x00FFFFFFFFFFFFFFull;
      std::memcpy(buf + 8, &b_lo, 8);
      size_t n = (size_t)(kv.first.b >> 56);
      insert(buf, n, kv.second.first, kv.second.second);
    }
    for (auto& kv : pieces)
      insert(kv.first.data(), kv.first.size(), kv.second.first,
             kv.second.second);

    trie.assign(tmp.size(), TrieNode());
    edge_bytes.clear();
    edge_next.clear();
    for (size_t i = 0; i < tmp.size(); ++i) {
      trie[i].piece_id = tmp[i].piece_id;
      trie[i].lp = tmp[i].lp;
      trie[i].child_off = (int32_t)edge_bytes.size();
      trie[i].n_children = (int16_t)tmp[i].kids.size();
      for (auto& kv : tmp[i].kids) {
        edge_bytes.push_back(kv.first);
        edge_next.push_back(kv.second);
      }
    }
    for (int i = 0; i < 256; ++i) trie_root[i] = -1;
    const TrieNode& root = trie[0];
    for (int16_t i = 0; i < root.n_children; ++i)
      trie_root[edge_bytes[root.child_off + i]] =
          edge_next[root.child_off + i];
  }
};

static int64_t utf8_cp_len(const std::string& s) {
  int64_t n = 0;
  for (unsigned char c : s)
    if ((c & 0xC0) != 0x80) n++;
  return n;
}

void* tw_wp_model_new(const char** pieces, const float* log_probs,
                      int64_t n) {
  WpModel* m = new WpModel();
  for (int64_t i = 0; i < n; ++i) {
    std::string p(pieces[i]);
    WpModel::K16 k;
    if (WpModel::pack16(p.data(), (int64_t)p.size(), &k))
      m->short_pieces[k] = {log_probs[i], (int32_t)i};
    else
      m->pieces[p] = {log_probs[i], (int32_t)i};
    m->max_cp_len = std::max(m->max_cp_len, utf8_cp_len(p));
    m->max_bytes = std::max(m->max_bytes, (int64_t)p.size());
  }
  m->build_trie();
  return m;
}

void tw_wp_model_free(void* h) { delete (WpModel*)h; }

double tw_wp_estep_impl(WpModel* m, const char* text, const int64_t* offsets,
                        int64_t n_sent, double* expected);

double tw_wp_estep(void* h, const char* text, const int64_t* offsets,
                   int64_t n_sent, double* expected) {
  return tw_wp_estep_impl((WpModel*)h, text, offsets, n_sent, expected);
}

// Segment `text` (UTF-8, length text_len bytes); writes piece ids (or
// -1 - codepoint_byte_offset for unk codepoints) to out; returns the number
// of pieces, or -1 if out_cap is too small.
int64_t tw_wp_encode(void* h, const char* text, int64_t text_len,
                     int32_t* out, int64_t out_cap) {
  WpModel* m = (WpModel*)h;
  // codepoint boundaries (byte offsets, including 0 and text_len)
  std::vector<int64_t> bounds;
  for (int64_t i = 0; i < text_len; ++i)
    if (((unsigned char)text[i] & 0xC0) != 0x80) bounds.push_back(i);
  bounds.push_back(text_len);
  int64_t n = (int64_t)bounds.size() - 1;  // number of codepoints

  constexpr double kNegS = -1e30;
  constexpr double kUnk = -100.0;
  std::vector<double> best(n + 1, kNegS);
  std::vector<int64_t> back(n + 1, -1);
  std::vector<int32_t> back_id(n + 1, -1);
  best[0] = 0.0;
  // Forward relaxation: from each start boundary walk the byte trie; the
  // walk ends as soon as no piece continues (a few bytes on natural text),
  // where the substring-hash formulation pays max_cp_len full-key probes
  // per boundary unconditionally.  Same DP, same tie-breaking (a strictly
  // better score replaces; the hash loop's s-ascending order corresponds
  // to relaxing longer pieces first at each e, which the > test makes
  // order-independent).
  for (int64_t s = 0; s < n; ++s) {
    if (best[s] <= kNegS / 2) continue;
    const int64_t base = bounds[s];
    int64_t j = s;              // codepoints completed so far
    bool first_cp_in_vocab = false;
    int32_t node = -1;
    for (int64_t bi = base; bi < text_len; ++bi) {
      unsigned char c = (unsigned char)text[bi];
      node = (bi == base) ? m->trie_root[c] : m->trie_child(node, c);
      if (node < 0) break;
      if (bi + 1 == bounds[j + 1]) {  // completed codepoint j
        ++j;
        const WpModel::TrieNode& nd = m->trie[node];
        if (nd.piece_id >= 0) {
          if (j == s + 1) first_cp_in_vocab = true;
          double cand = best[s] + nd.lp;
          if (cand > best[j]) {
            best[j] = cand;
            back[j] = s;
            back_id[j] = nd.piece_id;
          }
        }
        if (j >= n) break;
      }
    }
    if (!first_cp_in_vocab) {  // single-codepoint unk fallback
      double cand = best[s] + kUnk;
      if (cand > best[s + 1]) {
        best[s + 1] = cand;
        back[s + 1] = s;
        back_id[s + 1] = -1;
      }
    }
  }
  // backtrace
  std::vector<int32_t> rev;
  int64_t e = n;
  while (e > 0) {
    int64_t s = back[e];
    if (s < 0) return -2;  // unreachable (shouldn't happen with unk fallback)
    if (back_id[e] >= 0)
      rev.push_back(back_id[e]);
    else
      rev.push_back((int32_t)(-1 - bounds[s]));  // unk at byte offset
    e = s;
  }
  if ((int64_t)rev.size() > out_cap) return -1;
  for (size_t i = 0; i < rev.size(); ++i) out[i] = rev[rev.size() - 1 - i];
  return (int64_t)rev.size();
}

// -- wordpiece EM E-step -----------------------------------------------------
//
// Forward-backward expected piece counts over all segmentations
// (scripts/wordpiece.py _e_step semantics: codepoint DP, -100 unk fallback
// for single codepoints, posterior threshold exp(-30)).

double wp_logadd(double a, double b) {
  if (a <= -1e29) return b;
  if (b <= -1e29) return a;
  double m = std::max(a, b);
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// sentences: concatenated UTF-8 buffer with offsets[n_sent + 1].
// expected[i] accumulates the count for piece id i; returns total loglik.
double tw_wp_estep_impl(WpModel* m, const char* text,
                        const int64_t* offsets, int64_t n_sent,
                        double* expected) {
  constexpr double kNegS = -1e30;
  constexpr double kUnk = -100.0;
  double total_ll = 0.0;
  std::string buf;
  for (int64_t si = 0; si < n_sent; ++si) {
    const char* s = text + offsets[si];
    int64_t len = offsets[si + 1] - offsets[si];
    std::vector<int64_t> bounds;
    for (int64_t i = 0; i < len; ++i)
      if (((unsigned char)s[i] & 0xC0) != 0x80) bounds.push_back(i);
    bounds.push_back(len);
    int64_t n = (int64_t)bounds.size() - 1;
    if (n == 0) continue;

    // matches[e]: list of (start, logp, piece_id or -1 for unk)
    struct Match { int64_t st; float lp; int32_t id; };
    std::vector<std::vector<Match>> matches(n + 1);
    std::vector<double> alpha(n + 1, kNegS), beta(n + 1, kNegS);
    alpha[0] = 0.0;
    for (int64_t e = 1; e <= n; ++e) {
      int64_t s0 = std::max<int64_t>(0, e - m->max_cp_len);
      double acc = kNegS;
      for (int64_t st = s0; st < e; ++st) {
        auto* ent = m->find(s + bounds[st], bounds[e] - bounds[st]);
        float lp;
        int32_t id;
        if (ent) {
          lp = ent->first;
          id = ent->second;
        } else if (e - st == 1) {
          lp = (float)kUnk;
          id = -1;
        } else {
          continue;
        }
        matches[e].push_back({st, lp, id});
        if (alpha[st] > kNegS / 2) acc = wp_logadd(acc, alpha[st] + lp);
      }
      alpha[e] = acc;
    }
    if (alpha[n] <= kNegS / 2) continue;
    total_ll += alpha[n];
    beta[n] = 0.0;
    for (int64_t st = n - 1; st >= 0; --st) {
      double acc = kNegS;
      int64_t emax = std::min(n, st + m->max_cp_len);
      for (int64_t e = st + 1; e <= emax; ++e) {
        for (auto& mt : matches[e]) {
          if (mt.st != st) continue;
          if (beta[e] > kNegS / 2) acc = wp_logadd(acc, mt.lp + beta[e]);
        }
      }
      beta[st] = acc;
    }
    for (int64_t e = 1; e <= n; ++e) {
      for (auto& mt : matches[e]) {
        if (mt.id < 0) continue;
        if (alpha[mt.st] <= kNegS / 2 || beta[e] <= kNegS / 2) continue;
        double post = alpha[mt.st] + mt.lp + beta[e] - alpha[n];
        if (post > -30.0) expected[mt.id] += std::exp(post);
      }
    }
  }
  return total_ll;
}

// -- edit distance -----------------------------------------------------------

// Levenshtein over int32 sequences (utils.edit_distance semantics).
int64_t tw_edit_distance(const int32_t* a, int64_t n, const int32_t* b,
                         int64_t m) {
  if (n < m) {
    std::swap(a, b);
    std::swap(n, m);
  }
  if (m == 0) return n;
  std::vector<int64_t> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

void tw_tables_export(void* h, int32_t* src, int32_t* dst, int32_t* label,
                      float* weight, int64_t* widx, float* start,
                      float* accept, int32_t* eps_src, int32_t* eps_dst,
                      float* eps_weight, int64_t* eps_widx) {
  CompiledTables* t = (CompiledTables*)h;
  auto cp = [](auto* dst_p, const auto& v) {
    std::memcpy(dst_p, v.data(), v.size() * sizeof(v[0]));
  };
  cp(src, t->src);
  cp(dst, t->dst);
  cp(label, t->label);
  cp(weight, t->weight);
  cp(widx, t->widx);
  cp(start, t->start);
  cp(accept, t->accept);
  cp(eps_src, t->eps_src);
  cp(eps_dst, t->eps_dst);
  cp(eps_weight, t->eps_weight);
  cp(eps_widx, t->eps_widx);
}

}  // extern "C"
