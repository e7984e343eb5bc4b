// Fill-reducing ordering + symbolic-fill toolkit (C++17, no deps).
//
// TPU-native equivalent of the reference's ordering stack capability
// (SURVEY.md §2.2 C5-C8): the brute-force ordering labeler of
// STMMQR/src/chol/SparseChol_analyze.c:429-613 picks, per matrix, the
// fill-minimizing method among {AMD, COLAMD, METIS-ND, NESDIS}.  This
// module provides the same *capability* — written from scratch against the
// published algorithms, not translated:
//   * minimum-degree ordering on a quotient graph (Markowitz/MD with element
//     absorption — the algorithmic core of AMD),
//   * column minimum-degree for QR/least-squares (MD on the A^T A pattern
//     with row cliques, the COLAMD problem statement),
//   * reverse Cuthill-McKee (bandwidth ordering),
//   * nested dissection via BFS level-set bisection with separator last
//     (the METIS_NodeND / NESDIS role),
//   * symbolic Cholesky fill count for an arbitrary ordering via quotient-
//     graph elimination (the lnz metric the labeler minimizes),
//   * BFS-grow graph partitioner (Cluster-GCN / multi-host edge partition).
//
// Exposed with a flat C ABI for ctypes (no pybind11 in this image).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <vector>

using std::vector;

namespace {

// ---------------------------------------------------------------------------
// CSR adjacency helpers (undirected; callers pre-symmetrize)
// ---------------------------------------------------------------------------
struct Adj {
  vector<int64_t> ptr;
  vector<int32_t> idx;
  int32_t n = 0;
};

Adj build_adj(int32_t n, int64_t nnz, const int32_t* src, const int32_t* dst,
              bool symmetrize) {
  Adj a;
  a.n = n;
  vector<int64_t> deg(n + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) {
    if (src[e] == dst[e]) continue;  // no self loops in adjacency
    deg[src[e] + 1]++;
    if (symmetrize) deg[dst[e] + 1]++;
  }
  a.ptr.assign(n + 1, 0);
  for (int32_t i = 0; i < n; ++i) a.ptr[i + 1] = a.ptr[i] + deg[i + 1];
  a.idx.resize(a.ptr[n]);
  vector<int64_t> fill = a.ptr;
  for (int64_t e = 0; e < nnz; ++e) {
    if (src[e] == dst[e]) continue;
    a.idx[fill[src[e]]++] = dst[e];
    if (symmetrize) a.idx[fill[dst[e]]++] = src[e];
  }
  // dedup neighbor lists
  vector<int32_t> out;
  out.reserve(a.idx.size());
  vector<int64_t> nptr(n + 1, 0);
  for (int32_t i = 0; i < n; ++i) {
    auto b = a.idx.begin() + a.ptr[i], e = a.idx.begin() + a.ptr[i + 1];
    std::sort(b, e);
    auto last = std::unique(b, e);
    for (auto it = b; it != last; ++it) out.push_back(*it);
    nptr[i + 1] = (int64_t)out.size();
  }
  a.idx = std::move(out);
  a.ptr = std::move(nptr);
  return a;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee
// ---------------------------------------------------------------------------
int32_t pseudo_peripheral(const Adj& a, const vector<char>& allowed,
                          int32_t start) {
  // repeated BFS to find a far vertex
  int32_t cur = start;
  int32_t best_ecc = -1;
  for (int iter = 0; iter < 4; ++iter) {
    vector<int32_t> dist(a.n, -1);
    std::queue<int32_t> q;
    q.push(cur);
    dist[cur] = 0;
    int32_t far = cur, ecc = 0;
    while (!q.empty()) {
      int32_t v = q.front();
      q.pop();
      for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p) {
        int32_t u = a.idx[p];
        if (!allowed[u] || dist[u] >= 0) continue;
        dist[u] = dist[v] + 1;
        if (dist[u] > ecc) { ecc = dist[u]; far = u; }
        q.push(u);
      }
    }
    if (ecc <= best_ecc) break;
    best_ecc = ecc;
    cur = far;
  }
  return cur;
}

void rcm_order_impl(const Adj& a, int32_t* perm) {
  vector<char> visited(a.n, 0), allowed(a.n, 1);
  vector<int32_t> deg(a.n);
  for (int32_t i = 0; i < a.n; ++i) deg[i] = (int32_t)(a.ptr[i + 1] - a.ptr[i]);
  int64_t k = 0;
  vector<int32_t> order;
  order.reserve(a.n);
  for (int32_t s = 0; s < a.n; ++s) {
    if (visited[s]) continue;
    int32_t root = pseudo_peripheral(a, allowed, s);
    if (visited[root]) root = s;
    std::queue<int32_t> q;
    q.push(root);
    visited[root] = 1;
    while (!q.empty()) {
      int32_t v = q.front();
      q.pop();
      order.push_back(v);
      vector<int32_t> nbrs;
      for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p)
        if (!visited[a.idx[p]]) nbrs.push_back(a.idx[p]);
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int32_t x, int32_t y) { return deg[x] < deg[y]; });
      for (int32_t u : nbrs) {
        if (!visited[u]) { visited[u] = 1; q.push(u); }
      }
    }
  }
  (void)k;
  // reverse
  for (int32_t i = 0; i < a.n; ++i) perm[i] = order[a.n - 1 - i];
}

// ---------------------------------------------------------------------------
// Quotient-graph minimum degree with element absorption.
//
// State per node: either a live variable, an element (eliminated, holds its
// boundary set), or dead (absorbed).  Eliminating variable v forms element v
// with L_v = (adjacent variables) ∪ (variables of adjacent elements) \ {v};
// adjacent elements are absorbed into v.  Degree of a variable is
// approximated by |A_i| + Σ|L_e| (AMD's upper bound, cheap to maintain).
// ---------------------------------------------------------------------------
struct MDResult {
  vector<int32_t> perm;   // perm[k] = node eliminated at step k
  int64_t lnz = 0;        // Σ_k |L_k| + n  (column counts incl. diagonal)
  int64_t flops = 0;      // Σ_k |L_k|^2 (Cholesky flop proxy)
};

// `init_elements`: optional pre-seeded cliques (COLAMD-style row elements) —
// element ids start at n.  When given, `a` may be an empty adjacency.
MDResult min_degree(const Adj& a, const int32_t* given_order /*nullable*/,
                    const vector<vector<int32_t>>* init_elements = nullptr) {
  const int32_t n = a.n;
  const int32_t ne0 = init_elements ? (int32_t)init_elements->size() : 0;
  vector<vector<int32_t>> varadj(n);       // variable-variable adjacency
  vector<vector<int32_t>> eladj(n);        // variable -> adjacent elements
  vector<vector<int32_t>> elnodes(n + ne0);  // element -> boundary variables
  vector<char> eliminated(n, 0);
  vector<int64_t> approx_deg(n, 0);
  for (int32_t i = 0; i < n; ++i) {
    varadj[i].assign(a.idx.begin() + a.ptr[i], a.idx.begin() + a.ptr[i + 1]);
    approx_deg[i] = (int64_t)varadj[i].size();
  }
  if (init_elements) {
    for (int32_t e = 0; e < ne0; ++e) {
      elnodes[n + e] = (*init_elements)[e];
      for (int32_t v : elnodes[n + e]) {
        eladj[v].push_back(n + e);
        approx_deg[v] += (int64_t)elnodes[n + e].size() - 1;
      }
    }
  }

  // bucket queue on approximate degree (monotone enough for MD heuristics)
  vector<vector<int32_t>> buckets(n + 1);
  vector<int32_t> bucket_of(n, -1);
  if (!given_order) {
    for (int32_t i = 0; i < n; ++i) {
      int64_t d = std::min<int64_t>(approx_deg[i], n);
      buckets[d].push_back(i);
      bucket_of[i] = (int32_t)d;
    }
  }
  int64_t cursor = 0;

  MDResult res;
  res.perm.resize(n);
  vector<char> mark(n, 0);
  vector<int32_t> boundary;

  for (int32_t k = 0; k < n; ++k) {
    int32_t v = -1;
    if (given_order) {
      v = given_order[k];
    } else {
      while (true) {
        while (cursor <= n && buckets[cursor].empty()) ++cursor;
        v = buckets[cursor].back();
        buckets[cursor].pop_back();
        if (eliminated[v]) continue;
        int64_t d = std::min<int64_t>(approx_deg[v], n);
        if (d != cursor) {  // stale entry: reinsert at true bucket
          buckets[d].push_back(v);
          if (d < cursor) cursor = d;
          continue;
        }
        break;
      }
    }

    // form boundary L_v
    boundary.clear();
    mark[v] = 1;
    for (int32_t u : varadj[v])
      if (!eliminated[u] && !mark[u]) { mark[u] = 1; boundary.push_back(u); }
    for (int32_t e : eladj[v]) {
      for (int32_t u : elnodes[e])
        if (!eliminated[u] && !mark[u]) { mark[u] = 1; boundary.push_back(u); }
      // absorbed: clear() keeps capacity (a shrink_to_fit here reallocates
      // on every absorption and dominated the profile; freeing is deferred
      // to scope exit — elimination order is unaffected)
      elnodes[e].clear();
    }

    const int64_t lk = (int64_t)boundary.size();
    res.lnz += lk + 1;
    res.flops += lk * lk;
    res.perm[k] = v;
    eliminated[v] = 1;

    // update boundary variables: drop v and absorbed elements, add element v
    elnodes[v] = boundary;
    for (int32_t u : boundary) {
      auto& ea = eladj[u];
      size_t w = 0;
      for (size_t r = 0; r < ea.size(); ++r)
        if (!elnodes[ea[r]].empty() || ea[r] == v) ea[w++] = ea[r];
      ea.resize(w);
      ea.push_back(v);
      // prune eliminated vars from varadj[u] lazily + recompute approx degree
      auto& va = varadj[u];
      size_t w2 = 0;
      for (size_t r = 0; r < va.size(); ++r)
        if (!eliminated[va[r]]) va[w2++] = va[r];
      va.resize(w2);
      int64_t d = (int64_t)va.size();
      for (int32_t e : ea) d += (int64_t)elnodes[e].size() - 1;
      approx_deg[u] = std::max<int64_t>(d, (int64_t)lk - 1);
      if (!given_order) {
        int64_t b = std::min<int64_t>(approx_deg[u], n);
        buckets[b].push_back(u);
        if (b < cursor) cursor = b;
      }
    }
    for (int32_t u : boundary) mark[u] = 0;
    mark[v] = 0;
    varadj[v].clear();
    eladj[v].clear();
  }
  return res;
}

// ---------------------------------------------------------------------------
// Supervariable approximate minimum degree (the fast solver-path mode).
//
// The exact-order quotient-graph MD above treats every variable
// individually — required by the training-data labeler, which wants exact
// per-node elimination orders, but 10-150x too slow for the solver path
// (the reference's amd.c orders these matrices in milliseconds precisely
// because of the three tricks this mode adds, written fresh against the
// published AMD algorithm [Amestoy, Davis, Duff 1996]):
//   * supervariables — indistinguishable variables (identical quotient-
//     graph adjacency) are merged and eliminated together; detected by
//     hashing each pivot-boundary variable after list compression;
//   * aggressive element absorption — an element whose boundary is fully
//     covered by the current pivot's (|L_e \ L_p| = 0, tracked with the
//     per-pivot w[] counters) is deleted outright;
//   * dense-variable postponement — variables whose initial degree exceeds
//     dense_cut never enter the quotient graph and are ordered last.
// Degrees are AMD's weighted *external* approximate degrees; the returned
// lnz/flops are estimates (the labeler keeps using the exact mode).
// ---------------------------------------------------------------------------
MDResult amd_fast(const Adj& a,
                  const vector<vector<int32_t>>* init_elements = nullptr,
                  int32_t dense_cut = -1) {
  const int32_t n = a.n;
  const int32_t ne0 = init_elements ? (int32_t)init_elements->size() : 0;
  const int32_t nid = n + ne0;  // variables [0,n) + initial elements [n,nid)
  MDResult res;
  res.perm.reserve(n);
  if (n == 0) return res;
  if (dense_cut < 0)
    dense_cut = std::max<int32_t>(
        16, (int32_t)(10.0 * std::sqrt((double)n)) );

  // --- initial degrees: exact neighborhood unions -------------------------
  // In clique mode the Σ(|e|-1) upper bound overcounts clique overlaps by
  // an order of magnitude on FE-style matrices (bcsstk14: ~1190 vs true
  // ~80), which (a) misclassifies nearly every variable as dense and
  // (b) mixes incomparable degree scales into pivot selection — measured
  // 3x fill blowup.  One stamp-scan per variable (Σ|e|² total) keeps the
  // dense test and the bucket queue on the same tight scale the external
  // degrees maintain after the first pivot touch.
  vector<int64_t> d(n, 0);
  if (init_elements) {
    vector<vector<int32_t>> var_els(n);
    for (int32_t e = 0; e < ne0; ++e)
      for (int32_t v : (*init_elements)[e]) var_els[v].push_back(e);
    vector<int32_t> iustamp(n, -1);
    for (int32_t i = 0; i < n; ++i) {
      int64_t dd = 0;
      iustamp[i] = i;
      for (int64_t p = a.ptr[i]; p < a.ptr[i + 1]; ++p)
        if (iustamp[a.idx[p]] != i) { iustamp[a.idx[p]] = i; ++dd; }
      for (int32_t e : var_els[i])
        for (int32_t x : (*init_elements)[e])
          if (iustamp[x] != i) { iustamp[x] = i; ++dd; }
      d[i] = dd;
    }
  } else {
    for (int32_t i = 0; i < n; ++i) d[i] = a.ptr[i + 1] - a.ptr[i];
  }

  vector<char> dense(n, 0);
  vector<int32_t> dense_vars;
  for (int32_t i = 0; i < n; ++i)
    if (d[i] > dense_cut) { dense[i] = 1; dense_vars.push_back(i); }

  // --- quotient graph state (dense vars excluded everywhere) -------------
  vector<vector<int32_t>> varadj(n);   // principal-variable adjacency
  vector<vector<int32_t>> eladj(n);    // variable -> live elements
  vector<vector<int32_t>> elnodes(nid);  // element -> member variables
  vector<char> el_live(nid, 0);
  vector<int32_t> nv(n, 1);            // supervariable weight (0 = absorbed)
  vector<char> elim(n, 0);
  vector<vector<int32_t>> members(n);  // absorbed twins, for perm expansion

  for (int32_t i = 0; i < n; ++i) {
    if (dense[i]) continue;
    auto& va = varadj[i];
    va.reserve(a.ptr[i + 1] - a.ptr[i]);
    for (int64_t p = a.ptr[i]; p < a.ptr[i + 1]; ++p)
      if (!dense[a.idx[p]]) va.push_back(a.idx[p]);
  }
  if (init_elements) {
    for (int32_t e = 0; e < ne0; ++e) {
      auto& el = elnodes[n + e];
      el.reserve((*init_elements)[e].size());
      for (int32_t v : (*init_elements)[e])
        if (!dense[v]) el.push_back(v);
      if (el.size() < 2) { el.clear(); continue; }
      el_live[n + e] = 1;
      for (int32_t v : el) eladj[v].push_back(n + e);
    }
    // degrees recomputed against the filtered cliques as exact unions —
    // the Σ(|e|-1) upper bound overcounts clique overlaps by an order of
    // magnitude on FE-style matrices, and mixing it with the tight
    // external degrees maintained after the first touch biases pivot
    // selection toward already-touched variables (measured 3x fill blowup
    // on bcsstk14); one stamp-scan per variable keeps the scales uniform
    vector<int32_t> iustamp(n, -1);
    for (int32_t i = 0; i < n; ++i) {
      if (dense[i]) continue;
      int64_t dd = 0;
      iustamp[i] = i;
      for (int32_t x : varadj[i])
        if (iustamp[x] != i) { iustamp[x] = i; ++dd; }
      for (int32_t e : eladj[i])
        for (int32_t x : elnodes[e])
          if (iustamp[x] != i) { iustamp[x] = i; ++dd; }
      d[i] = dd;
    }
  }

  // bucket queue on min(d, n); stale entries skipped on pop
  vector<vector<int32_t>> buckets(n + 1);
  int64_t nondense = 0;
  for (int32_t i = 0; i < n; ++i) {
    if (dense[i]) continue;
    buckets[std::min<int64_t>(d[i], n)].push_back(i);
    ++nondense;
  }
  int64_t cursor = 0;

  vector<int32_t> stamp(n, 0);       // variable mark (pivot-boundary test)
  vector<int32_t> estamp(nid, 0);    // element touched-this-pivot mark
  vector<int64_t> wval(nid, 0);      // |L_e \ L_p| weighted counters
  int32_t cur_stamp = 0;
  vector<int32_t> Lp;                // pivot boundary (principal vars)
  vector<uint64_t> hash_of(n, 0);
  vector<int32_t> vcmp(n, 0), ecmp(nid, 0);  // supervariable-compare stamps
  int32_t cmp_stamp = 0;

  int64_t emitted = 0;
  const int64_t to_emit = nondense;

  auto emit = [&](int32_t v) {
    res.perm.push_back(v);
    for (int32_t m : members[v]) res.perm.push_back(m);
    emitted += 1 + (int64_t)members[v].size();
  };

  while (emitted < to_emit) {
    // --- select pivot -----------------------------------------------------
    int32_t v = -1;
    while (true) {
      while (cursor <= n && buckets[cursor].empty()) ++cursor;
      if (cursor > n) return res;  // defensive: should be unreachable
      v = buckets[cursor].back();
      buckets[cursor].pop_back();
      if (elim[v] || nv[v] == 0) continue;            // dead/absorbed
      int64_t b = std::min<int64_t>(d[v], n);
      if (b != cursor) {                              // stale: reinsert
        buckets[b].push_back(v);
        if (b < cursor) cursor = b;
        continue;
      }
      break;
    }

    // --- form boundary L_p, absorb v's elements ---------------------------
    ++cur_stamp;
    Lp.clear();
    stamp[v] = cur_stamp;
    for (int32_t u : varadj[v])
      if (!elim[u] && nv[u] > 0 && stamp[u] != cur_stamp) {
        stamp[u] = cur_stamp;
        Lp.push_back(u);
      }
    for (int32_t e : eladj[v]) {
      if (!el_live[e]) continue;
      for (int32_t u : elnodes[e])
        if (!elim[u] && nv[u] > 0 && stamp[u] != cur_stamp) {
          stamp[u] = cur_stamp;
          Lp.push_back(u);
        }
      el_live[e] = 0;                                 // absorbed into v
      elnodes[e].clear();
      elnodes[e].shrink_to_fit();
    }
    varadj[v].clear();
    eladj[v].clear();

    // --- per-element |L_e \ L_p| counters + aggressive absorption ---------
    // every live element adjacent to any u in L_p is initialized on first
    // touch (simultaneously compacting its dead members), then decremented
    // by nv[u] for each of its members found in L_p
    for (int32_t u : Lp) {
      for (int32_t e : eladj[u]) {
        if (!el_live[e]) continue;
        if (estamp[e] != cur_stamp) {
          estamp[e] = cur_stamp;
          auto& el = elnodes[e];
          size_t w = 0;
          int64_t tot = 0;
          for (size_t r = 0; r < el.size(); ++r)
            if (!elim[el[r]] && nv[el[r]] > 0) {
              el[w++] = el[r];
              tot += nv[el[r]];
            }
          el.resize(w);
          wval[e] = tot;
        }
        wval[e] -= nv[u];
      }
    }

    // --- compress each boundary variable's lists ---------------------------
    // varadj[u] drops: eliminated, absorbed, members of L_p (covered by the
    // new element v), and v itself; eladj[u] drops dead + absorbed elements
    for (int32_t u : Lp) {
      auto& va = varadj[u];
      size_t w = 0;
      for (size_t r = 0; r < va.size(); ++r) {
        int32_t x = va[r];
        if (elim[x] || nv[x] == 0 || stamp[x] == cur_stamp || x == v) continue;
        va[w++] = x;
      }
      va.resize(w);
      auto& ea = eladj[u];
      size_t w2 = 0;
      for (size_t r = 0; r < ea.size(); ++r) {
        int32_t e = ea[r];
        if (!el_live[e]) continue;
        if (estamp[e] == cur_stamp && wval[e] == 0) {  // aggressive absorb
          el_live[e] = 0;
          elnodes[e].clear();
          elnodes[e].shrink_to_fit();
          continue;
        }
        ea[w2++] = e;
      }
      ea.resize(w2);
      ea.push_back(v);  // the new element (registered below)

      // commutative hash (no sort — the reference amd.c discipline);
      // equal-hash candidates are verified exactly by stamp comparison
      uint64_t h = 0;
      for (int32_t x : va) h += ((uint64_t)x + 1) * 0x9E3779B97F4Bull;
      for (int32_t e : ea) h += ((uint64_t)e + 1) * 0xC2B2AE3D27D5ull;
      hash_of[u] = h;
    }

    // --- supervariable detection (hash buckets, exact stamp compare) ------
    if (Lp.size() > 1) {
      // sort boundary by hash so equal-hash candidates are adjacent
      std::sort(Lp.begin(), Lp.end(), [&](int32_t x, int32_t y) {
        return hash_of[x] < hash_of[y] || (hash_of[x] == hash_of[y] && x < y);
      });
      // exact unordered-set equality of (varadj, eladj) via dedicated
      // comparison stamps (cur_stamp/estamp stay valid for the degree
      // update below): mark u's lists, then check t's lists are fully
      // marked + equal length
      auto lists_equal = [&](int32_t u, int32_t t) {
        if (varadj[u].size() != varadj[t].size() ||
            eladj[u].size() != eladj[t].size())
          return false;
        ++cmp_stamp;
        for (int32_t x : varadj[u]) vcmp[x] = cmp_stamp;
        for (int32_t e : eladj[u]) ecmp[e] = cmp_stamp;
        for (int32_t x : varadj[t])
          if (vcmp[x] != cmp_stamp) return false;
        for (int32_t e : eladj[t])
          if (ecmp[e] != cmp_stamp) return false;
        return true;
      };
      for (size_t i = 0; i + 1 < Lp.size(); ++i) {
        int32_t u = Lp[i];
        if (nv[u] == 0) continue;
        for (size_t j = i + 1;
             j < Lp.size() && hash_of[Lp[j]] == hash_of[u]; ++j) {
          int32_t t = Lp[j];
          if (nv[t] == 0) continue;
          if (lists_equal(u, t)) {
            nv[u] += nv[t];
            nv[t] = 0;
            members[u].push_back(t);
            if (!members[t].empty()) {
              members[u].insert(members[u].end(), members[t].begin(),
                                members[t].end());
              members[t].clear();
              members[t].shrink_to_fit();
            }
            varadj[t].clear(); varadj[t].shrink_to_fit();
            eladj[t].clear(); eladj[t].shrink_to_fit();
          }
        }
      }
    }

    // --- register element v, set external degrees, update buckets ---------
    int64_t wlp = 0;
    {
      auto& el = elnodes[v];
      el.clear();
      for (int32_t u : Lp)
        if (nv[u] > 0) { el.push_back(u); wlp += nv[u]; }
      el_live[v] = !el.empty();
    }
    const int64_t s = nv[v];
    res.lnz += s * wlp + s * (s + 1) / 2;
    res.flops += s * (wlp + s) * (wlp + s);

    for (int32_t u : Lp) {
      if (nv[u] == 0) continue;
      int64_t dd = wlp - nv[u];                        // via element v
      for (int32_t x : varadj[u]) dd += nv[x];
      for (int32_t e : eladj[u])
        if (e != v && estamp[e] == cur_stamp && wval[e] > 0) dd += wval[e];
      d[u] = std::max<int64_t>(dd, 0);
      int64_t b = std::min<int64_t>(d[u], n);
      buckets[b].push_back(u);
      if (b < cursor) cursor = b;
    }

    elim[v] = 1;
    emit(v);
  }

  // --- postponed dense variables last, lightest first ---------------------
  std::sort(dense_vars.begin(), dense_vars.end(),
            [&](int32_t x, int32_t y) { return d[x] < d[y]; });
  for (int32_t v : dense_vars) {
    res.perm.push_back(v);
    // dense columns go near-full: count them as full for the estimate
    int64_t rem = (int64_t)n - (int64_t)res.perm.size() + 1;
    res.lnz += rem;
    res.flops += rem * rem;
  }
  return res;
}

// ---------------------------------------------------------------------------
// Multilevel graph bisection (the METIS_NodeND / METIS_PartGraph role,
// written from scratch against the published multilevel scheme):
//   coarsen by heavy-edge matching -> greedy BFS-grown initial bisection at
//   the coarsest level -> project back, FM boundary refinement per level.
// Vertex separators come from a greedy minimum vertex cover of the cut.
// ---------------------------------------------------------------------------
struct WGraph {
  vector<int64_t> ptr;   // n+1
  vector<int32_t> idx;   // neighbor ids
  vector<int32_t> ewt;   // edge weights (parallel to idx)
  vector<int32_t> vwt;   // vertex weights
  int32_t n = 0;
  int64_t total_vwt = 0;
};

uint64_t lcg_next(uint64_t& s) {
  s = s * 6364136223846793005ull + 1442695040888963407ull;
  return s >> 33;
}

// Heavy-edge matching; returns coarse vertex count and fills cmap.
int32_t hem_match(const WGraph& g, vector<int32_t>& cmap, uint64_t seed) {
  vector<int32_t> order(g.n);
  std::iota(order.begin(), order.end(), 0);
  uint64_t s = seed * 2654435761ull + 1;
  for (int32_t i = g.n - 1; i > 0; --i)
    std::swap(order[i], order[lcg_next(s) % (uint64_t)(i + 1)]);
  cmap.assign(g.n, -1);
  int32_t cn = 0;
  for (int32_t v : order) {
    if (cmap[v] >= 0) continue;
    int32_t best = -1, best_w = -1;
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p) {
      int32_t u = g.idx[p];
      if (cmap[u] < 0 && g.ewt[p] > best_w) { best_w = g.ewt[p]; best = u; }
    }
    cmap[v] = cn;
    if (best >= 0) cmap[best] = cn;
    ++cn;
  }
  return cn;
}

WGraph coarsen_graph(const WGraph& g, const vector<int32_t>& cmap, int32_t cn) {
  WGraph c;
  c.n = cn;
  c.vwt.assign(cn, 0);
  c.total_vwt = g.total_vwt;
  for (int32_t v = 0; v < g.n; ++v) c.vwt[cmap[v]] += g.vwt[v];
  // bucket fine vertices by coarse id
  vector<int32_t> head(cn, -1), nxt(g.n, -1);
  for (int32_t v = 0; v < g.n; ++v) { nxt[v] = head[cmap[v]]; head[cmap[v]] = v; }
  c.ptr.assign(cn + 1, 0);
  vector<int32_t> mark(cn, -1);
  vector<int64_t> where(cn, 0);
  // two passes: count then fill
  for (int pass = 0; pass < 2; ++pass) {
    if (pass == 1) {
      for (int32_t i = 0; i < cn; ++i) c.ptr[i + 1] += c.ptr[i];
      c.idx.resize(c.ptr[cn]);
      c.ewt.assign(c.ptr[cn], 0);
      std::fill(mark.begin(), mark.end(), -1);
      for (int32_t i = cn; i > 0; --i) c.ptr[i] = c.ptr[i - 1];
      c.ptr[0] = 0;
    }
    for (int32_t cv = 0; cv < cn; ++cv) {
      int64_t deg = 0;
      for (int32_t v = head[cv]; v >= 0; v = nxt[v]) {
        for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p) {
          int32_t cu = cmap[g.idx[p]];
          if (cu == cv) continue;
          if (mark[cu] != cv) {
            mark[cu] = cv;
            if (pass == 1) {
              int64_t pos = c.ptr[cv + 1]++;
              where[cu] = pos;
              c.idx[pos] = cu;
              c.ewt[pos] = g.ewt[p];
            } else {
              ++deg;
            }
          } else if (pass == 1) {
            c.ewt[where[cu]] += g.ewt[p];
          }
        }
      }
      if (pass == 0) c.ptr[cv + 1] = deg;
      // reset marks for the counting pass? mark keyed by cv: no reset needed
    }
    if (pass == 1) {
      // c.ptr[cv+1] was used as a running fill cursor; it now equals the end
    }
  }
  return c;
}

int64_t cut_of(const WGraph& g, const vector<char>& part) {
  int64_t cut = 0;
  for (int32_t v = 0; v < g.n; ++v)
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p)
      if (part[v] != part[g.idx[p]]) cut += g.ewt[p];
  return cut / 2;
}

// One FM pass with rollback; returns the cut improvement (>= 0).
// Boundary-only refinement with an early-exit move limit (the METIS
// refinement discipline): only vertices incident to cut edges enter the
// heap, and the pass aborts once a bounded run of moves fails to improve
// on the best prefix — full-graph passes were 84 % of ND time.
int64_t fm_pass(const WGraph& g, vector<char>& part, int64_t target0,
                int64_t slack) {
  // two-phase init: one light edge scan marks boundary vertices, then
  // gains are computed only for those — the interior pays no gain math,
  // no heap pushes (the profile showed full-graph gain init dominating
  // ND time even after the round-4 boundary-only heap change)
  vector<char> boundary(g.n, 0);
  int64_t w0 = 0;
  for (int32_t v = 0; v < g.n; ++v) {
    if (part[v] == 0) w0 += g.vwt[v];
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p)
      if (part[g.idx[p]] != part[v]) {
        boundary[v] = 1;
        break;
      }
  }
  vector<int64_t> gain(g.n, 0);
  vector<char> hasg(g.n, 0);
  std::priority_queue<std::pair<int64_t, int32_t>> pq;
  for (int32_t v = 0; v < g.n; ++v) {
    if (!boundary[v]) continue;
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p)
      gain[v] += part[g.idx[p]] != part[v] ? g.ewt[p] : -g.ewt[p];
    hasg[v] = 1;
    pq.push({gain[v], v});
  }
  const int32_t move_limit =
      std::max<int32_t>(64, (int32_t)std::min<int64_t>(g.n / 100 + 32, 512));
  vector<char> moved(g.n, 0);
  vector<int32_t> seq;
  seq.reserve(256);
  int64_t cur = 0, best = 0;
  size_t best_k = 0;
  int32_t since_best = 0;
  while (!pq.empty() && since_best < move_limit) {
    auto [gv, v] = pq.top();
    pq.pop();
    if (moved[v] || gv != gain[v]) continue;  // stale entry
    // balance check for moving v to the other side
    int64_t nw0 = part[v] == 0 ? w0 - g.vwt[v] : w0 + g.vwt[v];
    if (nw0 < target0 - slack || nw0 > target0 + slack) continue;
    moved[v] = 1;
    char from = part[v];
    part[v] = (char)(1 - from);
    w0 = nw0;
    cur += gain[v];
    seq.push_back(v);
    if (cur > best) {
      best = cur;
      best_k = seq.size();
      since_best = 0;
    } else {
      ++since_best;
    }
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p) {
      int32_t u = g.idx[p];
      if (moved[u]) continue;
      if (!hasg[u]) {
        // interior vertex touched for the first time: compute its gain
        // from the CURRENT part state (v's move already applied)
        int64_t gu = 0;
        for (int64_t pp = g.ptr[u]; pp < g.ptr[u + 1]; ++pp)
          gu += part[g.idx[pp]] != part[u] ? g.ewt[pp] : -g.ewt[pp];
        gain[u] = gu;
        hasg[u] = 1;
      } else {
        gain[u] += (part[u] == from) ? 2 * g.ewt[p] : -2 * g.ewt[p];
      }
      pq.push({gain[u], u});
    }
    gain[v] = -gain[v];
  }
  // roll back to the best prefix
  for (size_t k = seq.size(); k > best_k; --k) part[seq[k - 1]] ^= 1;
  return best;
}

void fm_refine(const WGraph& g, vector<char>& part, int64_t target0,
               int64_t slack, int max_passes) {
  for (int pass = 0; pass < max_passes; ++pass)
    if (fm_pass(g, part, target0, slack) <= 0) break;
}

// Greedy BFS-grown bisection at the coarsest level; several seeds, best cut.
vector<char> initial_bisection(const WGraph& g, int64_t target0, int64_t slack) {
  vector<char> best_part;
  int64_t best_cut = -1;
  uint64_t s = 0x9e3779b97f4a7c15ull;
  for (int attempt = 0; attempt < 4; ++attempt) {
    vector<char> part(g.n, 1);
    int32_t start = (int32_t)(lcg_next(s) % (uint64_t)g.n);
    std::queue<int32_t> q;
    vector<char> seen(g.n, 0);
    q.push(start);
    seen[start] = 1;
    int64_t w0 = 0;
    int32_t scan = 0;
    while (w0 < target0) {
      if (q.empty()) {  // disconnected: seed the next unseen vertex
        while (scan < g.n && seen[scan]) ++scan;
        if (scan == g.n) break;
        seen[scan] = 1;
        q.push(scan);
      }
      int32_t v = q.front();
      q.pop();
      part[v] = 0;
      w0 += g.vwt[v];
      for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p)
        if (!seen[g.idx[p]]) { seen[g.idx[p]] = 1; q.push(g.idx[p]); }
    }
    fm_refine(g, part, target0, slack, 4);
    int64_t cut = cut_of(g, part);
    if (best_cut < 0 || cut < best_cut) { best_cut = cut; best_part = part; }
  }
  return best_part;
}

// Full multilevel bisection; frac = target share of side 0.
vector<char> multilevel_bisect(const WGraph& g0, double frac = 0.5) {
  vector<WGraph> levels;
  vector<vector<int32_t>> cmaps;
  levels.push_back(g0);
  uint64_t seed = 1;
  while (levels.back().n > 160) {
    const WGraph& g = levels.back();
    vector<int32_t> cmap;
    int32_t cn = hem_match(g, cmap, seed++);
    if (cn > (int32_t)(0.92 * g.n)) break;  // coarsening stalled
    WGraph c = coarsen_graph(g, cmap, cn);
    cmaps.push_back(std::move(cmap));
    levels.push_back(std::move(c));
  }
  const WGraph& coarsest = levels.back();
  int64_t target0 = (int64_t)(frac * (double)coarsest.total_vwt + 0.5);
  int64_t slack = std::max<int64_t>(coarsest.total_vwt / 20, 1);
  // vertex weights can be lumpy at the coarsest level: widen by the largest
  for (int32_t v = 0; v < coarsest.n; ++v)
    slack = std::max<int64_t>(slack, coarsest.vwt[v]);
  vector<char> part = initial_bisection(coarsest, target0, slack);
  // uncoarsen + refine
  for (size_t l = cmaps.size(); l > 0; --l) {
    const WGraph& fine = levels[l - 1];
    const vector<int32_t>& cmap = cmaps[l - 1];
    vector<char> fpart(fine.n);
    for (int32_t v = 0; v < fine.n; ++v) fpart[v] = part[cmap[v]];
    int64_t fslack = std::max<int64_t>(fine.total_vwt / 20, 1);
    // 3 passes per level (METIS-style few-iteration refinement; measured
    // cut parity with 6 on the sweep matrices at ~2x less FM time)
    fm_refine(fine, fpart, target0, fslack, 3);
    part = std::move(fpart);
  }
  return part;
}

// Induced weighted subgraph of `a` on `nodes` (unit weights unless
// `vwt` gives per-ORIGINAL-vertex weights — e.g. degrees, which makes
// multilevel_bisect balance EDGES per side instead of nodes).
WGraph induced_wgraph(const Adj& a, const vector<int32_t>& nodes,
                      vector<int32_t>& local,
                      const int32_t* vwt = nullptr) {
  const int32_t m = (int32_t)nodes.size();
  WGraph g;
  g.n = m;
  if (vwt) {
    g.vwt.resize(m);
    g.total_vwt = 0;
    for (int32_t i = 0; i < m; ++i) {
      g.vwt[i] = vwt[nodes[i]];
      g.total_vwt += g.vwt[i];
    }
  } else {
    g.vwt.assign(m, 1);
    g.total_vwt = m;
  }
  for (int32_t i = 0; i < m; ++i) local[nodes[i]] = i;
  g.ptr.assign(m + 1, 0);
  for (int32_t i = 0; i < m; ++i) {
    int32_t v = nodes[i];
    for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p)
      if (local[a.idx[p]] >= 0) g.ptr[i + 1]++;
  }
  for (int32_t i = 0; i < m; ++i) g.ptr[i + 1] += g.ptr[i];
  g.idx.resize(g.ptr[m]);
  g.ewt.assign(g.ptr[m], 1);
  vector<int64_t> fill(g.ptr.begin(), g.ptr.end() - 1);
  for (int32_t i = 0; i < m; ++i) {
    int32_t v = nodes[i];
    for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p) {
      int32_t lu = local[a.idx[p]];
      if (lu >= 0) g.idx[fill[i]++] = lu;
    }
  }
  return g;
}

// Vertex separator from an edge cut: greedy minimum vertex cover over the
// cut edges (METIS's sep-from-cut role), then sides re-derived.
void separator_from_cut(const WGraph& g, const vector<char>& part,
                        vector<char>& in_sep) {
  in_sep.assign(g.n, 0);
  // cut degree per vertex
  vector<int32_t> cdeg(g.n, 0);
  for (int32_t v = 0; v < g.n; ++v)
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p)
      if (part[v] != part[g.idx[p]]) cdeg[v]++;
  std::priority_queue<std::pair<int32_t, int32_t>> pq;
  for (int32_t v = 0; v < g.n; ++v)
    if (cdeg[v] > 0) pq.push({cdeg[v], v});
  while (!pq.empty()) {
    auto [d, v] = pq.top();
    pq.pop();
    if (in_sep[v] || d != cdeg[v]) continue;  // stale
    if (cdeg[v] <= 0) break;
    in_sep[v] = 1;
    for (int64_t p = g.ptr[v]; p < g.ptr[v + 1]; ++p) {
      int32_t u = g.idx[p];
      if (part[u] != part[v] && !in_sep[u] && cdeg[u] > 0) {
        cdeg[u]--;
        pq.push({cdeg[u], u});
      }
    }
    cdeg[v] = 0;
  }
}

// ---------------------------------------------------------------------------
// Nested dissection: multilevel bisection + greedy-cover vertex separator,
// separator ordered last, min-degree on small leaves.
// ---------------------------------------------------------------------------
void nd_recurse(const Adj& a, vector<int32_t>& nodes, int32_t leaf_size,
                vector<int32_t>& out, vector<int32_t>& local) {
  // `local` is a shared size-n workspace (all -1 between calls) — the
  // recursion tree has O(n/leaf) calls and per-call O(n) allocation+init
  // was a measurable share of ND time on small matrices
  const int32_t m = (int32_t)nodes.size();
  if (m == 0) return;
  if (m <= leaf_size) {
    // min-degree on the induced subgraph
    for (int32_t i = 0; i < m; ++i) local[nodes[i]] = i;
    vector<int32_t> src, dst;
    for (int32_t i = 0; i < m; ++i) {
      int32_t v = nodes[i];
      for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p) {
        int32_t u = a.idx[p];
        if (local[u] >= 0) { src.push_back(i); dst.push_back(local[u]); }
      }
    }
    for (int32_t i = 0; i < m; ++i) local[nodes[i]] = -1;
    Adj sub = build_adj(m, (int64_t)src.size(), src.data(), dst.data(), false);
    MDResult r = min_degree(sub, nullptr);
    for (int32_t i = 0; i < m; ++i) out.push_back(nodes[r.perm[i]]);
    return;
  }
  // multilevel edge bisection of the induced subgraph, then a vertex
  // separator from the cut (greedy min cover)
  WGraph sub = induced_wgraph(a, nodes, local);
  for (int32_t i = 0; i < m; ++i) local[nodes[i]] = -1;
  vector<char> part = multilevel_bisect(sub);
  vector<char> in_sep;
  separator_from_cut(sub, part, in_sep);
  vector<int32_t> left, right, sep;
  for (int32_t i = 0; i < m; ++i) {
    if (in_sep[i]) sep.push_back(nodes[i]);
    else if (part[i] == 0) left.push_back(nodes[i]);
    else right.push_back(nodes[i]);
  }
  if (left.empty() || right.empty()) {
    // bisection failed (clique-ish): fall back to min-degree on the part
    vector<int32_t>& all = nodes;
    for (size_t i = 0; i < all.size(); ++i) local[all[i]] = (int32_t)i;
    vector<int32_t> src, dst;
    for (size_t i = 0; i < all.size(); ++i) {
      int32_t v = all[i];
      for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p)
        if (local[a.idx[p]] >= 0) {
          src.push_back((int32_t)i);
          dst.push_back(local[a.idx[p]]);
        }
    }
    for (size_t i = 0; i < all.size(); ++i) local[all[i]] = -1;
    Adj sub = build_adj((int32_t)all.size(), (int64_t)src.size(), src.data(),
                        dst.data(), false);
    MDResult r = min_degree(sub, nullptr);
    for (size_t i = 0; i < all.size(); ++i) out.push_back(all[r.perm[i]]);
    return;
  }
  nd_recurse(a, left, leaf_size, out, local);
  nd_recurse(a, right, leaf_size, out, local);
  for (int32_t v : sep) out.push_back(v);  // separator eliminated last
}

// ---------------------------------------------------------------------------
// k-way partition via recursive multilevel bisection (METIS_PartGraph role;
// ClusterData / multi-host edge partition quality path)
// ---------------------------------------------------------------------------
void ml_partition_recurse(const Adj& a, vector<int32_t>& nodes, int32_t k0,
                          int32_t k, int32_t* part,
                          const int32_t* vwt = nullptr) {
  if (k <= 1 || (int32_t)nodes.size() <= 1) {
    for (int32_t v : nodes) part[v] = k0;
    return;
  }
  int32_t kl = k / 2, kr = k - kl;
  vector<int32_t> local(a.n, -1);
  WGraph sub = induced_wgraph(a, nodes, local, vwt);
  vector<char> side = multilevel_bisect(sub, (double)kl / (double)k);
  vector<int32_t> left, right;
  for (size_t i = 0; i < nodes.size(); ++i)
    (side[i] == 0 ? left : right).push_back(nodes[i]);
  if (left.empty() || right.empty()) {
    // degenerate cut: split by order to guarantee progress
    left.assign(nodes.begin(), nodes.begin() + nodes.size() / 2);
    right.assign(nodes.begin() + nodes.size() / 2, nodes.end());
  }
  ml_partition_recurse(a, left, k0, kl, part, vwt);
  ml_partition_recurse(a, right, k0 + kl, kr, part, vwt);
}

// ---------------------------------------------------------------------------
// BFS-grow balanced partitioner (ClusterData / multi-host edge partition)
// ---------------------------------------------------------------------------
void bfs_partition_impl(const Adj& a, int32_t parts, int32_t* part) {
  const int32_t n = a.n;
  const int64_t target = (n + parts - 1) / parts;
  std::fill(part, part + n, -1);
  std::queue<int32_t> q;
  int32_t cur = 0;
  int64_t count = 0;
  int32_t scan = 0;
  while (true) {
    if (q.empty()) {
      while (scan < n && part[scan] != -1) ++scan;
      if (scan == n) break;
      q.push(scan);
    }
    int32_t v = q.front();
    q.pop();
    if (part[v] != -1) continue;
    part[v] = cur;
    if (++count >= target && cur < parts - 1) {
      ++cur;
      count = 0;
      std::queue<int32_t>().swap(q);
      continue;
    }
    for (int64_t p = a.ptr[v]; p < a.ptr[v + 1]; ++p)
      if (part[a.idx[p]] == -1) q.push(a.idx[p]);
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

// orderings: method 0=min-degree(AMD role) 1=RCM 2=nested dissection
// (METIS/NESDIS role).  Edges are directed pairs; symmetrized internally.
// Returns 0 on success.
int stm_order(int32_t n, int64_t nnz, const int32_t* src, const int32_t* dst,
              int32_t method, int32_t* perm_out) {
  Adj a = build_adj(n, nnz, src, dst, true);
  if (method == 0) {
    MDResult r = min_degree(a, nullptr);
    std::memcpy(perm_out, r.perm.data(), sizeof(int32_t) * n);
  } else if (method == 1) {
    rcm_order_impl(a, perm_out);
  } else if (method == 2 || method == 3) {
    // 2: METIS_NodeND role (large leaves); 3: NESDIS role (deep dissection
    // with small MD leaves — the constrained-AMD flavour of the reference)
    vector<int32_t> nodes(n);
    std::iota(nodes.begin(), nodes.end(), 0);
    vector<int32_t> out;
    out.reserve(n);
    int32_t leaf = method == 2 ? std::max(64, n / 128) : std::max(16, n / 1024);
    vector<int32_t> local(n, -1);
    nd_recurse(a, nodes, leaf, out, local);
    std::memcpy(perm_out, out.data(), sizeof(int32_t) * n);
  } else {
    return 1;
  }
  return 0;
}

// symbolic Cholesky stats of P A P^T for a given elimination order
// (perm[k] = node eliminated at step k).  Outputs lnz (incl. diagonal) and
// a flop proxy.  This is the labeler's min-lnz metric
// (reference SparseChol_analyze.c:429-613 "Brute-force-fill").
int stm_symbolic_fill(int32_t n, int64_t nnz, const int32_t* src,
                      const int32_t* dst, const int32_t* perm,
                      int64_t* lnz_out, int64_t* flops_out) {
  Adj a = build_adj(n, nnz, src, dst, true);
  MDResult r = min_degree(a, perm);
  *lnz_out = r.lnz;
  *flops_out = r.flops;
  return 0;
}

// column ordering for QR: min-degree on the A^T A pattern (COLAMD role).
// rows/cols are the rectangular matrix's entries; dense rows (deg > dense_cut)
// are dropped from the pattern like COLAMD does.  perm_out has ncol entries.
int stm_col_order(int32_t nrow, int32_t ncol, int64_t nnz, const int32_t* row,
                  const int32_t* col, int32_t dense_cut, int32_t* perm_out) {
  // build row -> cols lists
  vector<int64_t> rdeg(nrow + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) rdeg[row[e] + 1]++;
  vector<int64_t> rptr(nrow + 1, 0);
  for (int32_t i = 0; i < nrow; ++i) rptr[i + 1] = rptr[i] + rdeg[i + 1];
  vector<int32_t> rcols(nnz);
  vector<int64_t> fill = rptr;
  for (int64_t e = 0; e < nnz; ++e) rcols[fill[row[e]]++] = col[e];
  if (dense_cut <= 0) dense_cut = std::max<int32_t>(16, (int32_t)(10 * std::max(1.0, std::sqrt((double)ncol))));
  // COLAMD-style: rows enter the quotient graph directly as cliques
  // (elements) — A^T A is never formed (the reference colamd.c's core idea;
  // this also differentiates the column ordering from plain MD on A^T A).
  vector<vector<int32_t>> row_elems;
  row_elems.reserve(nrow);
  for (int32_t i = 0; i < nrow; ++i) {
    int64_t b = rptr[i], e = rptr[i + 1];
    if (e - b > dense_cut || e - b < 1) continue;  // skip dense/empty rows
    vector<int32_t> clique(rcols.begin() + b, rcols.begin() + e);
    std::sort(clique.begin(), clique.end());
    clique.erase(std::unique(clique.begin(), clique.end()), clique.end());
    row_elems.push_back(std::move(clique));
  }
  Adj empty;
  empty.n = ncol;
  empty.ptr.assign(ncol + 1, 0);
  MDResult r = min_degree(empty, nullptr, &row_elems);
  std::memcpy(perm_out, r.perm.data(), sizeof(int32_t) * ncol);
  return 0;
}

int stm_bfs_partition(int32_t n, int64_t nnz, const int32_t* src,
                      const int32_t* dst, int32_t parts, int32_t* part_out) {
  Adj a = build_adj(n, nnz, src, dst, true);
  bfs_partition_impl(a, parts, part_out);
  return 0;
}

// k-way partition via recursive multilevel bisection (METIS_PartGraph role)
int stm_ml_partition(int32_t n, int64_t nnz, const int32_t* src,
                     const int32_t* dst, int32_t parts, int32_t* part_out) {
  Adj a = build_adj(n, nnz, src, dst, true);
  vector<int32_t> nodes(n);
  std::iota(nodes.begin(), nodes.end(), 0);
  ml_partition_recurse(a, nodes, 0, parts, part_out);
  return 0;
}

// weighted variant: vwt[v] (e.g. degree) balances per-side WEIGHT — the
// edge-balanced partition skew-degree graphs need (hub receivers make the
// node-balanced cut put almost all edges on one part)
int stm_ml_partition_w(int32_t n, int64_t nnz, const int32_t* src,
                       const int32_t* dst, const int32_t* vwt,
                       int32_t parts, int32_t* part_out) {
  Adj a = build_adj(n, nnz, src, dst, true);
  vector<int32_t> nodes(n);
  std::iota(nodes.begin(), nodes.end(), 0);
  ml_partition_recurse(a, nodes, 0, parts, part_out, vwt);
  return 0;
}


// Fast solver-path ordering: supervariable AMD with aggressive absorption
// and dense-variable postponement (the reference amd.c's speed tricks; the
// exact-order min_degree above stays as the labeler's mode).
// dense_cut <= 0 picks the default 10*sqrt(n) threshold.
int stm_order_fast(int32_t n, int64_t nnz, const int32_t* src,
                   const int32_t* dst, int32_t dense_cut, int32_t* perm_out,
                   int64_t* lnz_est) {
  Adj a = build_adj(n, nnz, src, dst, true);
  MDResult r = amd_fast(a, nullptr, dense_cut > 0 ? dense_cut : -1);
  if ((int32_t)r.perm.size() != n) return 2;
  std::memcpy(perm_out, r.perm.data(), sizeof(int32_t) * n);
  if (lnz_est) *lnz_est = r.lnz;
  return 0;
}

// Fast COLAMD-role column ordering: rows enter as cliques, supervariable
// merging + absorption on the columns.  dense_cut applies to both rows
// (clique size) and columns (quotient-graph degree).
int stm_col_order_fast(int32_t nrow, int32_t ncol, int64_t nnz,
                       const int32_t* row, const int32_t* col,
                       int32_t dense_cut, int32_t* perm_out,
                       int64_t* lnz_est) {
  vector<int64_t> rdeg(nrow + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) rdeg[row[e] + 1]++;
  vector<int64_t> rptr(nrow + 1, 0);
  for (int32_t i = 0; i < nrow; ++i) rptr[i + 1] = rptr[i] + rdeg[i + 1];
  vector<int32_t> rcols(nnz);
  vector<int64_t> fill = rptr;
  for (int64_t e = 0; e < nnz; ++e) rcols[fill[row[e]]++] = col[e];
  int32_t row_cut = dense_cut > 0
      ? dense_cut
      : std::max<int32_t>(
            16, (int32_t)(10 * std::sqrt((double)std::max(ncol, 1))));
  vector<vector<int32_t>> row_elems;
  row_elems.reserve(nrow);
  for (int32_t i = 0; i < nrow; ++i) {
    int64_t b = rptr[i], e = rptr[i + 1];
    if (e - b > row_cut || e - b < 2) continue;
    vector<int32_t> clique(rcols.begin() + b, rcols.begin() + e);
    std::sort(clique.begin(), clique.end());
    clique.erase(std::unique(clique.begin(), clique.end()), clique.end());
    row_elems.push_back(std::move(clique));
  }
  Adj empty;
  empty.n = ncol;
  empty.ptr.assign(ncol + 1, 0);
  MDResult r = amd_fast(empty, &row_elems, dense_cut > 0 ? dense_cut : -1);
  if ((int32_t)r.perm.size() != ncol) return 2;
  std::memcpy(perm_out, r.perm.data(), sizeof(int32_t) * ncol);
  if (lnz_est) *lnz_est = r.lnz;
  return 0;
}

// AᵀA clique-graph construction (the hot host-side step feeding the
// AMD/ND orderings): every row of A makes a clique over its columns.
// Rows wider than row_cut (<=0: the labeler's max(16, 10*sqrt(ncol)))
// are skipped, matching the Python `_ata_graph`.  Output is the deduped
// symmetric edge list, malloc'd; caller frees via stm_free.
int stm_ata_graph(int32_t nrow, int32_t ncol, int64_t nnz,
                  const int32_t* row, const int32_t* col, int32_t row_cut,
                  int64_t* out_nnz, int32_t** out_s, int32_t** out_d) {
  vector<int64_t> rptr(nrow + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) rptr[row[e] + 1]++;
  for (int32_t i = 0; i < nrow; ++i) rptr[i + 1] += rptr[i];
  vector<int32_t> rcols(nnz);
  {
    vector<int64_t> fill(rptr.begin(), rptr.end() - 1);
    for (int64_t e = 0; e < nnz; ++e) rcols[fill[row[e]]++] = col[e];
  }
  int32_t cap = row_cut > 0
      ? row_cut
      : std::max<int32_t>(
            16, (int32_t)(10 * std::sqrt((double)std::max(ncol, 1))));
  // sort+dedup each kept row in place; record kept spans
  vector<std::pair<int64_t, int64_t>> spans;
  spans.reserve(nrow);
  vector<int64_t> ccnt(ncol + 1, 0);
  for (int32_t i = 0; i < nrow; ++i) {
    int64_t b = rptr[i], e = rptr[i + 1];
    if (e - b < 2 || e - b > cap) continue;
    std::sort(rcols.begin() + b, rcols.begin() + e);
    int64_t ue = std::unique(rcols.begin() + b, rcols.begin() + e) -
                 rcols.begin();
    if (ue - b < 2) continue;
    spans.emplace_back(b, ue);
    for (int64_t p = b; p < ue; ++p) ccnt[rcols[p] + 1] += (ue - b) - 1;
  }
  vector<int64_t> cptr(ncol + 1, 0);
  for (int32_t j = 0; j < ncol; ++j) cptr[j + 1] = cptr[j] + ccnt[j + 1];
  vector<int32_t> cadj(cptr[ncol]);
  {
    vector<int64_t> fill(cptr.begin(), cptr.end() - 1);
    for (auto& sp : spans) {
      for (int64_t p = sp.first; p < sp.second; ++p) {
        int32_t cj = rcols[p];
        int64_t& f = fill[cj];
        for (int64_t q = sp.first; q < sp.second; ++q)
          if (q != p) cadj[f++] = rcols[q];
      }
    }
  }
  // dedup per column and count final edges
  int64_t total = 0;
  vector<int64_t> uend(ncol);
  for (int32_t j = 0; j < ncol; ++j) {
    auto b = cadj.begin() + cptr[j], e = cadj.begin() + cptr[j + 1];
    std::sort(b, e);
    uend[j] = std::unique(b, e) - cadj.begin();
    total += uend[j] - cptr[j];
  }
  int32_t* s = (int32_t*)malloc(sizeof(int32_t) * std::max<int64_t>(total, 1));
  int32_t* d = (int32_t*)malloc(sizeof(int32_t) * std::max<int64_t>(total, 1));
  if (!s || !d) {
    free(s);
    free(d);
    return 3;
  }
  int64_t w = 0;
  for (int32_t j = 0; j < ncol; ++j)
    for (int64_t p = cptr[j]; p < uend[j]; ++p, ++w) {
      s[w] = j;
      d[w] = cadj[p];
    }
  *out_nnz = total;
  *out_s = s;
  *out_d = d;
  return 0;
}

}  // extern "C"
