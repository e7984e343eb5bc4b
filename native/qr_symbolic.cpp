// Symbolic multifrontal-QR analysis, native implementation.
//
// Role equivalent of the reference's C analysis layer (qr_analyze /
// SparseChol_super_symbolic, STMMQR/src/qr/SparseQR_analyze.c and
// src/chol/SparseChol_super_symbolic.c): column elimination tree of A'A,
// postorder, per-column R row patterns, fundamental supernodes with relaxed
// amalgamation.  Written from scratch against the published algorithms
// (Gilbert/Ng/Peyton row-subtree etree; frontal pattern-union rule); the
// Python implementation in sparseqr/symbolic.py is the semantic oracle and
// this must produce identical fronts (tested).
//
// C ABI for ctypes.  Variable-size outputs are malloc'd here and released
// by the caller through stm_free().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// etree of S'S without forming S'S: climb with path compression.
void col_etree_ata(int32_t m, int32_t n, const int64_t* Cp, const int32_t* Ci,
                   int32_t* parent) {
  std::vector<int32_t> ancestor(n, -1), prev_col(m, -1);
  for (int32_t k = 0; k < n; ++k) {
    parent[k] = -1;
    for (int64_t p = Cp[k]; p < Cp[k + 1]; ++p) {
      int32_t i = prev_col[Ci[p]];
      while (i != -1 && i < k) {
        int32_t nxt = ancestor[i];
        ancestor[i] = k;
        if (nxt == -1) parent[i] = k;
        i = nxt;
      }
      prev_col[Ci[p]] = k;
    }
  }
}

// iterative postorder, children visited in ascending order.
void postorder(int32_t n, const int32_t* parent, int32_t* post) {
  std::vector<int32_t> head(n, -1), next(n, -1), stack;
  for (int32_t j = n - 1; j >= 0; --j) {
    if (parent[j] != -1) {
      next[j] = head[parent[j]];
      head[parent[j]] = j;
    }
  }
  int32_t k = 0;
  for (int32_t root = 0; root < n; ++root) {
    if (parent[root] != -1) continue;
    stack.push_back(root);
    while (!stack.empty()) {
      int32_t j = stack.back();
      int32_t c = head[j];
      if (c == -1) {
        post[k++] = j;
        stack.pop_back();
      } else {
        head[j] = next[c];
        stack.push_back(c);
      }
    }
  }
}

}  // namespace

extern "C" {

void stm_free(void* p) { free(p); }

// Column etree of S'S (S given CSC: Cp (n+1) int64, Ci row ids) + postorder.
int stm_col_etree_post(int32_t m, int32_t n, const int64_t* Cp,
                       const int32_t* Ci, int32_t* parent, int32_t* post) {
  if (n < 0 || m < 0) return 1;
  col_etree_ata(m, n, Cp, Ci, parent);
  postorder(n, parent, post);
  return 0;
}

// Column counts of R (= the Cholesky factor of S'S) for POSTORDERED S —
// the Gilbert–Ng–Peyton skeleton/leaf-counting algorithm in its A'A form
// (each S row is a clique whose row subtree is counted by its leaves; LCA
// overlap removal via a path-halving union-find).  O(nnz · α).  This is
// the cheap per-ordering fill/flop metric the brute-force selection uses
// (the reference computes per-method lnz the same one-pass way inside
// SparseChol_analyze_p2, SparseChol_analyze.c:429-613, instead of running
// the full supernodal analysis per candidate).
//
// Inputs: CSC of S (Sp (n+1) int64, Si row ids), postordered etree parent
// (labels ARE the postorder: parent[j] > j).  Output counts[j] = |C_j|.
int stm_qr_col_counts(int32_t m, int32_t n, const int64_t* Sp,
                      const int32_t* Si, const int32_t* parent,
                      int64_t* counts) {
  if (m < 0 || n < 0) return 1;
  std::vector<int32_t> first(n, -1);
  std::vector<int64_t> delta(n, 0);
  for (int32_t j = 0; j < n; ++j) {
    if (first[j] == -1) {
      delta[j] = 1;  // etree leaf: its own pivot starts a new path
      for (int32_t q = j; q != -1 && first[q] == -1; q = parent[q])
        first[q] = j;
    }
  }
  // rows of S grouped by leftmost column (each clique processed once,
  // at its leftmost pivot); build from CSC by ascending-column sweep
  std::vector<int32_t> leftmost(m, -1), rhead(n, -1), rnext(m, -1);
  for (int32_t j = 0; j < n; ++j)
    for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p)
      if (leftmost[Si[p]] == -1) leftmost[Si[p]] = j;
  for (int32_t r = m - 1; r >= 0; --r)
    if (leftmost[r] != -1) {
      rnext[r] = rhead[leftmost[r]];
      rhead[leftmost[r]] = r;
    }
  // CSR offsets of S (row entry lists for the clique sweep)
  std::vector<int64_t> Rp(m + 1, 0);
  for (int32_t j = 0; j < n; ++j)
    for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p) Rp[Si[p] + 1]++;
  for (int32_t r = 0; r < m; ++r) Rp[r + 1] += Rp[r];
  std::vector<int32_t> Rj(Rp[m]);
  {
    std::vector<int64_t> w(Rp.begin(), Rp.end() - 1);
    for (int32_t j = 0; j < n; ++j)
      for (int64_t p = Sp[j]; p < Sp[j + 1]; ++p) Rj[w[Si[p]]++] = j;
  }
  // union-find over columns with path halving
  std::vector<int32_t> anc(n);
  for (int32_t j = 0; j < n; ++j) anc[j] = j;
  auto find = [&](int32_t x) {
    while (anc[x] != x) {
      anc[x] = anc[anc[x]];
      x = anc[x];
    }
    return x;
  };
  std::vector<int32_t> maxfirst(n, -1), prevleaf(n, -1);
  for (int32_t j = 0; j < n; ++j) {
    if (parent[j] != -1) delta[parent[j]] -= 1;  // pivot j stops at parent
    for (int32_t r = rhead[j]; r != -1; r = rnext[r]) {
      for (int64_t p = Rp[r]; p < Rp[r + 1]; ++p) {
        int32_t i = Rj[p];           // subtree owner: the OTHER column
        if (i <= j) continue;        // strict lower part of S'S only
        if (first[j] > maxfirst[i]) {  // j is a new leaf of T_i
          maxfirst[i] = first[j];
          delta[j] += 1;
          if (prevleaf[i] != -1) delta[find(prevleaf[i])] -= 1;
          prevleaf[i] = j;
        }
      }
    }
    if (parent[j] != -1) anc[j] = parent[j];
  }
  for (int32_t j = 0; j < n; ++j) counts[j] = delta[j];
  for (int32_t j = 0; j < n; ++j)
    if (parent[j] != -1) counts[parent[j]] += counts[j];
  return 0;
}

// Supernodal front construction on the POSTORDERED S.
//
// Inputs: CSR of S (Rp (m+1) int64, Rj col ids, postordered labels),
// postordered etree `parent`, amalgamation knobs nrelax/zrelax (the
// reference's Relaxfactor role).
//
// Outputs (malloc'd): per-front pivot ranges [piv_lo[f], piv_hi[f]),
// column patterns (cols_flat with cols_ptr offsets, sorted, first npiv
// entries = pivots), and S-row lists (srows_flat/srows_ptr, rows grouped
// by leftmost pivot in front order).
int stm_qr_fronts(int32_t m, int32_t n, const int64_t* Rp, const int32_t* Rj,
                  const int32_t* parent, int32_t nrelax, double zrelax,
                  int32_t* n_fronts_out, int32_t** piv_lo_out,
                  int32_t** piv_hi_out, int32_t** cols_flat_out,
                  int64_t** cols_ptr_out, int32_t** srows_flat_out,
                  int64_t** srows_ptr_out) {
  // ---- rows grouped by leftmost column (counting sort) -------------------
  std::vector<int32_t> leftmost(m, -1);
  std::vector<int64_t> row_cnt(n + 1, 0);
  for (int32_t i = 0; i < m; ++i) {
    if (Rp[i] < Rp[i + 1]) {
      int32_t lm = Rj[Rp[i]];
      for (int64_t p = Rp[i]; p < Rp[i + 1]; ++p) lm = std::min(lm, Rj[p]);
      leftmost[i] = lm;
      ++row_cnt[lm + 1];
    }
  }
  for (int32_t j = 0; j < n; ++j) row_cnt[j + 1] += row_cnt[j];
  std::vector<int32_t> rows_by_left(row_cnt[n]);
  {
    std::vector<int64_t> pos(row_cnt.begin(), row_cnt.end() - 1);
    for (int32_t i = 0; i < m; ++i)
      if (leftmost[i] >= 0) rows_by_left[pos[leftmost[i]]++] = i;
  }

  // ---- children lists ----------------------------------------------------
  std::vector<int32_t> chead(n, -1), cnext(n, -1);
  for (int32_t j = n - 1; j >= 0; --j) {
    if (parent[j] != -1) {
      cnext[j] = chead[parent[j]];
      chead[parent[j]] = j;
    }
  }

  // ---- per-column patterns via the frontal union rule --------------------
  // C_j = {j} ∪ cols(rows with leftmost j) ∪ (∪_children C_c \ {c}),
  // collected with an epoch-marker array.  Patterns are kept UNSORTED with
  // the invariant pat[j][0] == j (the pivot); a child's pattern is consumed
  // exactly once (by its etree parent) and freed immediately, and a
  // fundamental chain telescopes — C_{j+1} = C_j \ {j} when
  // |C_{j+1}| = |C_j| − 1 and parent[j] = j+1 — so a supernode's pattern is
  // its LAST column's pattern plus the earlier pivots, with no per-column
  // sort and no chain-union pass (only live fronts are sorted at emission;
  // output is bit-identical to the sorted-per-column formulation).
  std::vector<std::vector<int32_t>> pat(n);
  std::vector<int32_t> mark(n, -1);
  std::vector<int64_t> col_pat_size(n, 0);
  std::vector<int32_t> sn_first, sn_last;
  std::vector<std::vector<int32_t>> spat;
  std::vector<int64_t> sn_nzreal;
  auto close_sn = [&](int32_t last) {
    // supernode pattern = {first..last-1} ++ pat[last] (pat[last][0]==last)
    int32_t first = sn_first.back();
    sn_last.push_back(last);
    std::vector<int32_t> out;
    out.reserve((last - first) + pat[last].size());
    for (int32_t j = first; j < last; ++j) out.push_back(j);
    out.insert(out.end(), pat[last].begin(), pat[last].end());
    spat.push_back(std::move(out));
    // member sizes telescope from the last column's size
    int64_t s_last = col_pat_size[last];
    int64_t len = last - first + 1;
    sn_nzreal.push_back(len * s_last + len * (len - 1) / 2);
  };
  std::vector<int32_t> sn_of(n);
  for (int32_t j = 0; j < n; ++j) {
    std::vector<int32_t>& out = pat[j];
    out.push_back(j);
    mark[j] = j;
    for (int64_t q = row_cnt[j]; q < row_cnt[j + 1]; ++q) {
      int32_t i = rows_by_left[q];
      for (int64_t p = Rp[i]; p < Rp[i + 1]; ++p) {
        int32_t c = Rj[p];
        if (mark[c] != j) {
          mark[c] = j;
          out.push_back(c);
        }
      }
    }
    for (int32_t c = chead[j]; c != -1; c = cnext[c]) {
      const std::vector<int32_t>& pc = pat[c];
      for (size_t t = 1; t < pc.size(); ++t) {  // entry 0 is the pivot c
        if (mark[pc[t]] != j) {
          mark[pc[t]] = j;
          out.push_back(pc[t]);
        }
      }
    }
    col_pat_size[j] = static_cast<int64_t>(out.size());
    if (j > 0 && parent[j - 1] == j &&
        col_pat_size[j] == col_pat_size[j - 1] - 1) {
      sn_of[j] = sn_of[j - 1];  // chain continues; j−1 was interior
    } else {
      if (j > 0) close_sn(j - 1);
      sn_of[j] = static_cast<int32_t>(sn_first.size());
      sn_first.push_back(j);
    }
    // children consumed; their patterns are no longer needed (the closing
    // supernode above copied what it needed from pat[j−1])
    for (int32_t c = chead[j]; c != -1; c = cnext[c]) {
      std::vector<int32_t>().swap(pat[c]);
    }
  }
  if (n > 0) close_sn(n - 1);
  int32_t nsn = static_cast<int32_t>(sn_first.size());
  std::vector<int32_t> sn_parent(nsn, -1);
  for (int32_t k = 0; k < nsn; ++k) {
    int32_t p = parent[sn_last[k]];
    if (p != -1) sn_parent[k] = sn_of[p];
  }

  // ---- relaxed amalgamation (bottom-up, contiguity-preserving) ------------
  std::vector<int32_t> merged_into(nsn, -1);
  std::vector<int32_t> lo(sn_first), hi(nsn);  // pivot range per live sn
  for (int32_t k = 0; k < nsn; ++k) hi[k] = sn_last[k] + 1;

  auto find_live = [&](int32_t k) {
    while (merged_into[k] != -1) k = merged_into[k];
    return k;
  };
  int32_t epoch_ctr = 2 * n + nsn;
  for (int32_t k = nsn - 1; k >= 0; --k) {
    int32_t p = sn_parent[k];
    if (p == -1) continue;
    p = find_live(p);
    if (lo[p] != hi[k]) continue;  // pivots must stay contiguous
    // merged pattern via marker union
    std::vector<int32_t> merged;
    int32_t epoch = epoch_ctr++;
    for (int32_t c : spat[k])
      if (mark[c] != epoch) { mark[c] = epoch; merged.push_back(c); }
    for (int32_t c : spat[p])
      if (mark[c] != epoch) { mark[c] = epoch; merged.push_back(c); }
    int64_t npiv_new = (hi[k] - lo[k]) + (hi[p] - lo[p]);
    int64_t width = static_cast<int64_t>(merged.size());
    int64_t nz_merged = 0;
    for (int64_t t = 0; t < npiv_new; ++t) nz_merged += width - t;
    int64_t nz_real = sn_nzreal[k] + sn_nzreal[p];
    double zeros_frac =
        1.0 - static_cast<double>(nz_real) /
                  static_cast<double>(std::max<int64_t>(nz_merged, 1));
    if ((hi[k] - lo[k]) <= nrelax || zeros_frac <= zrelax) {
      spat[p] = std::move(merged);  // unsorted; live fronts sort at emission
      sn_nzreal[p] = nz_real;
      lo[p] = lo[k];
      merged_into[k] = p;
    }
  }

  // ---- emit live fronts ----------------------------------------------------
  std::vector<int32_t> live;
  for (int32_t k = 0; k < nsn; ++k)
    if (merged_into[k] == -1) live.push_back(k);
  int32_t nf = static_cast<int32_t>(live.size());

  int32_t* piv_lo = static_cast<int32_t*>(malloc(sizeof(int32_t) * nf));
  int32_t* piv_hi = static_cast<int32_t*>(malloc(sizeof(int32_t) * nf));
  int64_t* cols_ptr = static_cast<int64_t*>(malloc(sizeof(int64_t) * (nf + 1)));
  int64_t* srows_ptr =
      static_cast<int64_t*>(malloc(sizeof(int64_t) * (nf + 1)));
  int64_t cols_total = 0, srows_total = 0;
  for (int32_t t = 0; t < nf; ++t) {
    int32_t k = live[t];
    std::sort(spat[k].begin(), spat[k].end());
    cols_total += static_cast<int64_t>(spat[k].size());
    srows_total += row_cnt[hi[k]] - row_cnt[lo[k]];
  }
  int32_t* cols_flat =
      static_cast<int32_t*>(malloc(sizeof(int32_t) * std::max<int64_t>(cols_total, 1)));
  int32_t* srows_flat = static_cast<int32_t*>(
      malloc(sizeof(int32_t) * std::max<int64_t>(srows_total, 1)));
  if (!piv_lo || !piv_hi || !cols_ptr || !srows_ptr || !cols_flat ||
      !srows_flat)
    return 2;
  int64_t cpos = 0, spos = 0;
  for (int32_t t = 0; t < nf; ++t) {
    int32_t k = live[t];
    piv_lo[t] = lo[k];
    piv_hi[t] = hi[k];
    cols_ptr[t] = cpos;
    std::memcpy(cols_flat + cpos, spat[k].data(),
                sizeof(int32_t) * spat[k].size());
    cpos += static_cast<int64_t>(spat[k].size());
    srows_ptr[t] = spos;
    for (int64_t q = row_cnt[lo[k]]; q < row_cnt[hi[k]]; ++q)
      srows_flat[spos++] = rows_by_left[q];
  }
  cols_ptr[nf] = cpos;
  srows_ptr[nf] = spos;

  *n_fronts_out = nf;
  *piv_lo_out = piv_lo;
  *piv_hi_out = piv_hi;
  *cols_flat_out = cols_flat;
  *cols_ptr_out = cols_ptr;
  *srows_flat_out = srows_flat;
  *srows_ptr_out = srows_ptr;
  return 0;
}

}  // extern "C"
