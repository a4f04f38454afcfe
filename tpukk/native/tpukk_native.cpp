// tpukk native host runtime — C++ implementations of the loop-bound
// plan-construction (symbolic) phases that back the Python API:
//   * distance-1 greedy coloring      (graph/coloring.py SERIAL algorithm;
//     role of GraphColor base, graph/impl/KokkosGraph_Distance1Color_impl.hpp:40)
//   * ILU(k) level-of-fill symbolic   (sparse/spiluk.py; role of
//     sparse/impl/KokkosSparse_spiluk_symbolic_impl.hpp:37-88)
//   * ILU numeric on a fixed pattern  (sparse/spiluk.py; role of
//     _spiluk_numeric_impl.hpp)
//   * CSR transpose                   (containers/sort_crs.py; role of
//     KokkosSparse_Utils.hpp:338-392)
// The TPU compute path stays in XLA/Pallas; this library is the host-side
// "runtime around it" (plan builders are latency-critical at setup time).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtpukk_native.so tpukk_native.cpp
// ABI: plain C, int32 indices, int64 sizes, double values.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <queue>
#include <tuple>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// Distance-1 greedy coloring. colors are 1-based; returns max color used.
int32_t tpukk_d1_greedy_color(int64_t n, const int32_t* row_map,
                              const int32_t* entries, int32_t* colors) {
  std::vector<int32_t> mark(n + 2, -1);
  int32_t max_color = 0;
  for (int64_t v = 0; v < n; ++v) {
    for (int32_t e = row_map[v]; e < row_map[v + 1]; ++e) {
      int32_t u = entries[e];
      if (u == v) continue;
      int32_t cu = colors[u];
      if (cu > 0) mark[cu] = (int32_t)v;
    }
    int32_t c = 1;
    while (mark[c] == (int32_t)v) ++c;
    colors[v] = c;
    if (c > max_color) max_color = c;
  }
  return max_color;
}

// ---------------------------------------------------------------------------
// ILU(k) level-of-fill symbolic.
// Two-phase ABI: call with out_indices == nullptr to get the required nnz;
// call again with buffers to fill.  out_indptr has n+1 entries always.
int64_t tpukk_iluk_symbolic(int64_t n, int32_t fill_k,
                            const int32_t* a_indptr, const int32_t* a_indices,
                            int32_t* out_indptr, int32_t* out_indices) {
  // per-row sorted (col, level); rows kept for later rows' updates
  std::vector<std::vector<std::pair<int32_t, int32_t>>> rows(n);
  int64_t total = 0;
  // stamped workspace: level[c] valid only when stamp[c] == current row
  std::vector<int32_t> level(n, INT32_MAX);
  std::vector<int64_t> stamp(n, -1);
  auto get = [&](int64_t i, int32_t c) {
    return stamp[c] == i ? level[c] : INT32_MAX;
  };
  for (int64_t i = 0; i < n; ++i) {
    std::vector<int32_t> work;
    work.reserve(64);
    for (int32_t e = a_indptr[i]; e < a_indptr[i + 1]; ++e) {
      int32_t c = a_indices[e];
      if (get(i, c) == INT32_MAX) work.push_back(c);
      level[c] = 0; stamp[c] = i;
    }
    if (get(i, (int32_t)i) == INT32_MAX) { work.push_back((int32_t)i); }
    level[i] = 0; stamp[i] = i;
    std::sort(work.begin(), work.end());
    // IKJ merge: traverse work in ascending order; may grow
    for (size_t wi = 0; wi < work.size(); ++wi) {
      int32_t kk = work[wi];
      if (kk >= (int32_t)i) break;
      int32_t lik = get(i, kk);
      if (lik > fill_k) continue;
      const auto& rk = rows[kk];
      for (const auto& [jj, lkj] : rk) {
        if (jj <= kk) continue;
        int32_t f = lik + lkj + 1;
        if (f <= fill_k && f < get(i, jj)) {
          if (get(i, jj) == INT32_MAX) {
            // insert keeping work sorted beyond current position
            auto it = std::lower_bound(work.begin() + wi + 1, work.end(), jj);
            work.insert(it, jj);
          }
          level[jj] = f; stamp[jj] = i;
        }
      }
    }
    auto& out = rows[i];
    out.reserve(work.size());
    for (int32_t c : work) out.emplace_back(c, get(i, c));
    if (out_indices) {
      out_indptr[i] = (int32_t)total;
      for (size_t j = 0; j < out.size(); ++j)
        out_indices[total + j] = out[j].first;
    }
    total += (int64_t)out.size();
  }
  if (out_indices) out_indptr[n] = (int32_t)total;
  return total;
}

// ---------------------------------------------------------------------------
// ILU numeric (IKJ, pattern-restricted).  pattern rows must be sorted and
// include the diagonal.  Writes LU packed values aligned with the pattern.
int32_t tpukk_ilu_numeric(int64_t n,
                          const int32_t* p_indptr, const int32_t* p_indices,
                          const int32_t* a_indptr, const int32_t* a_indices,
                          const double* a_values, double* lu_values) {
  // stamped value workspace: w[c] valid only when wstamp[c] == current row
  // (touched positions can lie outside row i's pattern; stamping makes
  // discarded fill vanish without O(n) clears)
  std::vector<double> w(n, 0.0);
  std::vector<int64_t> wstamp(n, -1);
  std::vector<int64_t> diag_pos(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    auto wget = [&](int32_t c) { return wstamp[c] == i ? w[c] : 0.0; };
    auto wset = [&](int32_t c, double v) { w[c] = v; wstamp[c] = i; };
    int32_t s = p_indptr[i], e = p_indptr[i + 1];
    for (int32_t ea = a_indptr[i]; ea < a_indptr[i + 1]; ++ea)
      wset(a_indices[ea], a_values[ea]);
    for (int32_t idx = s; idx < e; ++idx) {
      int32_t kk = p_indices[idx];
      if (kk >= (int32_t)i) break;
      int64_t dp = diag_pos[kk];
      if (dp < 0) return -1;  // missing diagonal
      double ukk = lu_values[dp];
      if (ukk == 0.0) return -2;  // zero pivot
      double lik = wget(kk) / ukk;
      wset(kk, lik);
      // update with row kk's U part
      for (int32_t kidx = (int32_t)dp + 1; kidx < p_indptr[kk + 1]; ++kidx) {
        int32_t c = p_indices[kidx];
        wset(c, wget(c) - lik * lu_values[kidx]);
      }
    }
    for (int32_t idx = s; idx < e; ++idx) {
      int32_t c = p_indices[idx];
      lu_values[idx] = wget(c);
      if (c == (int32_t)i) diag_pos[i] = idx;
    }
    if (diag_pos[i] < 0) return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// CSR transpose (role of KokkosSparse_Utils transpose_matrix).
void tpukk_csr_transpose(int64_t nrows, int64_t ncols,
                         const int32_t* indptr, const int32_t* indices,
                         const double* values,
                         int32_t* t_indptr, int32_t* t_indices, double* t_values) {
  int64_t nnz = indptr[nrows];
  std::vector<int32_t> count(ncols + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) count[indices[e] + 1]++;
  for (int64_t c = 0; c < ncols; ++c) count[c + 1] += count[c];
  std::memcpy(t_indptr, count.data(), (ncols + 1) * sizeof(int32_t));
  std::vector<int32_t> cur(count.begin(), count.end() - 1);
  for (int64_t r = 0; r < nrows; ++r) {
    for (int32_t e = indptr[r]; e < indptr[r + 1]; ++e) {
      int32_t c = indices[e];
      int32_t dst = cur[c]++;
      t_indices[dst] = (int32_t)r;
      t_values[dst] = values[e];
    }
  }
}

// ---------------------------------------------------------------------------
// MDF (minimum discarded fill) greedy elimination order (sparse/mdf.py;
// role of sparse/impl/KokkosSparse_mdf_impl.hpp).  Pattern-restricted
// incomplete elimination: scores cached in a lazy-invalidation min-heap,
// recomputed only for the eliminated vertex's live row/column neighbors.
// Matches the Python implementation's order exactly (same (score, stamp,
// vertex) tie-breaking).
void tpukk_mdf_order(int64_t n, const int32_t* rm, const int32_t* ci,
                     const double* vals_in, int32_t* order_out) {
  const int64_t nnz = rm[n];
  std::vector<double> vals(vals_in, vals_in + nnz);
  // CSC pattern
  std::vector<int64_t> cc(n + 1, 0);
  std::vector<int32_t> ri(nnz);
  for (int64_t p = 0; p < nnz; ++p) cc[ci[p] + 1]++;
  for (int64_t j = 0; j < n; ++j) cc[j + 1] += cc[j];
  {
    std::vector<int64_t> w(cc.begin(), cc.end() - 1);
    for (int64_t i = 0; i < n; ++i)
      for (int32_t p = rm[i]; p < rm[i + 1]; ++p) ri[w[ci[p]]++] = (int32_t)i;
  }
  auto pos = [&](int32_t i, int32_t j) -> int64_t {
    const int32_t* b = ci + rm[i];
    const int32_t* e = ci + rm[i + 1];
    const int32_t* it = std::lower_bound(b, e, j);
    return (it != e && *it == j) ? (int64_t)(it - ci) : -1;
  };
  std::vector<int64_t> diag(n);
  for (int64_t i = 0; i < n; ++i) diag[i] = pos((int32_t)i, (int32_t)i);
  std::vector<char> alive(n, 1);
  std::vector<int64_t> stamp(n, 0);
  std::vector<int32_t> R, C;
  std::vector<double> rv;
  auto gather = [&](int32_t v) {
    R.clear(); C.clear(); rv.clear();
    for (int64_t p = cc[v]; p < cc[v + 1]; ++p) {
      int32_t r = ri[p];
      if (alive[r] && r != v) R.push_back(r);
    }
    for (int32_t p = rm[v]; p < rm[v + 1]; ++p) {
      int32_t c = ci[p];
      if (alive[c] && c != v) { C.push_back(c); rv.push_back(vals[p]); }
    }
  };
  auto score = [&](int32_t v) -> double {
    int64_t dp = diag[v];
    double piv = dp >= 0 ? vals[dp] : 0.0;
    if (piv == 0.0) return std::numeric_limits<double>::infinity();
    gather(v);
    if (R.empty() || C.empty()) return 0.0;
    double s = 0.0;
    for (int32_t r : R) {
      double cv = vals[pos(r, v)];
      for (size_t t = 0; t < C.size(); ++t) {
        if (pos(r, C[t]) < 0) {
          double u = cv * rv[t] / piv;
          s += u * u;
        }
      }
    }
    return s;
  };
  using Item = std::tuple<double, int64_t, int32_t>;
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> heap;
  for (int64_t v = 0; v < n; ++v) heap.emplace(score((int32_t)v), 0, (int32_t)v);
  std::vector<int32_t> Rv, Cv;
  std::vector<double> rvv;
  std::vector<char> bumped(n, 0);
  for (int64_t step = 0; step < n; ++step) {
    int32_t v = -1;
    while (!heap.empty()) {
      Item it = heap.top();
      heap.pop();
      int32_t u = std::get<2>(it);
      if (alive[u] && std::get<1>(it) == stamp[u]) { v = u; break; }
    }
    if (v < 0)
      for (int64_t u = 0; u < n; ++u)
        if (alive[u]) { v = (int32_t)u; break; }
    order_out[step] = v;
    int64_t dp = diag[v];
    double piv = (dp >= 0 && vals[dp] != 0.0) ? vals[dp] : 1.0;
    gather(v);
    Rv = R; Cv = C; rvv = rv;
    for (int32_t r : Rv) {
      double cv = vals[pos(r, v)];
      for (size_t t = 0; t < Cv.size(); ++t) {
        int64_t pc = pos(r, Cv[t]);
        if (pc >= 0) vals[pc] -= cv * rvv[t] / piv;
      }
    }
    alive[v] = 0;
    for (int32_t u : Rv) {
      if (alive[u] && !bumped[u]) {
        bumped[u] = 1;
        stamp[u]++;
        heap.emplace(score(u), stamp[u], u);
      }
    }
    for (int32_t u : Cv) {
      if (alive[u] && !bumped[u]) {
        bumped[u] = 1;
        stamp[u]++;
        heap.emplace(score(u), stamp[u], u);
      }
    }
    for (int32_t u : Rv) bumped[u] = 0;
    for (int32_t u : Cv) bumped[u] = 0;
  }
}

// ---------------------------------------------------------------------------
// SpGEMM host symbolic (sparse/spgemm.py::_symbolic_host; role of the
// reference's StructureC hashmap symbolic, KokkosSparse_spgemm_impl_symbolic
// .hpp:528-577).  Classic SMMP dense-marker pattern pass + a pair-plan
// emission pass producing (a_idx, b_idx, c_idx) sorted by c_idx (per-row
// counting sort).  Output order matches the numpy implementation exactly.
int64_t tpukk_spgemm_symbolic_count(int64_t n, const int32_t* rmA,
                                    const int32_t* ciA, int64_t bcols,
                                    const int32_t* rmB, const int32_t* ciB,
                                    int32_t* row_map_c) {
  std::vector<int64_t> marker(bcols, -1);
  int64_t nnz_c = 0;
  row_map_c[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t cnt = 0;
    for (int32_t ap = rmA[i]; ap < rmA[i + 1]; ++ap) {
      int32_t k = ciA[ap];
      for (int32_t bp = rmB[k]; bp < rmB[k + 1]; ++bp) {
        int32_t c = ciB[bp];
        if (marker[c] != i) {
          marker[c] = i;
          ++cnt;
        }
      }
    }
    nnz_c += cnt;
    row_map_c[i + 1] = (int32_t)nnz_c;
  }
  return nnz_c;
}

void tpukk_spgemm_pairs(int64_t n, const int32_t* rmA, const int32_t* ciA,
                        int64_t bcols, const int32_t* rmB, const int32_t* ciB,
                        const int32_t* row_map_c, int32_t* entries_c,
                        int32_t* a_idx, int32_t* b_idx, int32_t* c_idx) {
  // O(1) column -> local slot map; the sorted unique row pattern is
  // extracted from a per-row column BITMAP (epoch-reset words + ctz scan)
  // instead of std::sort — the comparison sort dominated at 50M pairs.
  std::vector<int64_t> loc_of(bcols, 0);
  const int64_t nwords = (bcols + 63) >> 6;
  std::vector<uint64_t> bits(nwords, 0);
  std::vector<int64_t> wepoch(nwords, -1);
  std::vector<int32_t> touched;
  touched.reserve(nwords);
  std::vector<int64_t> cnt, off, cur;
  std::vector<int64_t> pair_base(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t p = 0;
    for (int32_t ap = rmA[i]; ap < rmA[i + 1]; ++ap)
      p += rmB[ciA[ap] + 1] - rmB[ciA[ap]];
    pair_base[i + 1] = pair_base[i] + p;
  }
  for (int64_t i = 0; i < n; ++i) {
    // mark the row pattern in the bitmap
    touched.clear();
    int64_t npairs_row = pair_base[i + 1] - pair_base[i];
    for (int32_t ap = rmA[i]; ap < rmA[i + 1]; ++ap) {
      int32_t k = ciA[ap];
      for (int32_t bp = rmB[k]; bp < rmB[k + 1]; ++bp) {
        int32_t c = ciB[bp];
        int64_t w = c >> 6;
        if (wepoch[w] != i) {
          wepoch[w] = i;
          bits[w] = 0;
          touched.push_back((int32_t)w);
        }
        bits[w] |= (uint64_t)1 << (c & 63);
      }
    }
    // extract sorted unique columns: scan all words when the row is dense
    // enough, else sort the (much shorter) touched-word list
    int64_t r0 = row_map_c[i];
    size_t w_out = 0;
    auto emit_word = [&](int64_t w) {
      uint64_t m = bits[w];
      while (m) {
        int b = __builtin_ctzll(m);
        m &= m - 1;
        int32_t col = (int32_t)((w << 6) | b);
        entries_c[r0 + w_out] = col;
        loc_of[col] = (int64_t)w_out;
        ++w_out;
      }
    };
    if (npairs_row * 8 >= nwords) {
      for (int64_t w = 0; w < nwords; ++w)
        if (wepoch[w] == i) emit_word(w);
    } else {
      std::sort(touched.begin(), touched.end());
      for (int32_t w : touched) emit_word(w);
    }
    // per-entry pair counts -> local offsets
    cnt.assign(w_out, 0);
    for (int32_t ap = rmA[i]; ap < rmA[i + 1]; ++ap) {
      int32_t k = ciA[ap];
      for (int32_t bp = rmB[k]; bp < rmB[k + 1]; ++bp) cnt[loc_of[ciB[bp]]]++;
    }
    off.assign(w_out + 1, 0);
    for (size_t t = 0; t < w_out; ++t) off[t + 1] = off[t] + cnt[t];
    int64_t base = pair_base[i];
    cur.assign(off.begin(), off.end() - 1);
    for (int32_t ap = rmA[i]; ap < rmA[i + 1]; ++ap) {
      int32_t k = ciA[ap];
      for (int32_t bp = rmB[k]; bp < rmB[k + 1]; ++bp) {
        size_t loc = (size_t)loc_of[ciB[bp]];
        int64_t slot = base + cur[loc]++;
        a_idx[slot] = ap;
        b_idx[slot] = bp;
        c_idx[slot] = (int32_t)(r0 + loc);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// v7 SpMV gather-table conflict-aware slot placement (spmv_pallas.GtSpmvPlan).
// Elements are grouped by run (run_off: n_runs+1 offsets into the element
// arrays, caller sorts by run and, within a run, by (lo, hi) so same-source
// elements cluster).  Within a run each element (lane, lo, hi) needs a slot
// (chunk c < nch, sublane s < 8) such that
//   * at most one element per (lane, chunk, sublane)           [slot cap]
//   * per (chunk, sublane, lo) cell at most T distinct hi      [table cap]
// Greedy first-fit with growth: start at nch = ceil(max-lane-count/8); if
// elements cannot place, add chunks (up to max_grow extra) and retry just
// the failures.  Leftovers get out_c = -1 (the Python caller reschedules
// them in the conflict-free guarantee level).  Replaces the rank-based
// T-overflow levels whose one-chunk-per-run floor dominated padding
// (docs/PERF_NOTES.md round 2).
// srow_req (optional, use_srow != 0): lock each element's sublane to the
// given value (the identity-scatter "gi" layout: slot sublane == dst row's
// sublane within the tile, so the kernel scatter is a plain accumulate).
int64_t tpukk_gt_place(int64_t n_runs, const int64_t* run_off,
                       const int32_t* lane, const int32_t* lo,
                       const int32_t* hi,
                       int32_t T, int32_t max_grow,
                       int32_t* out_c, int32_t* out_s, int32_t* out_ti,
                       int32_t* out_nch,
                       const int32_t* srow_req, int32_t use_srow) {
  int64_t total_chunks = 0;
  int32_t lane_cnt[128];
  std::vector<uint8_t> slot_used;  // [(c*8+s)*128 + lane]
  std::vector<int32_t> cell_hi;    // [((c*8+s)*128 + lo)*T + t]
  std::vector<uint8_t> cell_cnt;   // [(c*8+s)*128 + lo]
  std::vector<int64_t> pending, fails;
  for (int64_t r = 0; r < n_runs; ++r) {
    int64_t e0 = run_off[r], e1 = run_off[r + 1];
    int32_t nch = 0;
    if (use_srow) {
      // slot class = (lane, srow): chunks >= max class count
      static thread_local std::vector<int32_t> cls(128 * 8);
      std::fill(cls.begin(), cls.end(), 0);
      for (int64_t e = e0; e < e1; ++e) {
        int32_t c = ++cls[lane[e] * 8 + srow_req[e]];
        if (c > nch) nch = c;
      }
    } else {
      std::memset(lane_cnt, 0, sizeof(lane_cnt));
      for (int64_t e = e0; e < e1; ++e) lane_cnt[lane[e]]++;
      int32_t mx = 0;
      for (int l = 0; l < 128; ++l) mx = std::max(mx, lane_cnt[l]);
      nch = (mx + 7) / 8;
    }
    out_nch[r] = 0;
    if (nch == 0) continue;
    int32_t cap = nch + max_grow;
    size_t nslots = (size_t)cap * 8;
    if (slot_used.size() < nslots * 128) {
      slot_used.resize(nslots * 128);
      cell_cnt.resize(nslots * 128);
      cell_hi.resize(nslots * 128 * (size_t)T);
    }
    std::memset(slot_used.data(), 0, nslots * 128);
    std::memset(cell_cnt.data(), 0, nslots * 128);
    pending.clear();
    for (int64_t e = e0; e < e1; ++e) pending.push_back(e);
    fails.clear();
    while (true) {
      fails.clear();
      for (int64_t e : pending) {
        int32_t L = lane[e], LO = lo[e], HI = hi[e];
        int32_t fc = -1, fs = -1, fti = -1;
        int32_t s_lo = use_srow ? srow_req[e] : 0;
        int32_t s_hi = use_srow ? srow_req[e] + 1 : 8;
        // pass 1: a free slot whose cell already maps LO -> HI (table reuse)
        for (int32_t c = 0; c < nch && fc < 0; ++c)
          for (int32_t s = s_lo; s < s_hi; ++s) {
            size_t slot = (size_t)c * 8 + s;
            if (slot_used[slot * 128 + L]) continue;
            size_t cell = slot * 128 + LO;
            uint8_t cc = cell_cnt[cell];
            for (uint8_t t = 0; t < cc; ++t)
              if (cell_hi[cell * T + t] == HI) { fc = c; fs = s; fti = t; break; }
            if (fc >= 0) break;
          }
        // pass 2: a free slot with spare table capacity
        if (fc < 0)
          for (int32_t c = 0; c < nch && fc < 0; ++c)
            for (int32_t s = s_lo; s < s_hi; ++s) {
              size_t slot = (size_t)c * 8 + s;
              if (slot_used[slot * 128 + L]) continue;
              size_t cell = slot * 128 + LO;
              if (cell_cnt[cell] < T) {
                fc = c; fs = s; fti = cell_cnt[cell];
                cell_hi[cell * T + fti] = HI;
                cell_cnt[cell] = (uint8_t)(fti + 1);
                break;
              }
            }
        if (fc < 0) { fails.push_back(e); continue; }
        slot_used[((size_t)fc * 8 + fs) * 128 + L] = 1;
        out_c[e] = fc; out_s[e] = fs; out_ti[e] = fti;
      }
      if (fails.empty() || nch >= cap) break;
      ++nch;
      pending.swap(fails);
    }
    for (int64_t e : fails) { out_c[e] = -1; out_s[e] = 0; out_ti[e] = 0; }
    out_nch[r] = nch;
    total_chunks += nch;
  }
  return total_chunks;
}

// ---------------------------------------------------------------------------
// Balanced dst-lane assignment for the v7 SpMV plan (spmv_pallas.GtSpmvPlan).
// Within a dst tile (1024 rows = 8 sublane groups x 128 lanes), the slot
// LANE of every nnz equals its row's assigned lane; the assignment is free
// per sublane group as long as each group's 128 rows occupy 128 distinct
// lanes (then the un-permute at flush is ONE lane dynamic_gather with table
// L[d, l] = lane(row d*128+l)).  The default lane = row%128 leaves per-
// (run, lane) counts Poisson-skewed (chunks per run = max over lanes of
// ceil(cnt/8)); this greedy assigns rows (heaviest first, per group) to the
// lane minimizing marginal chunk growth over the row's runs.
// pair_off: nd*1024+1 offsets into (pair_st, pair_cnt) per tile-padded row;
// out_lane: per row, the assigned lane (a bijection within each group).
void tpukk_gt_assign_lanes(int64_t nd, int64_t ns,
                           const int64_t* pair_off,
                           const int32_t* pair_st, const int32_t* pair_cnt,
                           int32_t* out_lane) {
  std::vector<int32_t> cnt((size_t)128 * ns);       // per (lane, st) counts
  std::vector<int64_t> cnt_epoch((size_t)128 * ns, -1);
  std::vector<int32_t> run_maxc(ns);                // per st: current max ceil(cnt/8)
  std::vector<int64_t> run_epoch(ns, -1);
  std::vector<int32_t> lane_tot(128);
  std::vector<uint8_t> taken((size_t)8 * 128);
  std::vector<int64_t> order(1024);
  for (int64_t t = 0; t < nd; ++t) {
    std::fill(lane_tot.begin(), lane_tot.end(), 0);
    std::fill(taken.begin(), taken.end(), 0);
    int64_t base = t * 1024;
    // global heaviest-first over the whole tile: rows placed late see the
    // most pressure, so give the heavy rows first pick
    for (int l = 0; l < 1024; ++l) order[l] = base + l;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return (pair_off[a + 1] - pair_off[a]) > (pair_off[b + 1] - pair_off[b]);
    });
    for (int l = 0; l < 1024; ++l) {
      int64_t row = order[l];
      int32_t g = (int32_t)((row - base) / 128);   // sublane group
      int64_t p0 = pair_off[row], p1 = pair_off[row + 1];
      int32_t best_lane = -1;
      int64_t best_cost = INT64_MAX;
      for (int32_t ln = 0; ln < 128; ++ln) {
        if (taken[(size_t)g * 128 + ln]) continue;
        int64_t cost = 0;
        for (int64_t p = p0; p < p1; ++p) {
          int32_t stp = pair_st[p];
          size_t k = (size_t)ln * ns + stp;
          int32_t c = (cnt_epoch[k] == t) ? cnt[k] : 0;
          int32_t rc = pair_cnt[p];
          int32_t rmx = (run_epoch[stp] == t) ? run_maxc[stp] : 0;
          int32_t newceil = (c + rc + 7) / 8;
          // chunks-per-run = max over lanes of ceil(cnt/8): only growing
          // the run's MAX costs a chunk; below it, quadratic pressure
          // keeps headroom spread
          if (newceil > rmx) cost += (int64_t)(newceil - rmx) << 22;
          cost += (int64_t)(c + rc) * (c + rc);
        }
        cost = (cost << 8) + lane_tot[ln];  // final tie: total lane load
        if (cost < best_cost) { best_cost = cost; best_lane = ln; }
      }
      taken[(size_t)g * 128 + best_lane] = 1;
      out_lane[row] = best_lane;
      for (int64_t p = p0; p < p1; ++p) {
        int32_t stp = pair_st[p];
        size_t k = (size_t)best_lane * ns + stp;
        if (cnt_epoch[k] != t) { cnt[k] = 0; cnt_epoch[k] = t; }
        cnt[k] += pair_cnt[p];
        int32_t nc = (cnt[k] + 7) / 8;
        if (run_epoch[stp] != t) { run_maxc[stp] = 0; run_epoch[stp] = t; }
        if (nc > run_maxc[stp]) run_maxc[stp] = nc;
        lane_tot[best_lane] += pair_cnt[p];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Dual-table variant for the SpGEMM pair plan (spgemm_pallas.GtPairPlan):
// each pair needs BOTH its A-side cell (chunk, sublane, loA) and B-side cell
// (chunk, sublane, loB) to hold its source row (<= T distinct rows per
// cell per side).  Same greedy + growth as tpukk_gt_place.
// sr_bound: source rows per window (BLK/128) — only used for sizing checks.
int64_t tpukk_gt_place2(int64_t n_runs, const int64_t* run_off,
                        const int32_t* lane,
                        const int32_t* loA, const int32_t* hiA,
                        const int32_t* loB, const int32_t* hiB,
                        int32_t T, int32_t max_grow,
                        int32_t* out_c, int32_t* out_s,
                        int32_t* out_tiA, int32_t* out_tiB,
                        int32_t* out_nch) {
  int64_t total_chunks = 0;
  int32_t lane_cnt[128];
  std::vector<uint8_t> slot_used;
  std::vector<int32_t> cell_hiA, cell_hiB;
  std::vector<uint8_t> cell_cntA, cell_cntB;
  std::vector<int64_t> pending, fails;
  for (int64_t r = 0; r < n_runs; ++r) {
    int64_t e0 = run_off[r], e1 = run_off[r + 1];
    std::memset(lane_cnt, 0, sizeof(lane_cnt));
    for (int64_t e = e0; e < e1; ++e) lane_cnt[lane[e]]++;
    int32_t mx = 0;
    for (int l = 0; l < 128; ++l) mx = std::max(mx, lane_cnt[l]);
    int32_t nch = (mx + 7) / 8;
    out_nch[r] = 0;
    if (nch == 0) continue;
    int32_t cap = nch + max_grow;
    size_t nslots = (size_t)cap * 8;
    if (slot_used.size() < nslots * 128) {
      slot_used.resize(nslots * 128);
      cell_cntA.resize(nslots * 128);
      cell_cntB.resize(nslots * 128);
      cell_hiA.resize(nslots * 128 * (size_t)T);
      cell_hiB.resize(nslots * 128 * (size_t)T);
    }
    std::memset(slot_used.data(), 0, nslots * 128);
    std::memset(cell_cntA.data(), 0, nslots * 128);
    std::memset(cell_cntB.data(), 0, nslots * 128);
    pending.clear();
    for (int64_t e = e0; e < e1; ++e) pending.push_back(e);
    fails.clear();
    while (true) {
      fails.clear();
      for (int64_t e : pending) {
        int32_t L = lane[e];
        int32_t LA = loA[e], HA = hiA[e], LB = loB[e], HB = hiB[e];
        int32_t fc = -1, fs = -1, ftA = -1, ftB = -1;
        for (int32_t pass = 0; pass < 2 && fc < 0; ++pass)
          for (int32_t c = 0; c < nch && fc < 0; ++c)
            for (int32_t s = 0; s < 8; ++s) {
              size_t slot = (size_t)c * 8 + s;
              if (slot_used[slot * 128 + L]) continue;
              size_t cA = slot * 128 + LA, cB = slot * 128 + LB;
              int32_t tA = -1, tB = -1;
              uint8_t ccA = cell_cntA[cA], ccB = cell_cntB[cB];
              for (uint8_t t = 0; t < ccA; ++t)
                if (cell_hiA[cA * T + t] == HA) { tA = t; break; }
              for (uint8_t t = 0; t < ccB; ++t)
                if (cell_hiB[cB * T + t] == HB) { tB = t; break; }
              if (pass == 0 && (tA < 0 || tB < 0)) continue;  // reuse-only
              if (tA < 0) { if (ccA >= T) continue; }
              if (tB < 0) { if (ccB >= T) continue; }
              fc = c; fs = s;
              if (tA < 0) { tA = ccA; cell_hiA[cA * T + tA] = HA;
                            cell_cntA[cA] = (uint8_t)(tA + 1); }
              if (tB < 0) { tB = ccB; cell_hiB[cB * T + tB] = HB;
                            cell_cntB[cB] = (uint8_t)(tB + 1); }
              ftA = tA; ftB = tB;
              break;
            }
        if (fc < 0) { fails.push_back(e); continue; }
        slot_used[((size_t)fc * 8 + fs) * 128 + L] = 1;
        out_c[e] = fc; out_s[e] = fs; out_tiA[e] = ftA; out_tiB[e] = ftB;
      }
      if (fails.empty() || nch >= cap) break;
      ++nch;
      pending.swap(fails);
    }
    for (int64_t e : fails) {
      out_c[e] = -1; out_s[e] = 0; out_tiA[e] = 0; out_tiB[e] = 0;
    }
    out_nch[r] = nch;
    total_chunks += nch;
  }
  return total_chunks;
}

// ---------------------------------------------------------------------------
// Triangle counting on the strict lower triangle (graph/triangle.py) —
// mark-based row intersection (the serial analog of the reference's
// mergeAnd/TriangleCount hashmap inserts, HashmapAccumulator.hpp:167-272).
// For each row i: mark N_L(i); for each k in N_L(i), count marked members
// of N_L(k).  O(sum_k |N_L| * avg) with O(1) membership via an epoch stamp.
// Writes per-row counts; returns the total.
int64_t tpukk_triangle_count(int64_t n, const int32_t* row_map,
                             const int32_t* entries, int64_t* per_row) {
  std::vector<int64_t> stamp(n, -1);
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t s = row_map[i], e = row_map[i + 1];
    for (int32_t p = s; p < e; ++p) stamp[entries[p]] = i;
    int64_t cnt = 0;
    for (int32_t p = s; p < e; ++p) {
      int32_t k = entries[p];
      for (int32_t q = row_map[k]; q < row_map[k + 1]; ++q)
        if (stamp[entries[q]] == i) ++cnt;
    }
    per_row[i] = cnt;
    total += cnt;
  }
  return total;
}

// ---------------------------------------------------------------------------
// Static-permutation routing through a 3-phase (row, column, row) local-
// permute network on an (R, C) grid — the Slepian–Duguid/Beneš middle-stage
// assignment.  The C-regular bipartite multigraph {src_row(e) -> dst_row(e)}
// (one edge per element e = out slot) is C-edge-colored by recursive Euler
// splitting (orient an Euler circuit; left->right edges form one half) —
// color = the intermediate COLUMN the element routes through.  Phases:
//   y1[r][c]  = x [r][t1[r*C+c]]       (permute within source rows)
//   y1T       = transpose(y1)          (R,C) -> (C,R)
//   y2[c][r]  = y1T[c][t2[c*R+r]]      (permute within columns)
//   y2T       = transpose(y2)
//   out[r][c] = y2T[r][t3[r*C+c]]      (permute within dest rows)
// src must be a permutation of [0, R*C); C a power of two.  Returns 0, or
// -1 on invalid input.  Replaces a runtime key-sort (permute_via_sort) with
// three pad-free local gathers + two XLA transposes on TPU.
int32_t tpukk_permute_route(int64_t R, int64_t C, const int64_t* src,
                            int32_t* t1, int32_t* t2, int32_t* t3) {
  if (R <= 0 || C <= 0 || (C & (C - 1)) != 0) return -1;
  const int64_t N = R * C;
  // edge arrays carried THROUGH the splits (id, src-row, dst-row) so every
  // level touches memory sequentially — the id-indirection variant spent
  // 10 levels x N random reads (16s at N=5M; this form is ~10x faster)
  std::vector<int64_t> edges(N), next_edges(N);
  std::vector<int32_t> esr(N), edr(N), next_esr(N), next_edr(N);
  for (int64_t e = 0; e < N; ++e) {
    edges[e] = e;
    esr[e] = (int32_t)(src[e] / C);
    edr[e] = (int32_t)(e / C);
  }
  std::vector<int64_t> goff{0, N}, next_goff;
  // int32 adjacency scratch (N < 2^31 here): halves walk memory traffic
  std::vector<int32_t> adj_off; // adjacency build scratch (2R nodes)
  std::vector<int32_t> adj;     // incident edge-local indices
  std::vector<int32_t> cursor;
  std::vector<uint8_t> used, bit;
  int64_t d = C;
  while (d > 1) {
    next_goff.assign(1, 0);
    int64_t out_pos = 0;
    // children of group g land at positions 2g, 2g+1
    for (size_t g = 0; g + 1 < goff.size(); ++g) {
      int64_t e0 = goff[g], e1 = goff[g + 1], M = e1 - e0;
      const int64_t* eid = edges.data() + e0;
      const int32_t* sr = esr.data() + e0;
      const int32_t* dr = edr.data() + e0;
      // node ids: left = sr (0..R-1), right = R + dr
      adj_off.assign(2 * R + 1, 0);
      for (int64_t k = 0; k < M; ++k) {
        ++adj_off[sr[k] + 1];
        ++adj_off[R + dr[k] + 1];
      }
      for (int64_t v = 0; v < 2 * R; ++v) adj_off[v + 1] += adj_off[v];
      adj.resize(2 * M);
      cursor.assign(adj_off.begin(), adj_off.end() - 1);
      for (int64_t k = 0; k < M; ++k) {
        adj[cursor[sr[k]]++] = (int32_t)k;
        adj[cursor[R + dr[k]]++] = (int32_t)k;
      }
      cursor.assign(adj_off.begin(), adj_off.end() - 1);
      used.assign(M, 0);
      bit.resize(M);
      // orient Euler circuits: walk until stuck (returns to start since
      // every degree is even); left->right traversal = bit 0
      for (int64_t k0 = 0; k0 < M; ++k0) {
        if (used[k0]) continue;
        used[k0] = 1;
        bit[k0] = 0;                       // start left->right
        int64_t node = R + dr[k0];         // now at right node
        bool at_left = false;
        while (true) {
          int64_t k = -1;
          while (cursor[node] < adj_off[node + 1]) {
            int32_t cand = adj[cursor[node]++];
            if (!used[cand]) { k = cand; break; }
          }
          if (k < 0) break;                // circuit closed
          used[k] = 1;
          bit[k] = at_left ? 0 : 1;
          node = at_left ? (R + dr[k]) : sr[k];
          at_left = !at_left;
        }
      }
      int64_t c0 = 0;
      for (int64_t k = 0; k < M; ++k) c0 += (bit[k] == 0);
      int64_t p0 = out_pos, p1 = out_pos + c0;
      for (int64_t k = 0; k < M; ++k) {
        int64_t p = (bit[k] == 0) ? p0++ : p1++;
        next_edges[p] = eid[k];
        next_esr[p] = sr[k];
        next_edr[p] = dr[k];
      }
      out_pos += M;
      next_goff.push_back(out_pos - (M - c0));
      next_goff.push_back(out_pos);
    }
    edges.swap(next_edges);
    esr.swap(next_esr);
    edr.swap(next_edr);
    goff.swap(next_goff);
    d >>= 1;
  }
  // goff now has C groups, each 1-regular (R edges); group index = color
  for (size_t g = 0; g + 1 < goff.size(); ++g) {
    int64_t color = (int64_t)g;
    for (int64_t p = goff[g]; p < goff[g + 1]; ++p) {
      int64_t e = edges[p];
      int64_t sr = esr[p], dr = edr[p];
      int64_t sc = src[e] - sr * C, dc = e - dr * C;
      t1[sr * C + color] = (int32_t)sc;
      t2[color * R + dr] = (int32_t)sr;
      t3[dr * C + dc] = (int32_t)color;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Full v9 SpMV gather-table stream build (spmv_pallas.GtSpmvPlan fast path).
// Everything the Python plan builder did around tpukk_gt_place — CSR
// expansion, (run, lo, hi) radix sort, layout choice by chunk-count cost
// model, placement, chunk assembly, missing-tile dummies, super-step batch
// selection and padding, v9 gt+lo packing — in one call, so plan build is
// O(nnz) C++ instead of a chain of numpy sorts + fancy-indexing (measured
// round 3: lap1000 build 16.4 s Python -> target < 1 s).
// Two-call ABI: tpukk_gt_build computes and stores the streams in a
// thread-local workspace and reports sizes via out_meta
// [S, n_ss, B, layout(0=gi4,1=dlp), n_valid, nd, ns]; tpukk_gt_fetch copies
// them into caller buffers.  Values never enter: the element-index stream
// (eidx, -1 = empty slot) lets the caller gather any value plane (and the
// f64 double-single LO plane) without re-running the build.
// Returns 0 ok; <0 = caller must use the Python fallback (overflow /
// unsupported sizes).

static thread_local struct {
  std::vector<int32_t> pk, eidx, rhi, src_ids, dst_ss, first_ss, cnt_ss;
  std::vector<int32_t> lane_tab;  // (nd*1024) assigned lane per row, dlp only
  int64_t S = 0, n_ss = 0, B = 1, layout = 0, n_valid = 0, nd = 0, ns = 0;
  int64_t has_tab = 0;
} g_gt;

static void gt_radix_sort(std::vector<uint64_t>& a) {
  size_t n = a.size();
  static thread_local std::vector<uint64_t> tmp;
  tmp.resize(n);
  static thread_local std::vector<size_t> hist;
  hist.resize(1 << 16);
  uint64_t* src = a.data();
  uint64_t* dst = tmp.data();
  for (int pass = 0; pass < 4; ++pass) {
    int shift = pass * 16;
    std::fill(hist.begin(), hist.end(), 0);
    for (size_t i = 0; i < n; ++i) hist[(src[i] >> shift) & 0xffff]++;
    size_t sum = 0;
    bool skip = false;
    for (size_t b = 0; b < (1 << 16); ++b) {
      if (hist[b] == n) { skip = true; break; }
      size_t c = hist[b]; hist[b] = sum; sum += c;
    }
    if (skip) continue;
    for (size_t i = 0; i < n; ++i)
      dst[hist[(src[i] >> shift) & 0xffff]++] = src[i];
    std::swap(src, dst);
  }
  if (src != a.data()) std::memcpy(a.data(), src, n * sizeof(uint64_t));
}

int64_t tpukk_gt_build(int64_t n, int64_t m, int64_t nnz,
                       const int64_t* rm, const int32_t* ent,
                       int32_t td, int32_t ts,
                       int32_t force_layout,  // 0 auto, 1 gi, 2 dl
                       int32_t max_grow_gi, int32_t max_grow_dl,
                       int32_t force_batch, int32_t use_lane_tab,
                       int32_t force_group,
                       double fix_us, double var_gi4_us, double var_dlp_us,
                       int64_t* out_meta) {
  if (nnz <= 0 || n <= 0) return -1;
  int64_t nd = (n + td - 1) / td;
  int64_t ns = (m + ts - 1) / ts;
  int32_t SR = ts / 128;
  if (SR > 64) return -2;                       // key packs hi into 6 bits
  if (nd * ns * 8192 >= ((int64_t)1 << 32)) return -2;
  if (nnz >= ((int64_t)1 << 32)) return -2;

  // --- expansion + (run, lo, hi | element) sort keys ----------------------
  std::vector<int32_t> rows(nnz);
  std::vector<uint64_t> keys(nnz);
  for (int64_t r = 0; r < n; ++r) {
    int64_t dt = r / td;
    for (int64_t k = rm[r]; k < rm[r + 1]; ++k) {
      rows[k] = (int32_t)r;
      int64_t c = ent[k];
      int64_t st = c / ts;
      int64_t locc = c - st * ts;
      uint64_t key = (((uint64_t)(dt * ns + st) * 128 + (locc & 127)) << 6)
                     | (uint64_t)(locc >> 7);
      keys[k] = (key << 32) | (uint64_t)k;
    }
  }
  gt_radix_sort(keys);

  // --- sorted per-element arrays + run offsets ----------------------------
  std::vector<int32_t> lane_s(nnz), lo_s(nnz), hi_s(nnz), srow_s(nnz);
  std::vector<int64_t> run_off;
  std::vector<int64_t> run_ids;
  run_off.reserve(1024);
  run_ids.reserve(1024);
  uint64_t prev_run = ~0ull;
  for (int64_t i = 0; i < nnz; ++i) {
    uint64_t key = keys[i] >> 32;
    int64_t e = (int64_t)(keys[i] & 0xffffffffull);
    uint64_t run = key >> 13;
    lo_s[i] = (int32_t)((key >> 6) & 127);
    hi_s[i] = (int32_t)(key & 63);
    int64_t locr = rows[e] % td;
    lane_s[i] = (int32_t)(locr & 127);
    srow_s[i] = (int32_t)(locr >> 7);
    if (run != prev_run) {
      run_off.push_back(i);
      run_ids.push_back((int64_t)run);
      prev_run = run;
    }
  }
  run_off.push_back(nnz);
  int64_t n_runs = (int64_t)run_ids.size();

  // --- layout choice: estimated chunk counts under each layout ------------
  bool gi = force_layout == 1;
  if (force_layout == 0) {
    static thread_local std::vector<int32_t> cnt_lane, cnt_row;
    static thread_local std::vector<int64_t> ep_lane, ep_row;
    cnt_lane.assign(128, 0); ep_lane.assign(128, -1);
    cnt_row.assign(td, 0); ep_row.assign(td, -1);
    int64_t chunks_dl = 0, chunks_gi = 0;
    for (int64_t r = 0; r < n_runs; ++r) {
      int32_t mx_lane = 0, mx_row = 0;
      for (int64_t i = run_off[r]; i < run_off[r + 1]; ++i) {
        int32_t L = lane_s[i];
        if (ep_lane[L] != r) { cnt_lane[L] = 0; ep_lane[L] = r; }
        if (++cnt_lane[L] > mx_lane) mx_lane = cnt_lane[L];
        int32_t R = srow_s[i] * 128 + lane_s[i];
        if (ep_row[R] != r) { cnt_row[R] = 0; ep_row[R] = r; }
        if (++cnt_row[R] > mx_row) mx_row = cnt_row[R];
      }
      chunks_dl += (mx_lane + 7) / 8;
      chunks_gi += mx_row;
    }
    gi = chunks_gi * var_gi4_us < chunks_dl * var_dlp_us;
  }

  // --- placement (retry dl when the gi attempt overflows, auto only) ------
  std::vector<int32_t> out_c(nnz), out_s(nnz), out_ti(nnz);
  std::vector<int32_t> nch(n_runs);
  auto attempt = [&](bool use_gi, int32_t mg) -> bool {
    tpukk_gt_place(n_runs, run_off.data(), lane_s.data(), lo_s.data(),
                   hi_s.data(), 1, mg, out_c.data(), out_s.data(),
                   out_ti.data(), nch.data(),
                   use_gi ? srow_s.data() : nullptr, use_gi ? 1 : 0);
    for (int64_t i = 0; i < nnz; ++i)
      if (out_c[i] < 0) return false;
    return true;
  };
  if (gi && !attempt(true, max_grow_gi)) {
    if (force_layout == 1) return -3;
    gi = false;
  }
  bool has_tab = false;
  g_gt.lane_tab.clear();
  if (!gi && use_lane_tab && td == 1024) {
    // balanced per-tile dst-lane assignment (tpukk_gt_assign_lanes): a
    // whole-tile row->lane bijection that kills the Poisson max-lane skew
    // setting dlp's chunks/run; the kernel un-permutes at flush via the
    // lane table (tabidx stream == dst tile for whole-tile maps)
    // 1. per-(row, st) pair counts from the run-sorted elements
    std::vector<int64_t> p_row;
    std::vector<int32_t> p_st, p_cnt;
    {
      static thread_local std::vector<int32_t> cnt_row2;
      static thread_local std::vector<int64_t> ep_row2;
      cnt_row2.assign(td, 0);
      ep_row2.assign(td, -1);
      std::vector<int32_t> seen;
      for (int64_t r = 0; r < n_runs; ++r) {
        int64_t dt = run_ids[r] / ns, st = run_ids[r] % ns;
        seen.clear();
        for (int64_t i = run_off[r]; i < run_off[r + 1]; ++i) {
          int32_t R = srow_s[i] * 128 + lane_s[i];
          if (ep_row2[R] != r) { cnt_row2[R] = 0; ep_row2[R] = r; seen.push_back(R); }
          ++cnt_row2[R];
        }
        for (int32_t R : seen) {
          p_row.push_back(dt * 1024 + R);
          p_st.push_back((int32_t)st);
          p_cnt.push_back(cnt_row2[R]);
        }
      }
    }
    // 2. counting sort by row -> pair_off/pair_st/pair_cnt
    std::vector<int64_t> pair_off(nd * 1024 + 1, 0);
    for (int64_t rr : p_row) pair_off[rr + 1]++;
    for (size_t k = 1; k < pair_off.size(); ++k) pair_off[k] += pair_off[k - 1];
    std::vector<int32_t> ps(p_row.size()), pc(p_row.size());
    {
      std::vector<int64_t> cur(pair_off.begin(), pair_off.end() - 1);
      for (size_t k = 0; k < p_row.size(); ++k) {
        int64_t pos = cur[p_row[k]]++;
        ps[pos] = p_st[k];
        pc[pos] = p_cnt[k];
      }
    }
    std::vector<int32_t> out_lane(nd * 1024);
    tpukk_gt_assign_lanes(nd, ns, pair_off.data(), ps.data(), pc.data(),
                          out_lane.data());
    // 3. adopt only when the estimated chunk count improves
    {
      static thread_local std::vector<int32_t> cl_nat, cl_asg;
      static thread_local std::vector<int64_t> ep_nat, ep_asg;
      cl_nat.assign(128, 0); ep_nat.assign(128, -1);
      cl_asg.assign(128, 0); ep_asg.assign(128, -1);
      int64_t ch_nat = 0, ch_asg = 0;
      for (int64_t r = 0; r < n_runs; ++r) {
        int64_t dt = run_ids[r] / ns;
        int32_t mxn = 0, mxa = 0;
        for (int64_t i = run_off[r]; i < run_off[r + 1]; ++i) {
          int32_t L = lane_s[i];
          if (ep_nat[L] != r) { cl_nat[L] = 0; ep_nat[L] = r; }
          if (++cl_nat[L] > mxn) mxn = cl_nat[L];
          int32_t L2 = out_lane[dt * 1024 + srow_s[i] * 128 + lane_s[i]];
          if (ep_asg[L2] != r) { cl_asg[L2] = 0; ep_asg[L2] = r; }
          if (++cl_asg[L2] > mxa) mxa = cl_asg[L2];
        }
        ch_nat += (mxn + 7) / 8;
        ch_asg += (mxa + 7) / 8;
      }
      if (ch_asg < ch_nat) {
        // rewrite lane_s to the assigned lanes (per run for its tile)
        std::vector<int32_t> lane_nat(lane_s);
        for (int64_t r = 0; r < n_runs; ++r) {
          int64_t dt = run_ids[r] / ns;
          for (int64_t i = run_off[r]; i < run_off[r + 1]; ++i)
            lane_s[i] = out_lane[dt * 1024 + srow_s[i] * 128 + lane_nat[i]];
        }
        has_tab = true;
        g_gt.lane_tab.swap(out_lane);
        if (!attempt(false, max_grow_dl)) {
          // overflow under assigned lanes: retry natural
          lane_s.swap(lane_nat);
          has_tab = false;
          g_gt.lane_tab.clear();
        }
      }
    }
  }
  if (!gi && !(has_tab) && !attempt(false, max_grow_dl)) return -3;

  // --- chunk assembly in real (run-major == dst-major) order --------------
  std::vector<int64_t> base(n_runs + 1, 0);
  for (int64_t r = 0; r < n_runs; ++r) base[r + 1] = base[r] + nch[r];
  int64_t S_real = base[n_runs];
  std::vector<int32_t> ch_dst(S_real), ch_src(S_real);
  for (int64_t r = 0; r < n_runs; ++r) {
    int32_t dt = (int32_t)(run_ids[r] / ns), st = (int32_t)(run_ids[r] % ns);
    for (int64_t c = base[r]; c < base[r + 1]; ++c) {
      ch_dst[c] = dt; ch_src[c] = st;
    }
  }
  std::vector<int32_t> eidx_r(S_real * 1024, -1), pk_r(S_real * 1024, 0);
  std::vector<int32_t> rhi_r;
  if (!gi) rhi_r.assign(S_real * 1024, 0);
  for (int64_t r = 0; r < n_runs; ++r)
    for (int64_t i = run_off[r]; i < run_off[r + 1]; ++i) {
      int64_t rowb = ((base[r] + out_c[i]) * 8 + out_s[i]) * 128;
      eidx_r[rowb + lane_s[i]] = (int32_t)(keys[i] & 0xffffffffull);
      // v9 pk packing mirrors the two scattered planes of the Python build:
      // lo (low 7 bits) sits at the SLOT lane, hi (bits >= 7) at the SOURCE
      // lane — the kernel gather reads gt at position lo[slot] (table-cell
      // semantics; consistent across elements by the <=T-distinct-hi cap)
      pk_r[rowb + lane_s[i]] |= lo_s[i];
      pk_r[rowb + lo_s[i]] |= hi_s[i] << 7;
      if (!gi) rhi_r[rowb + lane_s[i]] = srow_s[i];
    }

  // --- merge missing-tile dummy chunks (dst-sorted) -----------------------
  // entry >= 0: real chunk id; -1: dummy init chunk for tile `dm_dst`
  std::vector<int64_t> ch_list;
  std::vector<int32_t> list_dst, list_src;
  ch_list.reserve(S_real + nd);
  int64_t next_tile = 0, ci = 0;
  while (ci < S_real || next_tile < nd) {
    int32_t dt = ci < S_real ? ch_dst[ci] : (int32_t)nd;
    while (next_tile < dt) {
      ch_list.push_back(-1);
      list_dst.push_back((int32_t)next_tile);
      list_src.push_back(0);
      ++next_tile;
    }
    if (ci >= S_real) break;
    ch_list.push_back(ci);
    list_dst.push_back(ch_dst[ci]);
    list_src.push_back(ch_src[ci]);
    next_tile = ch_dst[ci] + 1;
    ++ci;
  }
  int64_t S0 = (int64_t)ch_list.size();

  // --- super-step groups + batch selection --------------------------------
  // gi output blocks cover G tiles (G in {4, 16}): wide blocks amortize the
  // per-super-step floor on matrices with few chunks per tile (selection
  // matrices: ~1.3 chunks/tile made 80% of the kernel time floor) at ~1
  // extra where-select vop per added quarter per chunk.
  auto counts_for = [&](int64_t Gc, std::vector<int64_t>& counts,
                        std::vector<int64_t>& gstart,
                        std::vector<int64_t>& gid) {
    gid.resize(S0);
    counts.clear(); gstart.clear();
    for (int64_t i = 0; i < S0; ++i)
      gid[i] = gi ? list_dst[i] / Gc : list_dst[i];
    for (int64_t i = 0; i < S0; ++i)
      if (i == 0 || gid[i] != gid[i - 1]) { gstart.push_back(i); counts.push_back(1); }
      else ++counts.back();
    gstart.push_back(S0);
  };
  const double quarter_us = 0.001;  // one where-select per quarter per chunk
  int64_t G = gi ? (force_group > 0 ? force_group : 4) : 1;
  std::vector<int64_t> counts, gstart, gid;
  int64_t B = 1;
  if (force_batch > 0) {
    B = force_batch;
    counts_for(gi ? G : 1, counts, gstart, gid);
  } else {
    double best = std::numeric_limits<double>::infinity();
    std::vector<int64_t> Gcands;
    if (gi && force_group <= 0) { Gcands = {4, 16}; }
    else { Gcands = {G}; }
    for (int64_t Gc : Gcands) {
      counts_for(Gc, counts, gstart, gid);
      double var = gi ? (var_gi4_us + (Gc - 4) * quarter_us) : var_dlp_us;
      for (int64_t cand = 1; cand <= 32; ++cand) {
        int64_t nss_c = 0;
        for (int64_t g = 0; g < (int64_t)counts.size(); ++g)
          nss_c += (counts[g] + cand - 1) / cand;
        double cost = nss_c * (fix_us + cand * var);
        if (cost < best) { best = cost; B = cand; G = Gc; }
      }
    }
    counts_for(gi ? G : 1, counts, gstart, gid);
  }

  // --- final stream assembly with per-group B padding ---------------------
  int64_t S = 0;
  for (int64_t g = 0; g < (int64_t)counts.size(); ++g)
    S += ((counts[g] + B - 1) / B) * B;
  int64_t n_ss = S / B;
  g_gt.pk.assign(S * 1024, 0);
  g_gt.eidx.assign(S * 1024, -1);
  if (!gi) g_gt.rhi.assign(S * 1024, 0); else g_gt.rhi.clear();
  g_gt.src_ids.assign(S, 0);
  g_gt.dst_ss.assign(n_ss, 0);
  g_gt.first_ss.assign(n_ss, 0);
  g_gt.cnt_ss.assign(n_ss, 0);
  int64_t fpos = 0;
  for (int64_t g = 0; g < (int64_t)counts.size(); ++g) {
    int64_t out_pc = gi ? gid[gstart[g]] : gid[gstart[g]];
    int64_t padded = ((counts[g] + B - 1) / B) * B;
    for (int64_t j = 0; j < padded; ++j, ++fpos) {
      int64_t ss = fpos / B;
      if (j % B == 0) g_gt.dst_ss[ss] = (int32_t)out_pc;
      if (j >= counts[g]) continue;  // B-padding chunk: stays zero
      int64_t li = gstart[g] + j;
      int64_t rc = ch_list[li];
      if (gi)  // 4-bit sub field (supports G up to 16)
        g_gt.src_ids[fpos] = (list_src[li] << 4) | (list_dst[li] & (G - 1));
      else
        g_gt.src_ids[fpos] = list_src[li];
      if (rc >= 0) {
        std::memcpy(&g_gt.pk[fpos * 1024], &pk_r[rc * 1024], 1024 * 4);
        std::memcpy(&g_gt.eidx[fpos * 1024], &eidx_r[rc * 1024], 1024 * 4);
        if (!gi)
          std::memcpy(&g_gt.rhi[fpos * 1024], &rhi_r[rc * 1024], 1024 * 4);
        g_gt.cnt_ss[fpos / B]++;
      }
    }
  }
  // first_ss: 1 exactly when the super-step starts a new output block
  {
    int64_t prev = -1;
    for (int64_t ss = 0; ss < n_ss; ++ss) {
      g_gt.first_ss[ss] = g_gt.dst_ss[ss] != prev ? 1 : 0;
      prev = g_gt.dst_ss[ss];
    }
  }
  if (has_tab) g_gt.cnt_ss = g_gt.dst_ss;  // tabidx stream: whole-tile maps
  g_gt.S = S; g_gt.n_ss = n_ss; g_gt.B = B;
  g_gt.layout = gi ? 0 : 1;
  g_gt.n_valid = S_real; g_gt.nd = nd; g_gt.ns = ns;
  g_gt.has_tab = has_tab ? 1 : 0;
  out_meta[0] = S; out_meta[1] = n_ss; out_meta[2] = B;
  out_meta[3] = g_gt.layout; out_meta[4] = S_real;
  out_meta[5] = nd; out_meta[6] = ns; out_meta[7] = g_gt.has_tab;
  out_meta[8] = gi ? G : 1;
  return 0;
}

int32_t tpukk_gt_fetch_lane_tab(int32_t* lane_tab) {
  if (!g_gt.has_tab) return -1;
  std::memcpy(lane_tab, g_gt.lane_tab.data(), g_gt.lane_tab.size() * 4);
  return 0;
}

int32_t tpukk_gt_fetch(int32_t* pk, int32_t* eidx, int32_t* rhi,
                       int32_t* src_ids, int32_t* dst_ss, int32_t* first_ss,
                       int32_t* cnt_ss) {
  if (g_gt.S == 0) return -1;
  std::memcpy(pk, g_gt.pk.data(), g_gt.pk.size() * 4);
  std::memcpy(eidx, g_gt.eidx.data(), g_gt.eidx.size() * 4);
  if (!g_gt.rhi.empty() && rhi) std::memcpy(rhi, g_gt.rhi.data(), g_gt.rhi.size() * 4);
  std::memcpy(src_ids, g_gt.src_ids.data(), g_gt.src_ids.size() * 4);
  std::memcpy(dst_ss, g_gt.dst_ss.data(), g_gt.dst_ss.size() * 4);
  std::memcpy(first_ss, g_gt.first_ss.data(), g_gt.first_ss.size() * 4);
  std::memcpy(cnt_ss, g_gt.cnt_ss.data(), g_gt.cnt_ss.size() * 4);
  return 0;
}

// ---------------------------------------------------------------------------
// Batched inner routing for the 3-stage packed row-permutation tables
// (common/permute.py::_pack_row_stages): every row permutation of an outer
// Beneš phase is itself Slepian-Duguid-routed on an (SRR, 128) grid and the
// three index planes packed into one i32 (bits 0-6 stage-a lane, 7-13
// stage-b sublane, 14-20 stage-c lane).  The Python per-row ctypes loop
// cost seconds at plan build; this loops in C++.
int32_t tpukk_permute_route_rows(int64_t n_rows, int64_t SRR,
                                 const int64_t* t_rows, int32_t* out) {
  const int64_t L = SRR * 128;
  std::vector<int32_t> t1(L), t2(L), t3(L);
  for (int64_t r = 0; r < n_rows; ++r) {
    int32_t rc = tpukk_permute_route(SRR, 128, t_rows + r * L,
                                     t1.data(), t2.data(), t3.data());
    if (rc != 0) return rc;
    int32_t* o = out + r * L;
    for (int64_t s = 0; s < SRR; ++s)
      for (int64_t l = 0; l < 128; ++l) {
        int32_t sig = t2[l * SRR + s];  // transposed (128, SRR) layout
        o[s * 128 + l] = t1[s * 128 + l] | (sig << 7)
                         | (t3[s * 128 + l] << 14);
      }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Entry-dependency depth of the ILU(k) pattern (device-numeric planning; cf.
// the level schedule of sparse/impl/KokkosSparse_spiluk_symbolic_impl.hpp's
// level_list — this is the finer ENTRY-level DAG depth).  An entry (i,j)
// depends on L(i,k)/U(k,j) pairs with k < min(i,j) and, for i>j, on U(j,j).
// A synchronous Chow sweep makes depth-s entries exact after s+1 sweeps, so
// the returned value (max level + 1) is the sweep count for an EXACT
// device factorization.  rm/ci: pattern CSR, sorted columns, diag present.
int32_t tpukk_iluk_depth(int64_t n, const int32_t* rm, const int32_t* ci) {
  std::vector<int32_t> lvl((size_t)rm[n], 0);
  std::vector<int32_t> dpos(n, -1);
  int32_t depth = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t e = rm[i]; e < rm[i + 1]; ++e) {
      int32_t j = ci[e];
      int32_t L = 0;
      int32_t kmax = j < (int32_t)i ? j : (int32_t)i;
      for (int32_t e2 = rm[i]; e2 < rm[i + 1] && ci[e2] < kmax; ++e2) {
        int32_t k = ci[e2];
        const int32_t* lo = ci + rm[k];
        const int32_t* hi = ci + rm[k + 1];
        const int32_t* it = std::lower_bound(lo, hi, j);
        if (it != hi && *it == j) {
          int32_t pkj = (int32_t)(rm[k] + (it - lo));
          int32_t d = std::max(lvl[e2], lvl[pkj]) + 1;
          if (d > L) L = d;
        }
      }
      if (j < (int32_t)i && dpos[j] >= 0 && lvl[dpos[j]] + 1 > L)
        L = lvl[dpos[j]] + 1;
      if (j == (int32_t)i) dpos[i] = e;
      lvl[e] = L;
      if (L > depth) depth = L;
    }
  }
  return depth + 1;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering (role of graph/impl/KokkosGraph_BFS_impl.hpp:113
// and graph/src/KokkosGraph_RCM.hpp).  BFS-based: per connected component a
// George-Liu pseudo-peripheral start, then Cuthill-McKee BFS with neighbors
// visited in ascending-degree order; the whole order is reversed at the end.
// perm[new] = old (scipy reverse_cuthill_mckee convention).  Caller passes a
// symmetric pattern.
void tpukk_rcm(int64_t n, const int32_t* rm, const int32_t* ent,
               int32_t* perm) {
  std::vector<int32_t> deg(n);
  for (int64_t v = 0; v < n; ++v) deg[v] = rm[v + 1] - rm[v];
  std::vector<uint8_t> visited(n, 0);
  std::vector<int32_t> level(n);
  std::vector<int32_t> frontier, next, order;
  order.reserve(n);

  // BFS from s over unvisited vertices; returns (eccentricity, min-degree
  // vertex of the last level); records the traversal in `touched`.
  std::vector<int32_t> touched;
  auto bfs = [&](int32_t s, int32_t* out_last) -> int32_t {
    touched.clear();
    frontier.clear();
    frontier.push_back(s);
    level[s] = 0;
    visited[s] = 1;
    touched.push_back(s);
    int32_t ecc = 0, last = s;
    while (!frontier.empty()) {
      next.clear();
      for (int32_t v : frontier) {
        for (int32_t e = rm[v]; e < rm[v + 1]; ++e) {
          int32_t u = ent[e];
          if (u == v || visited[u]) continue;
          visited[u] = 1;
          level[u] = level[v] + 1;
          touched.push_back(u);
          next.push_back(u);
        }
      }
      if (!next.empty()) {
        ecc = level[next[0]];
        last = next[0];
        for (int32_t v : next)
          if (deg[v] < deg[last]) last = v;
      }
      frontier.swap(next);
    }
    *out_last = last;
    return ecc;
  };

  for (int64_t seed = 0; seed < n; ++seed) {
    if (visited[seed]) continue;
    // component start: the unvisited min-degree vertex is `seed`'s job only
    // approximately; George-Liu refines it.
    int32_t start = (int32_t)seed;
    int32_t last, ecc = bfs(start, &last);
    for (int iter = 0; iter < 8; ++iter) {
      for (int32_t v : touched) visited[v] = 0;
      int32_t last2, ecc2 = bfs(last, &last2);
      if (ecc2 <= ecc) { start = last; break; }
      ecc = ecc2;
      last = last2;
      start = last;
    }
    for (int32_t v : touched) visited[v] = 0;
    // Cuthill-McKee BFS from start, neighbors in ascending-degree order.
    size_t head = order.size();
    order.push_back(start);
    visited[start] = 1;
    std::vector<int32_t> nbr;
    while (head < order.size()) {
      int32_t v = order[head++];
      nbr.clear();
      for (int32_t e = rm[v]; e < rm[v + 1]; ++e) {
        int32_t u = ent[e];
        if (u == v || visited[u]) continue;
        visited[u] = 1;
        nbr.push_back(u);
      }
      std::sort(nbr.begin(), nbr.end(), [&](int32_t a, int32_t b) {
        return deg[a] != deg[b] ? deg[a] < deg[b] : a < b;
      });
      for (int32_t u : nbr) order.push_back(u);
    }
  }
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

// ---------------------------------------------------------------------------
// Distance-2 greedy coloring WITHOUT materializing G² (role of
// graph/impl/KokkosGraph_Distance2Color_impl.hpp's forbidden-array sweep,
// O(n) memory instead of O(sum deg²) storage).  Two modes:
//   include_d1 = 1 (square symmetric graph): forbidden(v) = colors of
//     N(v) ∪ N(N(v)) — pass rm_t/ent_t == rm/ent.
//   include_d1 = 0 (bipartite/rectangular, rows colored): forbidden(v) =
//     colors of every row sharing a column with v; rm_t/ent_t is the
//     column→row transpose (m columns).
// colors 1-based; returns max color used.
int32_t tpukk_d2_greedy_color(int64_t n, const int32_t* rm, const int32_t* ent,
                              int64_t m, const int32_t* rm_t,
                              const int32_t* ent_t, int32_t include_d1,
                              int32_t* colors) {
  (void)m;
  std::vector<int64_t> mark(n + 2, -1);  // mark[c] == v → color c forbidden
  int32_t max_color = 0;
  for (int64_t v = 0; v < n; ++v) {
    for (int32_t e = rm[v]; e < rm[v + 1]; ++e) {
      int32_t w = ent[e];
      if (include_d1 && w != (int32_t)v) {
        int32_t cw = colors[w];
        if (cw > 0 && cw <= (int32_t)n + 1) mark[cw] = v;
      }
      for (int32_t f = rm_t[w]; f < rm_t[w + 1]; ++f) {
        int32_t u = ent_t[f];
        if (u == (int32_t)v) continue;
        int32_t cu = colors[u];
        if (cu > 0 && cu <= (int32_t)n + 1) mark[cu] = v;
      }
    }
    int32_t c = 1;
    while (mark[c] == v) ++c;
    colors[v] = c;
    if (c > max_color) max_color = c;
  }
  return max_color;
}

}  // extern "C"
