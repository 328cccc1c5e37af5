// Native host-side runtime for sparse_matrix_math_tpu.
//
// TPU-native framework split: device compute (SpMV, solver loops) runs as
// XLA/Pallas kernels; the inherently sequential host-side work — incomplete
// factorizations and file ingestion — runs natively, mirroring the role of
// the reference C++ library's host code:
//   * IC(0):  reference include/sparse_matrix_math.h:1839-1928
//   * ILU(0): reference include/sparse_matrix_math.h:1727-1790 (completed
//             here; the reference version is unfinished — SURVEY §2.1 #14)
//   * Matrix Market loader: reference include/sparse_matrix_math.h:2524-2609
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).
// Status codes match the Python-side enums.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// IC(0): A ~= L L^T restricted to the lower-triangular pattern of A.
//
// Up-looking row algorithm over CSR arrays.  The caller extracts the lower
// pattern (ascending columns per row, diagonal last) and the matching A
// values:
//   l_indptr  : (n+1) row pointers into the lower pattern
//   l_indices : lower-pattern column ids (ascending; last per row == row)
//   a_lower   : A's values on that pattern (input)
//   l_values  : output L values on the same pattern
// Returns 0 on success; 2 on non-positive pivot (err_row = offending row).
// (Missing diagonals are detected by the Python wrapper before the call.)
// ---------------------------------------------------------------------------
int smm_ic0_factorize(int64_t n, const int64_t* l_indptr,
                      const int64_t* l_indices, const double* a_lower,
                      double* l_values, int64_t* err_row) {
  std::vector<double> w(static_cast<size_t>(n), 0.0);
  std::vector<int64_t> stamp(static_cast<size_t>(n), -1);

  for (int64_t i = 0; i < n; ++i) {
    const int64_t lo = l_indptr[i], hi = l_indptr[i + 1];
    for (int64_t p = lo; p < hi; ++p) {
      const int64_t col = l_indices[p];
      stamp[col] = i;
      w[col] = a_lower[p];
    }
    // strictly-lower columns j (ascending):
    //   L(i,j) = (A(i,j) - sum_{k<j} L(i,k) L(j,k)) / L(j,j)
    for (int64_t p = lo; p < hi - 1; ++p) {
      const int64_t j = l_indices[p];
      double s = w[j];
      const int64_t jlo = l_indptr[j], jhi = l_indptr[j + 1];
      for (int64_t q = jlo; q < jhi - 1; ++q) {  // k < j in L's row j
        const int64_t k = l_indices[q];
        if (stamp[k] == i) s -= l_values[q] * w[k];
      }
      w[j] = s / l_values[jhi - 1];  // diag of row j
    }
    // diagonal: L(i,i) = sqrt(A(i,i) - sum_k L(i,k)^2)
    double d = w[i];
    for (int64_t p = lo; p < hi - 1; ++p) {
      const double v = w[l_indices[p]];
      d -= v * v;
    }
    if (!(d > 0.0)) {  // also catches NaN
      *err_row = i;
      return 2;
    }
    w[i] = std::sqrt(d);
    for (int64_t p = lo; p < hi; ++p) l_values[p] = w[l_indices[p]];
  }
  return 0;
}

// ---------------------------------------------------------------------------
// ILU(0): incomplete LU with zero fill on the pattern of A (IKJ form,
// Saad §10.3.2).  `factor` enters as a copy of A's values and leaves with
// L (strict lower, unit diagonal implicit) and U (diagonal + upper).
// `diag_pos` gives the CSR position of each row's diagonal (precomputed).
// Returns 0 ok; 3 on zero pivot (err_row set).
// ---------------------------------------------------------------------------
int smm_ilu0_factorize(int64_t n, const int64_t* indptr,
                       const int64_t* indices, const int64_t* diag_pos,
                       double* factor, int64_t* err_row) {
  std::vector<int64_t> pos(static_cast<size_t>(n), -1);
  std::vector<int64_t> stamp(static_cast<size_t>(n), -1);

  for (int64_t i = 1; i < n; ++i) {
    const int64_t lo = indptr[i], hi = indptr[i + 1];
    for (int64_t p = lo; p < hi; ++p) {
      stamp[indices[p]] = i;
      pos[indices[p]] = p;
    }
    for (int64_t p = lo; p < hi; ++p) {
      const int64_t k = indices[p];
      if (k >= i) break;
      const double pivot = factor[diag_pos[k]];
      if (pivot == 0.0) {
        *err_row = k;
        return 3;
      }
      const double alpha = factor[p] / pivot;
      factor[p] = alpha;
      for (int64_t q = diag_pos[k] + 1; q < indptr[k + 1]; ++q) {
        const int64_t j = indices[q];
        if (stamp[j] == i) factor[pos[j]] -= alpha * factor[q];
      }
    }
    if (factor[diag_pos[i]] == 0.0) {
      *err_row = i;
      return 3;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Matrix Market loader (reference grammar: matrix coordinate real|integer,
// symmetric — h:2544-2573; `allow_general` extends to general).
// Status codes match MatrixLoadStatus: 0 SUCCESS, 1 FAILED_TO_OPEN_FILE,
// 3 PARSE_ERROR, 4 UNSUPPORTED_FORMAT.
// ---------------------------------------------------------------------------

static int mtx_parse_banner(FILE* f, int* symmetric, int allow_general) {
  char line[65536];
  if (!std::fgets(line, sizeof line, f)) return 3;
  char tag[64], obj[64], fmt[64], field[64], sym[64];
  if (std::sscanf(line, "%63s %63s %63s %63s %63s", tag, obj, fmt, field,
                  sym) != 5)
    return 3;
  if (std::strcmp(tag, "%%MatrixMarket") != 0) return 3;
  for (char* s : {obj, fmt, field, sym})
    for (char* c = s; *c; ++c) *c = (char)std::tolower(*c);
  if (std::strcmp(obj, "matrix") != 0 || std::strcmp(fmt, "coordinate") != 0)
    return 4;
  if (std::strcmp(field, "real") != 0 && std::strcmp(field, "integer") != 0)
    return 4;
  *symmetric = std::strcmp(sym, "symmetric") == 0;
  if (!*symmetric && !(allow_general && std::strcmp(sym, "general") == 0))
    return 4;
  return 0;
}

static int mtx_read_size(FILE* f, int64_t* rows, int64_t* cols, int64_t* nnz) {
  char line[65536];
  while (std::fgets(line, sizeof line, f)) {
    const char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (*s == '%') continue;
    if (*s == '\n' || *s == '\r' || *s == '\0') continue;
    long long r, c, z;
    char extra[8];
    if (std::sscanf(s, "%lld %lld %lld %7s", &r, &c, &z, extra) != 3) return 3;
    *rows = r; *cols = c; *nnz = z;
    return 0;
  }
  return 3;
}

int smm_mtx_header(const char* path, int64_t* rows, int64_t* cols,
                   int64_t* nnz, int* symmetric, int allow_general) {
  FILE* f = std::fopen(path, "r");
  if (!f) return 1;
  int st = mtx_parse_banner(f, symmetric, allow_general);
  if (st == 0) st = mtx_read_size(f, rows, cols, nnz);
  std::fclose(f);
  return st;
}

// Writes up to `cap` (row, col, value) triplets (0-based, symmetric entries
// mirrored — reference h:2596-2601).  `count` = triplets written;
// `bad_line` = 1-based offending line on parse error.
int smm_mtx_read(const char* path, int allow_general, int64_t cap,
                 int64_t* r_out, int64_t* c_out, double* v_out,
                 int64_t* count, int64_t* bad_line) {
  FILE* f = std::fopen(path, "r");
  if (!f) return 1;
  int symmetric = 0;
  int st = mtx_parse_banner(f, &symmetric, allow_general);
  int64_t rows = 0, cols = 0, nnz = 0;
  if (st == 0) st = mtx_read_size(f, &rows, &cols, &nnz);
  if (st != 0) {
    std::fclose(f);
    return st;
  }
  char line[65536];
  int64_t written = 0, entries = 0, lineno = 2;
  while (std::fgets(line, sizeof line, f)) {
    ++lineno;
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (*s == '%' || *s == '\n' || *s == '\r' || *s == '\0') continue;
    char* end = nullptr;
    const long long r1 = std::strtoll(s, &end, 10);
    if (end == s) goto parse_err;
    s = end;
    const long long c1 = std::strtoll(s, &end, 10);
    if (end == s) goto parse_err;
    s = end;
    {
      const double v = std::strtod(s, &end);
      if (end == s) goto parse_err;
      // nothing but whitespace may follow (reference rejects junk columns)
      while (*end == ' ' || *end == '\t' || *end == '\n' || *end == '\r') ++end;
      if (*end != '\0') goto parse_err;
      const int64_t r = r1 - 1, c = c1 - 1;  // 1-based input (h:2595-2596)
      if (r < 0 || r >= rows || c < 0 || c >= cols) goto parse_err;
      if (written >= cap) goto parse_err;
      r_out[written] = r; c_out[written] = c; v_out[written] = v;
      ++written;
      if (symmetric && r != c) {
        if (written >= cap) goto parse_err;
        r_out[written] = c; c_out[written] = r; v_out[written] = v;
        ++written;
      }
      ++entries;
    }
  }
  std::fclose(f);
  if (entries != nnz) {
    *bad_line = lineno;
    return 3;
  }
  *count = written;
  return 0;

parse_err:
  std::fclose(f);
  *bad_line = lineno;
  return 3;
}

// ---------------------------------------------------------------------------
// W-SELL slot-row colouring (formats/wsell.py), first-fit variant.
//
// Per (job, target-sublane) group, assign each nnz the smallest slot row
// satisfying the kernel's layout constraints (see formats/wsell.py):
//   * one slot per (row, output lane)            — lane-occupancy mask
//   * one window-sublane per (row, source lane)  — equal columns share it
// First-fit packs at least as tightly as the vectorised rank+repair
// NumPy fallback (which over-approximates with max(rank1, rank2) plus
// conflict-bump rounds) and runs in one pass over the entries.
//
// Inputs are the per-nnz job id (dense, any order), target sublane t
// (0..7), output lane (0..127), source lane (0..127) and window-stack
// sublane (0..127 — up to F=16 windows x 8 sublanes; int8 storage with
// -1 sentinel).  Output: slot row per nnz.  Returns max row count over all
// groups (>= 1), or -1 when inputs are out of range.
// ---------------------------------------------------------------------------
int64_t smm_wsell_color(int64_t nnz, int64_t n_jobs, const int64_t* job,
                        const int64_t* t, const int64_t* lane,
                        const int64_t* lsrc, const int64_t* sw,
                        int32_t* row_out) {
  const int64_t n_groups = n_jobs * 8;
  std::vector<int64_t> count(n_groups + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) {
    if (job[e] < 0 || job[e] >= n_jobs || t[e] < 0 || t[e] > 7 ||
        lane[e] < 0 || lane[e] > 127 || lsrc[e] < 0 || lsrc[e] > 127 ||
        sw[e] < 0 || sw[e] > 127)
      return -1;
    ++count[job[e] * 8 + t[e] + 1];
  }
  for (int64_t g = 0; g < n_groups; ++g) count[g + 1] += count[g];
  // bucket the entry ids by group, preserving input (row-major) order
  std::vector<int64_t> order(nnz);
  {
    std::vector<int64_t> cursor(count.begin(), count.end() - 1);
    for (int64_t e = 0; e < nnz; ++e) order[cursor[job[e] * 8 + t[e]]++] = e;
  }

  struct Row {
    uint64_t lanes[2];   // output-lane occupancy
    int8_t swv[128];     // window sublane per source lane (-1 = unset)
  };
  std::vector<Row> rows;
  int64_t max_rows = 1;
  for (int64_t g = 0; g < n_groups; ++g) {
    const int64_t lo = count[g], hi = count[g + 1];
    if (lo == hi) continue;
    rows.clear();
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t e = order[i];
      const int ln = static_cast<int>(lane[e]);
      const int ls = static_cast<int>(lsrc[e]);
      const int8_t s = static_cast<int8_t>(sw[e]);
      size_t k = 0;
      for (; k < rows.size(); ++k) {
        Row& rw = rows[k];
        if (rw.lanes[ln >> 6] & (1ull << (ln & 63))) continue;
        if (rw.swv[ls] != -1 && rw.swv[ls] != s) continue;
        break;
      }
      if (k == rows.size()) {
        rows.emplace_back();
        Row& rw = rows.back();
        rw.lanes[0] = rw.lanes[1] = 0;
        std::memset(rw.swv, -1, sizeof rw.swv);
      }
      Row& rw = rows[k];
      rw.lanes[ln >> 6] |= 1ull << (ln & 63);
      rw.swv[ls] = s;
      row_out[e] = static_cast<int32_t>(k);
    }
    if (static_cast<int64_t>(rows.size()) > max_rows)
      max_rows = static_cast<int64_t>(rows.size());
  }
  return max_rows;
}

// ---------------------------------------------------------------------------
// R-SELL closed-form stream-pass packer (formats/rsell.py:_pack_pass).
//
// Exact native reimplementation of the NumPy closed-form packer — same
// outputs, linear time.  Elements arrive sorted by (group, pos), so sigma
// is NONDECREASING per (group, source lane): the initial row (distinct-σ
// rank per lane) streams with a 128-entry last-σ counter instead of a
// sort.  Each overflow iteration is one stable counting sort of the
// group's live elements by (row, next-digit) — stability preserves the
// pos order the arrival gave us — followed by the coprime-stride lane
// scatter lane = (rank*67 + (row + group)*53) mod 128 (load-bearing for
// chain balance, see the Python docstring).
//
// Outputs: within-group row, out lane per element; rows used per group.
// Returns max rows over groups (>= 0); -1 on out-of-range input; -2 when
// the overflow loop fails to converge (duplicate flood, matches the
// Python ValueError).
// ---------------------------------------------------------------------------
int64_t smm_stream_pack_cf(int64_t n_elems, int64_t n_groups, int64_t wrows,
                           const int64_t* group, const int64_t* sigma,
                           const int64_t* lam, const int64_t* nd,
                           int32_t* row_out, int32_t* lane_out,
                           int64_t* group_rows) {
  for (int64_t g = 0; g < n_groups; ++g) group_rows[g] = 0;
  if (n_elems == 0) return 0;
  int64_t nd_max = 0;
  for (int64_t i = 0; i < n_elems; ++i) {
    if (nd[i] < 0) return -1;
    if (nd[i] > nd_max) nd_max = nd[i];
  }
  const int64_t ndk = nd_max + 1;
  std::vector<int32_t> live, next_live, sorted;
  std::vector<int64_t> counts;
  std::vector<uint8_t> fit;
  int32_t last_sig[128];
  int32_t lane_cnt[128];
  int64_t max_rows = 0;
  int64_t e = 0;
  while (e < n_elems) {
    const int64_t g = group[e];
    if (g < 0 || g >= n_groups) return -1;
    const int64_t e0 = e;
    while (e < n_elems && group[e] == g) ++e;
    const int64_t m = e - e0;
    // initial rows: distinct-rank of sigma per source lane (streaming)
    for (int k = 0; k < 128; ++k) { last_sig[k] = -1; lane_cnt[k] = 0; }
    for (int64_t i = e0; i < e; ++i) {
      const int64_t ln = lam[i], sg = sigma[i];
      if (ln < 0 || ln > 127 || sg < 0 || sg >= wrows) return -1;
      if (static_cast<int32_t>(sg) != last_sig[ln]) {
        last_sig[ln] = static_cast<int32_t>(sg);
        ++lane_cnt[ln];
      }
      row_out[i] = lane_cnt[ln] - 1;
    }
    live.resize(m);
    for (int64_t u = 0; u < m; ++u) live[u] = static_cast<int32_t>(u);
    fit.assign(m, 0);
    int iter = 0;
    for (; iter < 64 && !live.empty(); ++iter) {
      int64_t rmin = row_out[e0 + live[0]], rmax = rmin;
      for (const int32_t u : live) {
        const int64_t r = row_out[e0 + u];
        if (r < rmin) rmin = r;
        if (r > rmax) rmax = r;
      }
      const int64_t nk = (rmax - rmin + 1) * ndk;
      counts.assign(nk + 1, 0);
      for (const int32_t u : live)
        ++counts[(row_out[e0 + u] - rmin) * ndk + nd[e0 + u] + 1];
      for (int64_t k = 1; k <= nk; ++k) counts[k] += counts[k - 1];
      sorted.resize(live.size());
      for (const int32_t u : live)  // stable: live is in pos order
        sorted[counts[(row_out[e0 + u] - rmin) * ndk + nd[e0 + u]]++] = u;
      // rank within (row) runs of the (row, nd, pos) order; fits get
      // the stride-scattered lane, the rest re-rank into fresh rows
      int64_t prev_row = -1, rank = 0;
      for (const int32_t u : sorted) {
        const int64_t r = row_out[e0 + u];
        if (r != prev_row) { prev_row = r; rank = 0; } else ++rank;
        if (rank < 128) {
          lane_out[e0 + u] =
              static_cast<int32_t>((rank * 67 + (r + g) * 53) & 127);
          if (r + 1 > group_rows[g]) group_rows[g] = r + 1;
          fit[u] = 1;
        } else {
          fit[u] = 0;
        }
      }
      for (int k = 0; k < 128; ++k) { last_sig[k] = -1; lane_cnt[k] = 0; }
      const int64_t base = group_rows[g];
      next_live.clear();
      for (const int32_t u : live) {  // original (pos) order
        if (fit[u]) continue;
        const int64_t ln = lam[e0 + u], sg = sigma[e0 + u];
        if (static_cast<int32_t>(sg) != last_sig[ln]) {
          last_sig[ln] = static_cast<int32_t>(sg);
          ++lane_cnt[ln];
        }
        row_out[e0 + u] = static_cast<int32_t>(base + lane_cnt[ln] - 1);
        next_live.push_back(u);
      }
      live.swap(next_live);
    }
    if (!live.empty()) return -2;
    if (group_rows[g] > max_rows) max_rows = group_rows[g];
  }
  return max_rows;
}


// ---------------------------------------------------------------------------
// R-SELL chain-build fast path (formats/rsell.py:routed_from_csr).
//
// The routed build is host-side layout planning over nnz-sized arrays:
// per level, sort by (bucket, position), derive (group, sigma, lane),
// pack (smm_stream_pack_cf above), and scatter the slot planes.  In
// NumPy that is ~30 full passes of int64 temporaries per level (~90 s at
// 12M nnz); these primitives do each phase in one or two streaming
// passes.  Python composes them (native/__init__.py) with the NumPy
// implementations as fallback and executable specification.
// ---------------------------------------------------------------------------

// Stable LSD radix-sort permutation of uint64 keys (11-bit digits).
// perm_out[i] = index of the i-th smallest key (ties in input order).
void smm_sort_perm(int64_t n, const uint64_t* key, int key_bits,
                   int64_t* perm_out) {
  if (n <= 0) return;
  constexpr int kDigitBits = 11;
  constexpr int kBuckets = 1 << kDigitBits;
  std::vector<int64_t> tmp(static_cast<size_t>(n));
  int64_t* cur = perm_out;
  int64_t* nxt = tmp.data();
  for (int64_t i = 0; i < n; ++i) cur[i] = i;
  int64_t hist[kBuckets];
  for (int shift = 0; shift < key_bits; shift += kDigitBits) {
    const uint64_t mask = (shift + kDigitBits >= 64)
                              ? (~0ull >> shift)
                              : ((1ull << kDigitBits) - 1);
    std::memset(hist, 0, sizeof hist);
    for (int64_t i = 0; i < n; ++i)
      ++hist[(key[cur[i]] >> shift) & mask];
    int64_t run = 0;
    for (int b = 0; b < kBuckets; ++b) {
      const int64_t c = hist[b];
      hist[b] = run;
      run += c;
    }
    for (int64_t i = 0; i < n; ++i)
      nxt[hist[(key[cur[i]] >> shift) & mask]++] = cur[i];
    int64_t* t = cur;
    cur = nxt;
    nxt = t;
  }
  if (cur != perm_out)
    std::memcpy(perm_out, cur, static_cast<size_t>(n) * sizeof(int64_t));
}

// Grouping pass for one stream level.  Inputs sorted by (bucket, pos);
// emits the dense (bucket, window-stack) group id, the within-stack row
// sigma, the lane (pos mod 128) per element, and each group's window
// stack (group_stack, capacity n — only the first n_groups entries are
// written).  Returns n_groups.
int64_t smm_stream_group(int64_t n, int64_t wrows, const int64_t* bucket,
                         const int64_t* pos, int64_t* group, int64_t* sigma,
                         int64_t* lam, int64_t* group_stack) {
  int64_t g = -1;
  int64_t prev_bucket = -1, prev_stack = -1;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t xrow = pos[i] >> 7;       // pos / 128
    const int64_t ln = pos[i] & 127;        // pos % 128
    const int64_t stack = xrow / wrows;
    if (bucket[i] != prev_bucket || stack != prev_stack) {
      ++g;
      prev_bucket = bucket[i];
      prev_stack = stack;
      group_stack[g] = stack;
    }
    group[i] = g;
    sigma[i] = xrow - stack * wrows;
    lam[i] = ln;
  }
  return g + 1;
}

// Plane emission for one stream level: scatter values/meta into the
// (total_rows_padded x 128) planes and compute each element's new
// position.  row_off = per-group padded row offsets (from Python's tiny
// cumsum over groups); planes arrive zero-initialised.  dtype64 selects
// the vals plane element type.  Also returns, per vreg (8-row block),
// the window-stack base row via base_out (length n_vregs_padded,
// pre-filled by Python; only rows covered by groups are written).
void smm_stream_emit(int64_t n, int64_t sw_bits, int dtype64,
                     const int64_t* group, const int64_t* row_off,
                     const int32_t* row_in_group, const int32_t* out_lane,
                     const int64_t* lam, const int64_t* sigma,
                     void* vals_plane, int32_t* meta_plane,
                     int64_t* out_pos) {
  float* vf = static_cast<float*>(vals_plane);
  double* vd = static_cast<double*>(vals_plane);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t rg = row_off[group[i]] + row_in_group[i];
    const int64_t slot = (rg << 7) | out_lane[i];
    out_pos[i] = slot;
    if (dtype64)
      vd[slot] = 1.0;
    else
      vf[slot] = 1.0f;
    meta_plane[slot] |= static_cast<int32_t>(lam[i]) << sw_bits;
    meta_plane[(rg << 7) | lam[i]] |= static_cast<int32_t>(sigma[i]);
  }
}

}  // extern "C"
