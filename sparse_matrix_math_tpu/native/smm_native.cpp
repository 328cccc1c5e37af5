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
#include <mutex>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline int thread_count() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// Parallel stable LSD radix-sort permutation of uint64 keys.
// Stability per pass: threads own contiguous input chunks and scatter
// through per-(digit, thread) offsets accumulated in thread order, so
// equal keys keep their relative order.
//
// (key, perm) PAIRS move together through the passes: the round-4
// version carried only the permutation and gathered key[cur[i]] twice
// per pass — two random 8-byte gathers per element per pass, measured
// as the single largest cost of the routed R-SELL build (~1.85 s per
// level at 12M nnz).  Moving the key alongside makes the count phase a
// sequential read.  Digit width adapts to the key: ceil(key_bits /
// passes) bits with passes = ceil(key_bits / 13), so a 26-bit key takes
// 2x13-bit passes instead of 3x11 (8192-bucket histograms are still
// L2-resident per thread).
// Persistent grow-only workspaces: the build calls these entry points
// several times per chain with ~100-700 MB of scratch each; freeing
// the buffers hands the pages back to the OS (glibc munmaps blocks
// this large), so EVERY call used to re-pay first-touch page faults —
// measured ~5x slower inside a process holding the TPU tunnel client
// (3.84 s vs 0.79 s for one 12M-element level, round 5).  The
// workspace mutex serializes the (single-threaded-in-practice)
// entry points because ctypes releases the GIL.
static std::mutex g_ws_mutex;
static std::vector<uint64_t> g_ws_k0, g_ws_k1;
static std::vector<int64_t> g_ws_p, g_ws_hist;

template <typename T>
static inline void ws_reserve(std::vector<T>& v, size_t need) {
  if (v.size() < need) v.resize(need);
}

void radix_sort_perm(int64_t n, const uint64_t* key, int key_bits,
                     int64_t* perm_out) {
  if (n <= 0) return;
  constexpr int kMaxDigitBits = 13;
  const int passes = (key_bits + kMaxDigitBits - 1) / kMaxDigitBits;
  const int digit_bits = (key_bits + passes - 1) / passes;
  const int buckets = 1 << digit_bits;
  const int T = thread_count();
  ws_reserve(g_ws_k0, static_cast<size_t>(n));
  ws_reserve(g_ws_k1, static_cast<size_t>(n));
  ws_reserve(g_ws_p, static_cast<size_t>(n));
  ws_reserve(g_ws_hist, static_cast<size_t>(T) * buckets);
  std::vector<uint64_t>& kbuf0 = g_ws_k0;
  std::vector<uint64_t>& kbuf1 = g_ws_k1;
  std::vector<int64_t>& pbuf = g_ws_p;
  std::vector<int64_t>& hist = g_ws_hist;
  uint64_t* kcur = kbuf0.data();
  uint64_t* knxt = kbuf1.data();
  int64_t* pcur = perm_out;
  int64_t* pnxt = pbuf.data();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    kcur[i] = key[i];
    pcur[i] = i;
  }
  const int64_t chunk = (n + T - 1) / T;
  for (int shift = 0; shift < key_bits; shift += digit_bits) {
    const uint64_t mask = (shift + digit_bits >= 64)
                              ? (~0ull >> shift)
                              : ((1ull << digit_bits) - 1);
#pragma omp parallel num_threads(T)
    {
#if defined(_OPENMP)
      const int t = omp_get_thread_num();
#else
      const int t = 0;
#endif
      int64_t* h = hist.data() + static_cast<size_t>(t) * buckets;
      std::memset(h, 0, sizeof(int64_t) * buckets);
      const int64_t lo = t * chunk;
      const int64_t hi = lo + chunk < n ? lo + chunk : n;
      for (int64_t i = lo; i < hi; ++i)
        ++h[(kcur[i] >> shift) & mask];
    }
    int64_t run = 0;
    for (int b = 0; b < buckets; ++b)
      for (int t = 0; t < T; ++t) {
        int64_t& c = hist[static_cast<size_t>(t) * buckets + b];
        const int64_t v = c;
        c = run;
        run += v;
      }
#pragma omp parallel num_threads(T)
    {
#if defined(_OPENMP)
      const int t = omp_get_thread_num();
#else
      const int t = 0;
#endif
      int64_t* h = hist.data() + static_cast<size_t>(t) * buckets;
      const int64_t lo = t * chunk;
      const int64_t hi = lo + chunk < n ? lo + chunk : n;
      for (int64_t i = lo; i < hi; ++i) {
        const int64_t at = h[(kcur[i] >> shift) & mask]++;
        knxt[at] = kcur[i];
        pnxt[at] = pcur[i];
      }
    }
    uint64_t* kt = kcur; kcur = knxt; knxt = kt;
    int64_t* pt = pcur; pcur = pnxt; pnxt = pt;
  }
  if (pcur != perm_out)
    std::memcpy(perm_out, pcur, static_cast<size_t>(n) * sizeof(int64_t));
}

// Permute one int64 array in place through a scratch buffer.
inline void apply_perm_inplace(int64_t n, const int64_t* perm, int64_t* arr,
                               int64_t* scratch) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) scratch[i] = arr[perm[i]];
  std::memcpy(arr, scratch, static_cast<size_t>(n) * sizeof(int64_t));
}

}  // namespace

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
// pivot_tol: pivots with |pivot| <= pivot_tol are treated as zero
// (err 3) — a data-dependent NEAR-zero pivot produces an unusable
// factor just as surely as an exact zero; the caller escalates through
// diagonal shifts (precond/_factorize.py round 5).
int smm_ilu0_factorize(int64_t n, const int64_t* indptr,
                       const int64_t* indices, const int64_t* diag_pos,
                       double* factor, double pivot_tol,
                       int64_t* err_row) {
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
      if (std::fabs(pivot) <= pivot_tol) {
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
    if (std::fabs(factor[diag_pos[i]]) <= pivot_tol) {
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
// Fused W-SELL layout planner (formats/wsell.py:_wsell_from_coo, the
// per-element phases): derive the per-nnz layout fields from (r, c),
// map nnz to (slab, aligned window-stack) jobs via a dense presence
// map, and first-fit colour slot rows per (job, target-sublane) group —
// all in one call so the Python layer never materialises the nnz-sized
// int64 field arrays.  Outputs: per-nnz job id + slot row, per-job
// 8*K row count / window base / slab (capacity n; first n_jobs valid).
// Returns n_jobs; -1 on bad input; -3 when the job key span is too
// large for the dense map (caller falls back to NumPy np.unique).
// ---------------------------------------------------------------------------
int64_t smm_wsell_plan(int64_t n, int64_t n_rows, int64_t x_rows,
                       int64_t window_f, const int64_t* r, const int64_t* c,
                       int64_t* job_out, int32_t* row_out,
                       int64_t* job_rows, int64_t* job_base,
                       int64_t* job_slab) {
  if (n <= 0 || window_f < 1 || window_f > 16 || x_rows < 8 * window_f)
    return -1;
  const int64_t wrows = 8 * window_f;
  const int64_t wdim = (x_rows + wrows - 1) / wrows + 1;
  const int64_t c_max = (x_rows << 7) - 1;
  int64_t max_slab = 0;
#pragma omp parallel for schedule(static) reduction(max : max_slab)
  for (int64_t i = 0; i < n; ++i) {
    // out-of-range r/c poison max_slab past the span cap -> return -1
    const int64_t s = (r[i] < 0 || r[i] >= n_rows || c[i] < 0 ||
                       c[i] > c_max)
                          ? (int64_t{1} << 50)
                          : (r[i] >> 10);
    if (s > max_slab) max_slab = s;
  }
  if (max_slab >= (int64_t{1} << 50)) return -1;
  const int64_t key_span = (max_slab + 1) * wdim;
  const int64_t span_cap = 4 * n > (int64_t{1} << 26) ? 4 * n
                                                      : (int64_t{1} << 26);
  if (key_span > span_cap) return -3;

  // dense presence map -> dense job ids in ascending (slab, window) order
  std::vector<uint8_t> flags(static_cast<size_t>(key_span), 0);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    flags[static_cast<size_t>((r[i] >> 10) * wdim + (c[i] >> 7) / wrows)] = 1;
  std::vector<int32_t> keypos(static_cast<size_t>(key_span));
  int64_t n_jobs = 0;
  for (int64_t k = 0; k < key_span; ++k) {
    keypos[k] = static_cast<int32_t>(n_jobs);
    if (flags[k]) {
      job_base[n_jobs] = (k % wdim) * wrows;
      if (job_base[n_jobs] > x_rows - wrows) job_base[n_jobs] = x_rows - wrows;
      job_slab[n_jobs] = k / wdim;
      ++n_jobs;
    }
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    job_out[i] = keypos[static_cast<size_t>((r[i] >> 10) * wdim +
                                            (c[i] >> 7) / wrows)];

  // bucket entries by (job, target sublane) preserving input order
  const int64_t n_groups = n_jobs * 8;
  std::vector<int64_t> count(static_cast<size_t>(n_groups) + 1, 0);
  for (int64_t i = 0; i < n; ++i)
    ++count[job_out[i] * 8 + ((r[i] & 1023) >> 7) + 1];
  for (int64_t g = 0; g < n_groups; ++g) count[g + 1] += count[g];
  std::vector<int64_t> order(static_cast<size_t>(n));
  {
    std::vector<int64_t> cursor(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < n; ++i)
      order[cursor[job_out[i] * 8 + ((r[i] & 1023) >> 7)]++] = i;
  }

  // first-fit colouring per (job, t) group, parallel over groups
  for (int64_t j = 0; j < n_jobs; ++j) job_rows[j] = 0;
  int err = 0;
#pragma omp parallel
  {
    struct Row {
      uint64_t lanes[2];   // output-lane occupancy
      int8_t swv[128];     // window sublane per source lane (-1 = unset)
    };
    std::vector<Row> rows;
#pragma omp for schedule(dynamic, 64)
    for (int64_t g = 0; g < n_groups; ++g) {
      const int64_t lo = count[g], hi = count[g + 1];
      if (lo == hi) continue;
      rows.clear();
      bool bad = false;
      for (int64_t i = lo; i < hi; ++i) {
        const int64_t e = order[i];
        const int ln = static_cast<int>(r[e] & 127);
        const int ls = static_cast<int>(c[e] & 127);
        const int64_t swl = (c[e] >> 7) % wrows;
        if (swl < 0 || swl > 127) { bad = true; break; }
        const int8_t s = static_cast<int8_t>(swl);
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
      if (bad) {
#pragma omp atomic write
        err = 1;
        continue;
      }
      // K(job) = max over t of rows_t; accumulate 8*rows_t atomically
      // (8 t-groups of one job may run on different threads)
      const int64_t jr = static_cast<int64_t>(rows.size()) * 8;
      int64_t* slot = &job_rows[g >> 3];
      int64_t prev_v = __atomic_load_n(slot, __ATOMIC_RELAXED);
      while (prev_v < jr &&
             !__atomic_compare_exchange_n(slot, &prev_v, jr, true,
                                          __ATOMIC_RELAXED,
                                          __ATOMIC_RELAXED)) {
      }
    }
  }
  if (err) return -1;
  return n_jobs;
}

// Fused W-SELL plane emission (formats/wsell.py:_wsell_from_coo, the
// vals/meta scatters): computes each nnz's global slot row from the
// planner outputs + the job->vreg placement, validates the window
// sublane, and scatters value + packed meta.  vals_plane/meta_plane
// arrive zero-initialised; dtype64 selects f32/f64 for v/vals_plane.
// Returns 0, or -1 when a window sublane falls outside [0, wrows).
int smm_wsell_emit(int64_t n, int64_t lsrc_shift, int64_t wrows, int dtype64,
                   const int64_t* r, const int64_t* c, const void* v,
                   const int64_t* job, const int32_t* row,
                   const int64_t* vreg_start_of_job,
                   const int32_t* base_vreg, void* vals_plane,
                   int32_t* meta_plane) {
  const float* vf = static_cast<const float*>(v);
  const double* vd = static_cast<const double*>(v);
  float* of = static_cast<float*>(vals_plane);
  double* od = static_cast<double*>(vals_plane);
  int err = 0;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t t = (r[i] & 1023) >> 7;
    const int64_t lane = r[i] & 127;
    const int64_t lsrc = c[i] & 127;
    const int64_t rg = (vreg_start_of_job[job[i]] + row[i]) * 8 + t;
    const int64_t sw = (c[i] >> 7) - base_vreg[rg >> 3];
    if (sw < 0 || sw >= wrows) {
#pragma omp atomic write
      err = -1;
      continue;
    }
    const int64_t slot = (rg << 7) | lane;
    if (dtype64)
      od[slot] = vd[i];
    else
      of[slot] = vf[i];
    __atomic_fetch_or(&meta_plane[slot],
                      static_cast<int32_t>(lsrc << lsrc_shift),
                      __ATOMIC_RELAXED);
    __atomic_fetch_or(&meta_plane[(rg << 7) | lsrc],
                      static_cast<int32_t>(sw), __ATOMIC_RELAXED);
  }
  return err;
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
// Per-group scratch for the pack loop; one instance per thread.
struct _PackScratch {
  std::vector<int32_t> live, next_live, sorted;
  std::vector<int64_t> counts;
  std::vector<uint8_t> fit;
};

// Pack one group's elements [e0, e1).  Returns the group's row count,
// -1 on out-of-range input, -2 on non-convergence.
static int64_t _pack_one_group(int64_t e0, int64_t e1, int64_t g,
                               int64_t wrows, int64_t ndk,
                               const int64_t* sigma, const int64_t* lam,
                               const int64_t* nd, int32_t* row_out,
                               int32_t* lane_out, _PackScratch& s) {
  const int64_t m = e1 - e0;
  int32_t last_sig[128];
  int32_t lane_cnt[128];
  // initial rows: distinct-rank of sigma per source lane (streaming)
  for (int k = 0; k < 128; ++k) { last_sig[k] = -1; lane_cnt[k] = 0; }
  for (int64_t i = e0; i < e1; ++i) {
    const int64_t ln = lam[i], sg = sigma[i];
    if (ln < 0 || ln > 127 || sg < 0 || sg >= wrows) return -1;
    if (static_cast<int32_t>(sg) != last_sig[ln]) {
      last_sig[ln] = static_cast<int32_t>(sg);
      ++lane_cnt[ln];
    }
    row_out[i] = lane_cnt[ln] - 1;
  }
  s.live.resize(m);
  for (int64_t u = 0; u < m; ++u) s.live[u] = static_cast<int32_t>(u);
  s.fit.assign(m, 0);
  int64_t rows = 0;
  int iter = 0;
  for (; iter < 64 && !s.live.empty(); ++iter) {
    int64_t rmin = row_out[e0 + s.live[0]], rmax = rmin;
    for (const int32_t u : s.live) {
      const int64_t r = row_out[e0 + u];
      if (r < rmin) rmin = r;
      if (r > rmax) rmax = r;
    }
    const int64_t nk = (rmax - rmin + 1) * ndk;
    s.counts.assign(nk + 1, 0);
    for (const int32_t u : s.live)
      ++s.counts[(row_out[e0 + u] - rmin) * ndk + nd[e0 + u] + 1];
    for (int64_t k = 1; k <= nk; ++k) s.counts[k] += s.counts[k - 1];
    s.sorted.resize(s.live.size());
    for (const int32_t u : s.live)  // stable: live is in pos order
      s.sorted[s.counts[(row_out[e0 + u] - rmin) * ndk + nd[e0 + u]]++] = u;
    // rank within (row) runs of the (row, nd, pos) order; fits get
    // the stride-scattered lane, the rest re-rank into fresh rows
    int64_t prev_row = -1, rank = 0;
    for (const int32_t u : s.sorted) {
      const int64_t r = row_out[e0 + u];
      if (r != prev_row) { prev_row = r; rank = 0; } else ++rank;
      if (rank < 128) {
        lane_out[e0 + u] =
            static_cast<int32_t>((rank * 67 + (r + g) * 53) & 127);
        if (r + 1 > rows) rows = r + 1;
        s.fit[u] = 1;
      } else {
        s.fit[u] = 0;
      }
    }
    for (int k = 0; k < 128; ++k) { last_sig[k] = -1; lane_cnt[k] = 0; }
    s.next_live.clear();
    for (const int32_t u : s.live) {  // original (pos) order
      if (s.fit[u]) continue;
      const int64_t ln = lam[e0 + u], sg = sigma[e0 + u];
      if (static_cast<int32_t>(sg) != last_sig[ln]) {
        last_sig[ln] = static_cast<int32_t>(sg);
        ++lane_cnt[ln];
      }
      row_out[e0 + u] = static_cast<int32_t>(rows + lane_cnt[ln] - 1);
      s.next_live.push_back(u);
    }
    s.live.swap(s.next_live);
  }
  if (!s.live.empty()) return -2;
  return rows;
}

int64_t smm_stream_pack_cf(int64_t n_elems, int64_t n_groups, int64_t wrows,
                           const int64_t* group, const int64_t* sigma,
                           const int64_t* lam, const int64_t* nd,
                           int32_t* row_out, int32_t* lane_out,
                           int64_t* group_rows) {
  for (int64_t g = 0; g < n_groups; ++g) group_rows[g] = 0;
  if (n_elems == 0) return 0;
  int64_t nd_max = 0;
#pragma omp parallel for schedule(static) reduction(max : nd_max)
  for (int64_t i = 0; i < n_elems; ++i) {
    // negative nd poisons the max; checked after the loop
    const int64_t v = nd[i] < 0 ? (int64_t{1} << 40) : nd[i];
    if (v > nd_max) nd_max = v;
  }
  if (nd_max >= (int64_t{1} << 40)) return -1;
  const int64_t ndk = nd_max + 1;
  // group run boundaries (groups are dense ids, nondecreasing)
  std::vector<int64_t> starts;
  starts.reserve(n_groups + 1);
  int64_t prev = -1;
  for (int64_t i = 0; i < n_elems; ++i) {
    const int64_t g = group[i];
    if (g != prev) {
      if (g < 0 || g >= n_groups || g < prev) return -1;
      starts.push_back(i);
      prev = g;
    }
  }
  starts.push_back(n_elems);
  const int64_t n_runs = static_cast<int64_t>(starts.size()) - 1;
  int64_t max_rows = 0;
  int err = 0;
#pragma omp parallel
  {
    _PackScratch s;
#pragma omp for schedule(dynamic, 64) reduction(max : max_rows)
    for (int64_t k = 0; k < n_runs; ++k) {
      const int64_t e0 = starts[k], e1 = starts[k + 1];
      const int64_t g = group[e0];
      const int64_t rows = _pack_one_group(e0, e1, g, wrows, ndk, sigma,
                                           lam, nd, row_out, lane_out, s);
      if (rows < 0) {
#pragma omp atomic write
        err = static_cast<int>(rows);
        continue;
      }
      group_rows[g] = rows;
      if (rows > max_rows) max_rows = rows;
    }
  }
  if (err != 0) return err;
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

// Stable LSD radix-sort permutation of uint64 keys (parallel).
// perm_out[i] = index of the i-th smallest key (ties in input order).
void smm_sort_perm(int64_t n, const uint64_t* key, int key_bits,
                   int64_t* perm_out) {
  std::lock_guard<std::mutex> lk(g_ws_mutex);
  radix_sort_perm(n, key, key_bits, perm_out);
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

// Fused per-level reorder + grouping for the routed chain
// (formats/rsell.py:routed_from_csr's loop body up to _pack_pass):
//   1. prefix <- prefix*d + (leaf/wt)%d        (the level's bucket id)
//   2. stable sort all carried arrays by (prefix, pos) — key packed as
//      (prefix << pos_bits) | pos, key_bits total
//   3. nd <- (leaf/wt_next)%d_next, or slab_in_leaf when wt_next < 0
//   4. grouping as smm_stream_group
// prefix/pos/order/leaf/slab_in_leaf are updated IN PLACE (sorted).
// Returns n_groups, or -1 on bad input.
int64_t smm_stream_level(int64_t n, int64_t wrows, int64_t d, int64_t wt,
                         int64_t d_next, int64_t wt_next, int64_t pos_bits,
                         int64_t key_bits, int64_t* prefix, int64_t* pos,
                         int64_t* order, int64_t* leaf,
                         int64_t* slab_in_leaf, int64_t* nd, int64_t* group,
                         int64_t* sigma, int64_t* lam,
                         int64_t* group_stack) {
  if (n <= 0 || wrows <= 0 || d <= 0 || wt <= 0 || pos_bits <= 0 ||
      key_bits <= pos_bits || key_bits > 64)
    return -1;
  std::lock_guard<std::mutex> lk(g_ws_mutex);
  static std::vector<uint64_t> key_ws;
  static std::vector<int64_t> perm_ws, scratch_ws;
  ws_reserve(key_ws, static_cast<size_t>(n));
  ws_reserve(perm_ws, static_cast<size_t>(n));
  ws_reserve(scratch_ws, static_cast<size_t>(n));
  std::vector<uint64_t>& key = key_ws;
  std::vector<int64_t>& perm = perm_ws;
  std::vector<int64_t>& scratch = scratch_ws;
  const uint64_t pos_mask = (pos_bits >= 64) ? ~0ull
                                             : ((1ull << pos_bits) - 1);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t p = static_cast<uint64_t>(prefix[i]) * d +
                       (static_cast<uint64_t>(leaf[i]) / wt) % d;
    key[i] = (p << pos_bits) | static_cast<uint64_t>(pos[i]);
  }
  radix_sort_perm(n, key.data(), static_cast<int>(key_bits), perm.data());
  // sorted prefix/pos come straight out of the gathered keys; the other
  // carried arrays permute through a scratch buffer
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t k = key[perm[i]];
    prefix[i] = static_cast<int64_t>(k >> pos_bits);
    pos[i] = static_cast<int64_t>(k & pos_mask);
  }
  apply_perm_inplace(n, perm.data(), order, scratch.data());
  apply_perm_inplace(n, perm.data(), leaf, scratch.data());
  apply_perm_inplace(n, perm.data(), slab_in_leaf, scratch.data());
  if (wt_next > 0) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) nd[i] = (leaf[i] / wt_next) % d_next;
  } else {
    std::memcpy(nd, slab_in_leaf, static_cast<size_t>(n) * sizeof(int64_t));
  }
  return smm_stream_group(n, wrows, prefix, pos, group, sigma, lam,
                          group_stack);
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
  // vals/out_pos slots are unique per element (one element per
  // (row, out-lane)); the two meta fields can land in the same int32
  // cell from two different elements, hence the atomic OR.
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const int64_t rg = row_off[group[i]] + row_in_group[i];
    const int64_t slot = (rg << 7) | out_lane[i];
    out_pos[i] = slot;
    if (dtype64)
      vd[slot] = 1.0;
    else
      vf[slot] = 1.0f;
    __atomic_fetch_or(&meta_plane[slot],
                      static_cast<int32_t>(lam[i]) << sw_bits,
                      __ATOMIC_RELAXED);
    __atomic_fetch_or(&meta_plane[(rg << 7) | lam[i]],
                      static_cast<int32_t>(sigma[i]), __ATOMIC_RELAXED);
  }
}

}  // extern "C"
