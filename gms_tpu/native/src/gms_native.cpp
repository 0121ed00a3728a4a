// Native runtime components for gms_tpu.
//
// Role of the reference's C++ infrastructure that must stay native for
// production-scale graphs (SURVEY.md §2.14):
//   * edge-list text parsing        — gms/third_party/gapbs/reader.h:69-94
//     (ReadInEL); a mmap'd two-pass integer scanner, ~GB/s, replacing
//     numpy.loadtxt on the load path.
//   * exact degeneracy peel         — gms/algorithms/preprocessing/
//     sequential/degeneracy_matula.h:13-66 + util/core_number_evaluator.h;
//     the O(n+m) Batagelj–Zaversnik bucket peel is inherently sequential
//     pointer-chasing: exactly the code that belongs on the host CPU in
//     C++, not in Python and not on the TPU.
//   * CSR build (count/prefix/scatter + per-row sort/dedup "squish")
//     — gapbs/builder.h:145-298,204-251.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// edge-list parsing
// ---------------------------------------------------------------------------

// Count whitespace-separated integer tokens ignoring comment lines
// (leading '#' or '%'). Returns token count.
int64_t el_count_tokens(const char *buf, int64_t len) {
  int64_t count = 0;
  int64_t i = 0;
  while (i < len) {
    // skip leading spaces/tabs
    while (i < len && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r'))
      i++;
    if (i < len && (buf[i] == '#' || buf[i] == '%')) {
      while (i < len && buf[i] != '\n') i++;
    }
    while (i < len && buf[i] != '\n') {
      // token start?
      if (buf[i] != ' ' && buf[i] != '\t' && buf[i] != '\r') {
        count++;
        while (i < len && buf[i] != ' ' && buf[i] != '\t' &&
               buf[i] != '\n' && buf[i] != '\r')
          i++;
      } else {
        i++;
      }
    }
    if (i < len) i++;  // newline
  }
  return count;
}

// Parse the first two integer tokens of every non-comment line into
// out[2*k], out[2*k+1]; extra tokens per line (e.g. weights) are skipped.
// Returns the number of pairs written, or -1 on malformed input.
int64_t el_parse_pairs(const char *buf, int64_t len, int64_t *out,
                       int64_t max_pairs) {
  int64_t pairs = 0;
  int64_t i = 0;
  while (i < len) {
    while (i < len && (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r'))
      i++;
    if (i >= len) break;
    if (buf[i] == '#' || buf[i] == '%' || buf[i] == '\n') {
      while (i < len && buf[i] != '\n') i++;
      if (i < len) i++;
      continue;
    }
    int64_t vals[2];
    int got = 0;
    while (i < len && buf[i] != '\n') {
      if (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\r') {
        i++;
        continue;
      }
      bool neg = false;
      if (buf[i] == '-') { neg = true; i++; }
      if (i >= len || buf[i] < '0' || buf[i] > '9') {
        // non-numeric token: treat as float? accept digits before '.'
        return -1;
      }
      int64_t v = 0;
      while (i < len && buf[i] >= '0' && buf[i] <= '9') {
        v = v * 10 + (buf[i] - '0');
        i++;
      }
      // skip a fractional part if present (weights like "1.5")
      if (i < len && buf[i] == '.') {
        i++;
        while (i < len && buf[i] >= '0' && buf[i] <= '9') i++;
      }
      if (got < 2) vals[got] = neg ? -v : v;
      got++;
    }
    if (i < len) i++;  // newline
    if (got >= 2) {
      if (pairs >= max_pairs) return -1;
      out[2 * pairs] = vals[0];
      out[2 * pairs + 1] = vals[1];
      pairs++;
    } else if (got == 1) {
      return -1;
    }
  }
  return pairs;
}

// ---------------------------------------------------------------------------
// CSR build: count + prefix sum + scatter, then per-row sort/dedup (squish)
// ---------------------------------------------------------------------------

// edges: int64[2*m] (src,dst) already in final (possibly symmetrized) form.
// indptr: int64[n+1] out; indices: int32[m] out (capacity m).
// Returns number of stored edges after dedup/self-loop removal.
int64_t csr_build_squish(const int64_t *edges, int64_t m, int64_t n,
                         int64_t *indptr, int32_t *indices,
                         int drop_self_loops) {
  std::vector<int64_t> cnt(n + 1, 0);
  for (int64_t e = 0; e < m; ++e) cnt[edges[2 * e] + 1]++;
  for (int64_t v = 0; v < n; ++v) cnt[v + 1] += cnt[v];
  std::vector<int32_t> tmp(m);
  {
    std::vector<int64_t> cur(cnt.begin(), cnt.end() - 1);
    for (int64_t e = 0; e < m; ++e)
      tmp[cur[edges[2 * e]]++] = (int32_t)edges[2 * e + 1];
  }
  // per-row sort + unique + deloop, compacting into indices
  int64_t w = 0;
  for (int64_t v = 0; v < n; ++v) {
    int64_t b = cnt[v], e = cnt[v + 1];
    std::sort(tmp.begin() + b, tmp.begin() + e);
    indptr[v] = w;
    int32_t prev = -1;
    for (int64_t k = b; k < e; ++k) {
      int32_t x = tmp[k];
      if (x == prev) continue;
      if (drop_self_loops && x == (int32_t)v) { prev = x; continue; }
      indices[w++] = x;
      prev = x;
    }
  }
  indptr[n] = w;
  return w;
}

// ---------------------------------------------------------------------------
// exact degeneracy (Batagelj–Zaversnik bucket peel)
// ---------------------------------------------------------------------------

// indptr int64[n+1], indices int32[m]; rank/core int32[n] out.
// Returns the degeneracy.
int32_t degeneracy_peel(int64_t n, const int64_t *indptr,
                        const int32_t *indices, int32_t *rank,
                        int32_t *core) {
  if (n == 0) return 0;
  std::vector<int64_t> deg(n);
  int64_t max_deg = 0;
  for (int64_t v = 0; v < n; ++v) {
    deg[v] = indptr[v + 1] - indptr[v];
    if (deg[v] > max_deg) max_deg = deg[v];
  }
  std::vector<int64_t> bin(max_deg + 2, 0);
  for (int64_t v = 0; v < n; ++v) bin[deg[v] + 1]++;
  for (int64_t d = 0; d <= max_deg; ++d) bin[d + 1] += bin[d];
  std::vector<int64_t> pos(n), vert(n);
  {
    std::vector<int64_t> cur(bin.begin(), bin.end() - 1);
    for (int64_t v = 0; v < n; ++v) {
      pos[v] = cur[deg[v]]++;
      vert[pos[v]] = v;
    }
  }
  // bin[d] = start of bucket d
  int32_t degeneracy = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t v = vert[i];
    if ((int32_t)deg[v] > degeneracy) degeneracy = (int32_t)deg[v];
    core[v] = degeneracy;
    rank[v] = (int32_t)i;
    for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
      int64_t u = indices[k];
      if (deg[u] > deg[v]) {
        int64_t du = deg[u], pu = pos[u];
        int64_t pw = bin[du], wv = vert[pw];
        if (u != wv) {
          pos[u] = pw;
          pos[wv] = pu;
          vert[pu] = wv;
          vert[pw] = u;
        }
        bin[du]++;
        deg[u]--;
      }
    }
  }
  return degeneracy;
}

}  // extern "C"
