// CPU baseline: banded ends-free Needleman-Wunsch with DADA2 "vectorized
// aligner" semantics (clean-room implementation of the semantics documented
// in dada2_tpu/ops/nw_ref.py; models the work of the reference's
// nwalign_vectorized2 + al2subs hot path on one CPU core).
//
// Two-row rolling score buffers (no full-matrix clears), full pointer
// matrix written only on in-band cells, traceback + substitution
// extraction. Compiled -O3 so the inner band loop auto-vectorizes where
// possible, mirroring how the reference gets its SIMD (int16 antidiagonal
// loops, auto-vectorized).
//
// Input (little-endian): int32 n_pairs, band, match, mismatch, gap.
// Then per pair: int32 len1, len2, uint8 s1[len1], uint8 s2[len2].
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <vector>

static const int32_t NEG = -(1 << 29);

struct Result { int subs; int cols; };

static Result align_pair(const uint8_t* s1, int len1, const uint8_t* s2,
                         int len2, int band, int32_t match, int32_t mismatch,
                         int32_t gap, std::vector<int32_t>& row0,
                         std::vector<int32_t>& row1,
                         std::vector<int8_t>& p) {
  int lband = band, rband = band;
  if (band < 0) { lband = len1; rband = len2; }
  else if (len1 > len2) lband += len1 - len2;
  else if (len2 > len1) rband += len2 - len1;

  const int ncol = len2 + 1;
  if ((int)row0.size() < ncol + 1) { row0.resize(ncol + 1); row1.resize(ncol + 1); }
  if ((int)p.size() < (len1 + 1) * ncol) p.resize((size_t)(len1 + 1) * ncol);

  int32_t* prev = row0.data();
  int32_t* cur = row1.data();
  for (int j = 0; j <= len2; j++) prev[j] = (j <= rband) ? 0 : NEG;
  for (int j = 1; j <= rband && j <= len2; j++) p[j] = 2;

  const int j_first = len1 - lband > 1 ? len1 - lband : 1;
  const int i_first = len2 - rband > 1 ? len2 - rband : 1;

  for (int i = 1; i <= len1; i++) {
    int lo = i - lband > 1 ? i - lband : 1;
    int hi = i + rband < len2 ? i + rband : len2;
    int8_t* pi = &p[(size_t)i * ncol];
    const uint8_t c1 = s1[i - 1];
    // left edge of the band in this row: column 0 boundary or out-of-band
    cur[lo - 1] = (lo == 1 && i <= lband) ? 0 : NEG;
    if (lo == 1 && i <= lband) pi[0] = 3;
    for (int j = lo; j <= hi; j++) {
      int32_t U = prev[j] + gap;
      int32_t L = cur[j - 1] + gap;
      int32_t D = prev[j - 1] + (c1 == s2[j - 1] ? match : mismatch);
      int32_t e; int8_t ptr;
      if (U >= L) { e = U; ptr = 3; } else { e = L; ptr = 2; }
      if (D > e) { e = D; ptr = 1; }
      if (i == len1 && j > j_first) {           // ends-free last row
        int32_t cand = cur[j - 1];
        if (cand > e) { e = cand; ptr = 2; }
        else if (cand == e && ptr == 1) ptr = 2;
      }
      if (j == len2 && i > i_first) {           // ends-free last col
        int32_t cand = prev[j];
        if (cand > e) { e = cand; ptr = 3; }
        else if (cand == e && ptr != 3) ptr = 3;
      }
      cur[j] = e; pi[j] = ptr;
    }
    if (hi + 1 <= len2) cur[hi + 1] = NEG;  // right out-of-band guard
    int32_t* t = prev; prev = cur; cur = t;
  }

  // traceback + substitution extraction (models al2subs)
  int i = len1, j = len2, subs = 0, cols = 0;
  while (i > 0 || j > 0) {
    int8_t ptr = p[(size_t)i * ncol + j];
    if (ptr == 1) { i--; j--; if (s1[i] != s2[j]) subs++; }
    else if (ptr == 2) { j--; }
    else if (ptr == 3) { i--; }
    else break;
    cols++;
  }
  return {subs, cols};
}

int main() {
  int32_t hdr[5];
  if (fread(hdr, 4, 5, stdin) != 5) return 1;
  int n = hdr[0], band = hdr[1];
  int32_t match = hdr[2], mismatch = hdr[3], gap = hdr[4];
  std::vector<std::vector<uint8_t>> s1s(n), s2s(n);
  for (int k = 0; k < n; k++) {
    int32_t l[2];
    if (fread(l, 4, 2, stdin) != 2) return 1;
    s1s[k].resize(l[0]); s2s[k].resize(l[1]);
    if (fread(s1s[k].data(), 1, l[0], stdin) != (size_t)l[0]) return 1;
    if (fread(s2s[k].data(), 1, l[1], stdin) != (size_t)l[1]) return 1;
  }
  std::vector<int32_t> row0, row1; std::vector<int8_t> p;
  long total_subs = 0;
  auto t0 = std::chrono::steady_clock::now();
  int reps = 0;
  double elapsed = 0;
  do {
    for (int k = 0; k < n; k++) {
      Result r = align_pair(s1s[k].data(), (int)s1s[k].size(), s2s[k].data(),
                            (int)s2s[k].size(), band, match, mismatch, gap,
                            row0, row1, p);
      total_subs += r.subs;
    }
    reps++;
    elapsed = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
  } while (elapsed < 2.0);
  printf("{\"alignments_per_sec\": %.1f, \"reps\": %d, \"checksum\": %ld}\n",
         (double)n * reps / elapsed, reps, total_subs);
  return 0;
}
