// Test-time bridge exposing the reference package's aligners through a
// C ABI so the parity fuzzer can call them via ctypes. The reference
// translation units are compiled UNMODIFIED from /root/reference/src
// against the stub Rcpp.h in this directory; nothing is vendored.
#include <cstring>
#include <stdexcept>

#include "dada.h"

extern "C" int ref_align(int which, const char *s1, int len1,
                         const char *s2, int len2, int match, int mismatch,
                         int gap_p, int end_gap_p, int homo_gap_p, int band,
                         char *out0, char *out1, int outcap) {
  char **al = nullptr;
  int score[4][4];
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) score[i][j] = (i == j) ? match : mismatch;
  try {
    switch (which) {
      case 0:
        al = nwalign_vectorized2(s1, len1, s2, len2, match, mismatch,
                                 gap_p, end_gap_p, band);
        break;
      case 1:
        al = nwalign_endsfree(s1, len1, s2, len2, score, gap_p, band);
        break;
      case 2:
        al = nwalign_endsfree_homo(s1, len1, s2, len2, score, gap_p,
                                   homo_gap_p, band);
        break;
      case 3:
        al = nwalign(s1, len1, s2, len2, score, gap_p, band);
        break;
      case 4:
        al = nwalign_gapless(s1, len1, s2, len2);
        break;
      default:
        return -2;
    }
  } catch (const std::exception &) {
    return -1;
  }
  if (al == nullptr) return -1;
  int L = (int)strlen(al[0]);
  if (L >= outcap) {
    L = -3;
  } else {
    memcpy(out0, al[0], L + 1);
    memcpy(out1, al[1], L + 1);
  }
  free(al[0]);
  free(al[1]);
  free(al);
  return L;
}

extern "C" double ref_kmer_dist(const char *s1, int len1, const char *s2,
                                int len2, int k, int sse) {
  // kmer vectors in the reference's contiguous layouts
  // (reference: src/Rmain.cpp:125-155, src/kmers.cpp)
  try {
    double d;
    if (sse == 2) {
      uint8_t *k8a = (uint8_t *)malloc(1 << (2 * k));
      uint8_t *k8b = (uint8_t *)malloc(1 << (2 * k));
      assign_kmer8(k8a, s1, k);
      assign_kmer8(k8b, s2, k);
      d = kmer_dist_SSEi_8(k8a, len1, k8b, len2, k);
      free(k8a);
      free(k8b);
      if (d < 0) {  // 8-bit overflow: reference falls back to 16-bit
        uint16_t *ka = (uint16_t *)malloc(sizeof(uint16_t) << (2 * k));
        uint16_t *kb = (uint16_t *)malloc(sizeof(uint16_t) << (2 * k));
        assign_kmer(ka, s1, k);
        assign_kmer(kb, s2, k);
        d = kmer_dist_SSEi(ka, len1, kb, len2, k);
        free(ka);
        free(kb);
      }
    } else {
      uint16_t *ka = (uint16_t *)malloc(sizeof(uint16_t) << (2 * k));
      uint16_t *kb = (uint16_t *)malloc(sizeof(uint16_t) << (2 * k));
      assign_kmer(ka, s1, k);
      assign_kmer(kb, s2, k);
      d = sse == 1 ? kmer_dist_SSEi(ka, len1, kb, len2, k)
                   : kmer_dist(ka, len1, kb, len2, k);
      free(ka);
      free(kb);
    }
    return d;
  } catch (const std::exception &) {
    return -99.0;
  }
}

extern "C" double ref_kord_dist(const char *s1, int len1, const char *s2,
                                int len2, int k, int sse) {
  try {
    uint16_t *ka = (uint16_t *)malloc(sizeof(uint16_t) * (len1 + 1));
    uint16_t *kb = (uint16_t *)malloc(sizeof(uint16_t) * (len2 + 1));
    std::string m1(s1, len1), m2(s2, len2);  // assign_kmer_order wants char*
    assign_kmer_order(ka, &m1[0], k);
    assign_kmer_order(kb, &m2[0], k);
    double d = sse >= 1 ? kord_dist_SSEi(ka, len1, kb, len2, k)
                        : kord_dist(ka, len1, kb, len2, k);
    free(ka);
    free(kb);
    return d;
  } catch (const std::exception &) {
    return -99.0;
  }
}

// filter kernels (reference: src/filter.cpp) ------------------------------

Rcpp::IntegerVector C_matchRef(std::vector<std::string> seqs,
                               std::string ref, unsigned int word_size,
                               bool non_overlapping);
Rcpp::NumericVector C_matrixEE(Rcpp::IntegerMatrix inp);

extern "C" void ref_match_ref(const char **seqs, int nseq, const char *ref,
                              int word_size, int non_overlapping,
                              long long *out) {
  std::vector<std::string> v(nseq);
  for (int i = 0; i < nseq; i++) v[i] = seqs[i];
  Rcpp::IntegerVector rv =
      C_matchRef(v, ref, word_size, non_overlapping != 0);
  for (int i = 0; i < nseq; i++) out[i] = rv[i];
}

extern "C" void ref_matrix_ee(const int *q, int nrow, int ncol,
                              double *out) {
  Rcpp::IntegerMatrix m(nrow, ncol);
  for (int i = 0; i < nrow; i++)
    for (int j = 0; j < ncol; j++)
      m(i, j) = q[(size_t)i * ncol + j];  // row-major input
  Rcpp::NumericVector rv = C_matrixEE(m);
  for (int i = 0; i < nrow; i++) out[i] = rv[i];
}
