// Test-time bridge driving the reference package's divisive clustering
// engine (compiled UNMODIFIED from /root/reference/src) through its own
// C API, mirroring run_dada's protocol (reference: src/Rmain.cpp:297-336)
// and the raw/kmer setup (src/Rmain.cpp:100-165), then dumping the final
// partition state so the parity fuzzer can compare it against this
// repo's engine raw-for-raw.
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <vector>

#include "dada.h"

extern "C" void set_ppois_hook(Rcpp::dada2_ppois_fn fn) {
  Rcpp::ppois_hook() = fn;
}

// Direct handle on the harness's R-exact Poisson tail so the test suite
// can fuzz it bit-identical against dada2_tpu.utils.rmath.
extern "C" double ref_ppois_upper(double x, double lambda) {
  return dada2_rmath::ppois_upper(x, lambda);
}

extern "C" int run_ref_dada(
    int nraw, const char **seqs, const double *quals, int qstride,
    const int *reads, const unsigned char *priors, const double *err,
    int err_ncol, int match, int mismatch, int gap_pen, int homo_gap_pen,
    int use_kmers, double kdist_cutoff, int band_size, double omegaA,
    double omegaP, int detect_singletons, int max_clust, double min_fold,
    int min_hamming, int min_abund, int use_quals, int vectorized,
    int sse, int gapless, int greedy,
    /* outputs, caller-allocated */
    int *cluster_of, double *comp_lambda, int *comp_ham, double *pvals,
    double *e_minmax, int *centers, char *birth_types,
    double *birth_pvals) {
  try {
    Rcpp::NumericMatrix errMat(16, err_ncol);
    for (int j = 0; j < err_ncol; j++)
      for (int i = 0; i < 16; i++)
        errMat(i, j) = err[(size_t)i * err_ncol + j];  // row-major input

    size_t n_kmer = 1 << (2 * KMER_SIZE);
    size_t maxlen = 0;
    for (int r = 0; r < nraw; r++) {
      size_t L = strlen(seqs[r]);
      if (L > maxlen) maxlen = L;
    }
    std::vector<Raw *> raws(nraw);
    std::vector<uint8_t> k8((size_t)nraw * n_kmer);
    std::vector<uint16_t> k16((size_t)nraw * n_kmer);
    std::vector<uint16_t> kord((size_t)nraw * maxlen);
    for (int r = 0; r < nraw; r++) {
      size_t L = strlen(seqs[r]);
      std::vector<char> seq(seqs[r], seqs[r] + L + 1);
      std::vector<double> qual(L);
      if (use_quals)
        memcpy(qual.data(), quals + (size_t)r * qstride,
               L * sizeof(double));
      raws[r] = raw_new(seq.data(), use_quals ? qual.data() : nullptr,
                        reads[r], priors[r] != 0);
      raws[r]->index = r;
      if (use_kmers) {
        raws[r]->kmer8 = &k8[(size_t)r * n_kmer];
        assign_kmer8(raws[r]->kmer8, raws[r]->seq, KMER_SIZE);
        raws[r]->kmer = &k16[(size_t)r * n_kmer];
        assign_kmer(raws[r]->kmer, raws[r]->seq, KMER_SIZE);
        raws[r]->kord = &kord[(size_t)r * maxlen];
        assign_kmer_order(raws[r]->kord, raws[r]->seq, KMER_SIZE);
      } else {
        raws[r]->kmer8 = nullptr;
        raws[r]->kmer = nullptr;
        raws[r]->kord = nullptr;
      }
    }

    // the run_dada loop, serial flavor (reference: src/Rmain.cpp:297-336)
    B *bb = b_new(raws.data(), nraw, omegaA, omegaP, use_quals != 0);
    b_compare(bb, 0, errMat, match, mismatch, gap_pen, homo_gap_pen,
              use_kmers != 0, 1.0, band_size, vectorized != 0, sse,
              gapless != 0, greedy != 0, false);
    b_p_update(bb, greedy != 0, detect_singletons != 0);
    if (max_clust < 1) max_clust = bb->nraw;
    int newi = 0, nshuffle = 0;
    bool shuffled = false;
    while ((int)bb->nclust < max_clust &&
           (newi = b_bud(bb, min_fold, min_hamming, min_abund, false))) {
      b_compare(bb, newi, errMat, match, mismatch, gap_pen, homo_gap_pen,
                use_kmers != 0, kdist_cutoff, band_size, vectorized != 0,
                sse, gapless != 0, greedy != 0, false);
      nshuffle = 0;
      do {
        shuffled = b_shuffle2(bb);
      } while (shuffled && ++nshuffle < MAX_SHUFFLE);
      b_p_update(bb, greedy != 0, detect_singletons != 0);
    }

    int nclust = bb->nclust;
    for (int i = 0; i < nclust; i++) {
      Bi *bi = bb->bi[i];
      centers[i] = bi->center ? (int)bi->center->index : -1;
      birth_types[i] = bi->birth_type[0];
      birth_pvals[i] = bi->birth_pval;
      for (unsigned int r = 0; r < bi->nraw; r++) {
        Raw *raw = bi->raw[r];
        cluster_of[raw->index] = i;
        comp_lambda[raw->index] = raw->comp.lambda;
        comp_ham[raw->index] = (int)raw->comp.hamming;
        pvals[raw->index] = raw->p;
        e_minmax[raw->index] = raw->E_minmax;
      }
    }
    b_free(bb);
    for (int r = 0; r < nraw; r++) raw_free(raws[r]);
    return nclust;
  } catch (const std::exception &) {
    return -1;
  }
}
