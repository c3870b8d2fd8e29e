// Test-time bridge exposing the reference package's chimera, pairwise
// evaluation, and taxonomy entry points through a C ABI so the parity
// fuzzer can call them via ctypes. The reference translation units
// (src/chimera.cpp, src/evaluate.cpp, src/taxonomy.cpp, src/misc.cpp)
// are compiled UNMODIFIED against the stub Rcpp.h in this directory;
// nothing is vendored.
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

#include "dada.h"

bool C_is_bimera(std::string sq, std::vector<std::string> pars,
                 bool allow_one_off, int min_one_off_par_dist, int match,
                 int mismatch, int gap_p, int max_shift);
Rcpp::DataFrame C_table_bimera2(Rcpp::IntegerMatrix mat,
                                std::vector<std::string> seqs,
                                double min_fold, int min_abund,
                                bool allow_one_off,
                                int min_one_off_par_dist, int match,
                                int mismatch, int gap_p, int max_shift);
Rcpp::CharacterVector C_nwalign(std::string s1, std::string s2, int match,
                                int mismatch, int gap_p, int homo_gap_p,
                                int band, bool endsfree);
Rcpp::IntegerVector C_eval_pair(std::string s1, std::string s2);
Rcpp::CharacterVector C_pair_consensus(std::string s1, std::string s2,
                                       int prefer, bool trim_overhang);
Rcpp::List C_assign_taxonomy2(std::vector<std::string> seqs,
                              std::vector<std::string> rcs,
                              std::vector<std::string> refs,
                              std::vector<int> ref_to_genus,
                              Rcpp::IntegerMatrix genusmat, bool try_rc,
                              bool verbose);

extern "C" void set_runif_hook(Rcpp::dada2_runif_fn fn) {
  Rcpp::runif_hook() = fn;
}

extern "C" int ref_is_bimera(const char *sq, const char **pars, int npar,
                             int allow_one_off, int min_one_off_par_dist,
                             int match, int mismatch, int gap_p,
                             int max_shift) {
  try {
    std::vector<std::string> v(npar);
    for (int i = 0; i < npar; i++) v[i] = pars[i];
    return C_is_bimera(sq, v, allow_one_off != 0, min_one_off_par_dist,
                       match, mismatch, gap_p, max_shift)
               ? 1
               : 0;
  } catch (const std::exception &) {
    return -1;
  }
}

extern "C" int ref_table_bimera2(const int *mat_colmajor, int nrow,
                                 int ncol, const char **seqs,
                                 double min_fold, int min_abund,
                                 int allow_one_off,
                                 int min_one_off_par_dist, int match,
                                 int mismatch, int gap_p, int max_shift,
                                 int *nflag, int *nsam) {
  try {
    Rcpp::IntegerMatrix mat(nrow, ncol);
    memcpy(mat.begin(), mat_colmajor, (size_t)nrow * ncol * sizeof(int));
    std::vector<std::string> v(ncol);
    for (int i = 0; i < ncol; i++) v[i] = seqs[i];
    Rcpp::DataFrame df = C_table_bimera2(
        mat, v, min_fold, min_abund, allow_one_off != 0,
        min_one_off_par_dist, match, mismatch, gap_p, max_shift);
    Rcpp::IntegerVector f = df.iv.at("nflag"), s = df.iv.at("nsam");
    for (int i = 0; i < ncol; i++) {
      nflag[i] = f[i];
      nsam[i] = s[i];
    }
    return 0;
  } catch (const std::exception &) {
    return -1;
  }
}

extern "C" int ref_nwalign_acgt(const char *s1, const char *s2, int match,
                                int mismatch, int gap_p, int homo_gap_p,
                                int band, int endsfree, char *out0,
                                char *out1, int outcap) {
  try {
    Rcpp::CharacterVector al = C_nwalign(s1, s2, match, mismatch, gap_p,
                                         homo_gap_p, band, endsfree != 0);
    int L = (int)al[0].size();
    if (L >= outcap) return -3;
    memcpy(out0, al[0].c_str(), L + 1);
    memcpy(out1, al[1].c_str(), L + 1);
    return L;
  } catch (const std::exception &) {
    return -1;
  }
}

extern "C" int ref_eval_pair(const char *s1, const char *s2, int *out3) {
  try {
    Rcpp::IntegerVector rv = C_eval_pair(s1, s2);
    if (rv.size() != 3) return -2;  // R_NilValue path (length mismatch)
    for (int i = 0; i < 3; i++) out3[i] = rv[i];
    return 0;
  } catch (const std::exception &) {
    return -1;
  }
}

extern "C" int ref_pair_consensus(const char *s1, const char *s2,
                                  int prefer, int trim_overhang, char *out,
                                  int outcap) {
  try {
    Rcpp::CharacterVector rv =
        C_pair_consensus(s1, s2, prefer, trim_overhang != 0);
    if (rv.size() != 1) return -2;
    int L = (int)rv[0].size();
    if (L >= outcap) return -3;
    memcpy(out, rv[0].c_str(), L + 1);
    return L;
  } catch (const std::exception &) {
    return -1;
  }
}

// ref_to_genus is 1-based (as the R caller passes it,
// reference: R/taxonomy.R:120-135); genusmat row-major [ngenus, nlevel].
// tax_out gets 1-based best-genus ids (NA_INTEGER for <50nt queries),
// boot_out the [nseq, nlevel] bootstrap level-agreement counts,
// boot_tax_out the [nseq, NBOOT] 1-based bootstrap genus draws.
extern "C" int ref_assign_taxonomy(const char **seqs, const char **rcs,
                                   int nseq, const char **refs, int nref,
                                   const int *ref_to_genus,
                                   const int *genusmat, int ngenus,
                                   int nlevel, int try_rc, int *tax_out,
                                   int *boot_out, int *boot_tax_out) {
  try {
    std::vector<std::string> vs(nseq), vr(nseq), vf(nref);
    for (int i = 0; i < nseq; i++) vs[i] = seqs[i];
    for (int i = 0; i < nseq; i++) vr[i] = rcs[i];
    for (int i = 0; i < nref; i++) vf[i] = refs[i];
    std::vector<int> r2g(ref_to_genus, ref_to_genus + nref);
    Rcpp::IntegerMatrix gm(ngenus, nlevel);
    for (int i = 0; i < ngenus; i++)
      for (int j = 0; j < nlevel; j++)
        gm(i, j) = genusmat[(size_t)i * nlevel + j];
    Rcpp::List res = C_assign_taxonomy2(vs, vr, vf, r2g, gm, try_rc != 0,
                                        false);
    Rcpp::IntegerVector tax = res.iv.at("tax");
    Rcpp::IntegerMatrix boot = res.im.at("boot");
    Rcpp::IntegerMatrix boot_tax = res.im.at("boot_tax");
    for (int i = 0; i < nseq; i++) tax_out[i] = tax[i];
    for (int i = 0; i < nseq; i++)
      for (int j = 0; j < nlevel; j++)
        boot_out[(size_t)i * nlevel + j] = boot(i, j);
    for (int i = 0; i < nseq; i++)
      for (int j = 0; j < boot_tax.ncol(); j++)
        boot_tax_out[(size_t)i * boot_tax.ncol() + j] = boot_tax(i, j);
    return boot_tax.ncol();  // NBOOT
  } catch (const std::exception &) {
    return -1;
  }
}
