// Minimal Rcpp stub for compiling the reference's pure-C++ aligner
// translation units at TEST time (the real Rcpp/R stack is not needed
// for those functions). Only the identifiers those files and dada.h
// actually touch are provided.
#pragma once
#include <cstdarg>
#include <cstdio>
#include <stdexcept>
#include <string>
#include <vector>

inline void Rprintf(const char *, ...) {}

#include <climits>
#include <cmath>
#define NA_INTEGER INT_MIN
#define NA_REAL (std::nan(""))

namespace Rcpp {

template <typename... Args>
[[noreturn]] inline void stop(const std::string &msg, Args...) {
  throw std::runtime_error(msg);
}

inline void checkUserInterrupt() {}

class CharacterVector {
 public:
  std::vector<std::string> v;
  explicit CharacterVector(size_t n = 0) : v(n) {}
  std::string &operator[](size_t i) { return v[i]; }
  size_t size() const { return v.size(); }
};

class NumericMatrix {
 public:
  int nr = 0, nc = 0;
  std::vector<double> data;  // column-major, as in R
  NumericMatrix() {}
  NumericMatrix(int r, int c) : nr(r), nc(c), data((size_t)r * c) {}
  double &operator()(int i, int j) { return data[i + (size_t)j * nr]; }
  double operator()(int i, int j) const {
    return data[i + (size_t)j * nr];
  }
  int nrow() const { return nr; }
  int ncol() const { return nc; }
};

class IntegerVector {
 public:
  std::vector<int> v;
  explicit IntegerVector(size_t n = 0) : v(n) {}
  int &operator()(size_t i) { return v[i]; }
  int &operator[](size_t i) { return v[i]; }
  size_t size() const { return v.size(); }
};

class NumericVector {
 public:
  std::vector<double> v;
  explicit NumericVector(size_t n = 0) : v(n) {}
  double &operator()(size_t i) { return v[i]; }
  double &operator[](size_t i) { return v[i]; }
  size_t size() const { return v.size(); }
};

template <typename T>
inline T as(const NumericVector &x) {
  return (T)x.v[0];
}

// The Poisson upper tail is delegated to a host-installed hook so the
// parity harness can hold the pval math COMMON between the reference
// engine and the engine under test (R's ppois itself is not available
// without an R installation; the hook is wired to the same
// scipy.special.pdtrc both engines then share).
typedef double (*dada2_ppois_fn)(int, double);
inline dada2_ppois_fn &ppois_hook() {
  static dada2_ppois_fn fn = nullptr;
  return fn;
}

inline NumericVector ppois(IntegerVector q, double lambda, bool lower) {
  NumericVector out(q.size());
  for (size_t i = 0; i < q.size(); i++) {
    double upper = ppois_hook() ? ppois_hook()(q.v[i], lambda) : 0.0;
    out.v[i] = lower ? 1.0 - upper : upper;
  }
  return out;
}

class IntegerMatrix {
 public:
  int nr = 0, nc = 0;
  std::vector<int> data;  // column-major, as in R
  IntegerMatrix() {}
  IntegerMatrix(int r, int c) : nr(r), nc(c), data((size_t)r * c) {}
  int &operator()(int i, int j) { return data[i + (size_t)j * nr]; }
  int operator()(int i, int j) const { return data[i + (size_t)j * nr]; }
  int nrow() const { return nr; }
  int ncol() const { return nc; }
};

// opaque placeholders: only referenced in dada.h declarations
class LogicalVector {};
class DataFrame {};
class List {};

}  // namespace Rcpp

using namespace Rcpp;
