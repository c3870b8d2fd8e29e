// Minimal Rcpp stub for compiling the reference's pure-C++ translation
// units at TEST time (the real Rcpp/R stack is not needed for those
// functions). Only the identifiers those files and dada.h actually touch
// are provided. Vectors/matrices are shared-storage proxies, like real
// Rcpp SEXP wrappers: copies alias the same data (chimera.cpp passes
// IntegerVectors by value into its RcppParallel worker and expects the
// writes to land in the caller's vectors).
#pragma once
#include <cfloat>
#include <cstdarg>
#include <cstdio>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

inline void Rprintf(const char *, ...) {}

#include <climits>
#include <cmath>

#include "rmath_ppois.h"
#define NA_INTEGER INT_MIN
#define NA_REAL (std::nan(""))

namespace Rcpp {

template <typename... Args>
[[noreturn]] inline void stop(const std::string &msg, Args...) {
  throw std::runtime_error(msg);
}

inline void checkUserInterrupt() {}

struct NilType {};  // stand-in for R_NilValue returns

// named-argument machinery: _["name"]=value
template <typename T>
struct Named_ {
  std::string name;
  T value;
};
struct NameProxy {
  std::string name;
  template <typename T>
  Named_<T> operator=(const T &v) const {
    return Named_<T>{name, v};
  }
};
struct NameFactory {
  NameProxy operator[](const char *s) const { return NameProxy{s}; }
  NameProxy operator[](const std::string &s) const { return NameProxy{s}; }
};
static const NameFactory _;

template <typename T>
class Vec {
 public:
  std::shared_ptr<std::vector<T>> p;
  Vec() : p(std::make_shared<std::vector<T>>()) {}
  explicit Vec(size_t n) : p(std::make_shared<std::vector<T>>(n)) {}
  Vec(size_t n, T fill) : p(std::make_shared<std::vector<T>>(n, fill)) {}
  Vec(NilType) : p(std::make_shared<std::vector<T>>()) {}
  T &operator()(size_t i) { return (*p)[i]; }
  T operator()(size_t i) const { return (*p)[i]; }
  T &operator[](size_t i) { return (*p)[i]; }
  T operator[](size_t i) const { return (*p)[i]; }
  size_t size() const { return p->size(); }
  T *begin() { return p->data(); }
  const T *begin() const { return p->data(); }
  T *end() { return p->data() + p->size(); }
  void push_back(const T &v) { p->push_back(v); }

  template <typename... A>
  static Vec create(const A &...args) {
    Vec out;
    (out.push_one(args), ...);
    return out;
  }
  void push_one(const T &v) { p->push_back(v); }
  template <typename U>
  void push_one(const Named_<U> &n) {
    p->push_back((T)n.value);
  }
};

using IntegerVector = Vec<int>;
using NumericVector = Vec<double>;
using LogicalVector = Vec<int>;

class CharacterVector {
 public:
  std::shared_ptr<std::vector<std::string>> p;
  explicit CharacterVector(size_t n = 0)
      : p(std::make_shared<std::vector<std::string>>(n)) {}
  CharacterVector(NilType) : p(std::make_shared<std::vector<std::string>>()) {}
  CharacterVector(const std::string &s)
      : p(std::make_shared<std::vector<std::string>>(1, s)) {}
  std::string &operator[](size_t i) { return (*p)[i]; }
  size_t size() const { return p->size(); }
  void push_back(const std::string &s) { p->push_back(s); }
};

template <typename T>
class Mat {
 public:
  int nr = 0, nc = 0;
  std::shared_ptr<std::vector<T>> p;  // column-major, as in R
  Mat() : p(std::make_shared<std::vector<T>>()) {}
  Mat(int r, int c)
      : nr(r), nc(c), p(std::make_shared<std::vector<T>>((size_t)r * c)) {}
  T &operator()(int i, int j) { return (*p)[i + (size_t)j * nr]; }
  T operator()(int i, int j) const { return (*p)[i + (size_t)j * nr]; }
  int nrow() const { return nr; }
  int ncol() const { return nc; }
  T *begin() { return p->data(); }
  const T *begin() const { return p->data(); }
};

using NumericMatrix = Mat<double>;
using IntegerMatrix = Mat<int>;

template <typename T>
inline T as(const NumericVector &x) {
  return (T)(*x.p)[0];
}

// name -> column containers readable by the test wrappers
class DataFrame {
 public:
  std::map<std::string, IntegerVector> iv;
  template <typename... A>
  static DataFrame create(const A &...args) {
    DataFrame df;
    (df.add(args), ...);
    return df;
  }
  void add(const Named_<IntegerVector> &n) { iv.emplace(n.name, n.value); }
};

class List {
 public:
  std::map<std::string, IntegerVector> iv;
  std::map<std::string, IntegerMatrix> im;
  std::map<std::string, NumericVector> nv;
  template <typename... A>
  static List create(const A &...args) {
    List l;
    (l.add(args), ...);
    return l;
  }
  void add(const Named_<IntegerVector> &n) { iv.emplace(n.name, n.value); }
  void add(const Named_<IntegerMatrix> &n) { im.emplace(n.name, n.value); }
  void add(const Named_<NumericVector> &n) { nv.emplace(n.name, n.value); }
};

// The Poisson upper tail defaults to the R-exact nmath algorithm
// (rmath_ppois.h — the same published math R's ppois uses, which the
// reference documents at src/pval.cpp:199-339), so the compiled
// reference engine runs its own p-value path end-to-end. A
// host-installed hook can still override it for experiments.
typedef double (*dada2_ppois_fn)(int, double);
inline dada2_ppois_fn &ppois_hook() {
  static dada2_ppois_fn fn = nullptr;
  return fn;
}

inline NumericVector ppois(IntegerVector q, double lambda, bool lower) {
  NumericVector out(q.size());
  for (size_t i = 0; i < q.size(); i++) {
    double upper = ppois_hook()
                       ? ppois_hook()(q[i], lambda)
                       : dada2_rmath::ppois_upper((double)q[i], lambda);
    out[i] = lower ? 1.0 - upper : upper;
  }
  return out;
}

// R's runif, likewise delegated to a host hook so the parity harness can
// feed the SAME uniform stream to the reference bootstraps and ours
// (reference: src/taxonomy.cpp:282-286 draws them via Rcpp::runif).
typedef void (*dada2_runif_fn)(double *, long long);
inline dada2_runif_fn &runif_hook() {
  static dada2_runif_fn fn = nullptr;
  return fn;
}

inline NumericVector runif(size_t n) {
  NumericVector out(n);
  if (runif_hook()) runif_hook()(out.begin(), (long long)n);
  return out;
}

}  // namespace Rcpp

static const Rcpp::NilType R_NilValue;

using namespace Rcpp;
