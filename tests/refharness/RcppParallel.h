// Serial stand-in for RcppParallel, sufficient to compile the
// reference's Worker-based translation units at test time. parallelFor
// simply invokes the worker once over the whole range (determinism is a
// feature here: the parity harness wants the serial semantics).
#pragma once
#include <cstddef>

#include "Rcpp.h"

namespace RcppParallel {

// accessor views over the Rcpp stub's shared-storage vectors/matrices;
// holding the Rcpp object keeps the shared buffer alive (the reference
// constructs them from by-value Rcpp proxies)
namespace detail {
template <typename T>
struct rcpp_of;
template <>
struct rcpp_of<int> {
  using vec = Rcpp::IntegerVector;
  using mat = Rcpp::IntegerMatrix;
};
template <>
struct rcpp_of<double> {
  using vec = Rcpp::NumericVector;
  using mat = Rcpp::NumericMatrix;
};
}  // namespace detail

template <typename T>
class RMatrix {
  typename detail::rcpp_of<T>::mat m_;

 public:
  RMatrix(const typename detail::rcpp_of<T>::mat &m) : m_(m) {}
  const T *begin() const { return m_.begin(); }
  T *begin() { return m_.begin(); }
  std::size_t nrow() const { return m_.nrow(); }
  std::size_t ncol() const { return m_.ncol(); }
};

template <typename T>
class RVector {
  typename detail::rcpp_of<T>::vec v_;

 public:
  RVector(const typename detail::rcpp_of<T>::vec &v) : v_(v) {}
  T &operator[](std::size_t i) { return v_[i]; }
  T operator[](std::size_t i) const { return v_[i]; }
  std::size_t size() const { return v_.size(); }
};

struct Worker {
  virtual ~Worker() {}
  virtual void operator()(std::size_t begin, std::size_t end) = 0;
};

inline void parallelFor(std::size_t begin, std::size_t end, Worker &w,
                        std::size_t = 1) {
  if (end > begin) w(begin, end);
}

}  // namespace RcppParallel
