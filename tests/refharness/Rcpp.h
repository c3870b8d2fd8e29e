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

namespace Rcpp {

[[noreturn]] inline void stop(const std::string &msg) {
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

// opaque placeholders: only referenced in dada.h declarations
class NumericMatrix {};
class IntegerMatrix {};
class NumericVector {};
class IntegerVector {};
class LogicalVector {};
class DataFrame {};
class List {};

}  // namespace Rcpp

using namespace Rcpp;
