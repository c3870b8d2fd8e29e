// Serial stand-in for RcppParallel, sufficient to compile the
// reference's Worker-based translation units at test time. parallelFor
// simply invokes the worker once over the whole range (determinism is a
// feature here: the parity harness wants the serial semantics).
#pragma once
#include <cstddef>

namespace RcppParallel {

struct Worker {
  virtual ~Worker() {}
  virtual void operator()(std::size_t begin, std::size_t end) = 0;
};

inline void parallelFor(std::size_t begin, std::size_t end, Worker &w,
                        std::size_t = 1) {
  if (end > begin) w(begin, end);
}

}  // namespace RcppParallel
