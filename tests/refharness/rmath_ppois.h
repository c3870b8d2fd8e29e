// The R-exact Poisson tail lives in the production native runtime; the
// parity harness shares the one implementation so the compiled
// reference engine and the engine under test use literally the same
// p-value code.
#pragma once
#include "../../dada2_tpu/native/rmath_ppois.h"
