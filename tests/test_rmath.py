"""R-exact Poisson tail (utils/rmath.py) validation.

Three layers:
1. Internal-constant self-checks (the stirlerr table against its own
   defining identity; pnorm regions against an mpmath oracle at the
   algorithm's design accuracy).
2. ppois_upper against arbitrary-precision mpmath across every pgamma
   branch the engine can reach, including the OMEGA_A deep tail.
3. Bit-identity fuzz of the Python implementation against the C++ twin
   (tests/refharness/rmath_ppois.h) that the compiled reference engine
   uses in the parity suite — proving both engines share one p-value
   semantics with no equalizing hook.

reference: src/pval.cpp:44-64 (calc_pA) and :199-339 (the documented
R pgamma machinery this implements).
"""
import ctypes
import math
import os
import random
import subprocess

import numpy as np
import pytest

from dada2_tpu.utils import rmath

mp = pytest.importorskip("mpmath")

HARNESS = os.path.join(os.path.dirname(__file__), "refharness")


# ---------------------------------------------------------------------------
# 1. internal constants
# ---------------------------------------------------------------------------

def test_stirlerr_table_integers():
    """Integer entries (the only ones this engine's integer shapes can
    reach) must satisfy stirlerr(n) = lgamma(n+1) - (n+.5)log n + n -
    log sqrt(2 pi) to double-precision roundoff."""
    for n in range(1, 16):
        expect = (math.lgamma(n + 1.0) - (n + 0.5) * math.log(n) + n
                  - rmath.M_LN_SQRT_2PI)
        got = rmath._stirlerr(float(n))
        assert got == pytest.approx(expect, rel=5e-15), n


def test_stirlerr_series_branches():
    mp.mp.dps = 50
    for n in [16.0, 30.0, 40.0, 100.0, 600.0]:
        true = float(mp.loggamma(n + 1)
                     - mp.log(mp.sqrt(2 * mp.pi * n))
                     - n * (mp.log(n) - 1))
        assert rmath._stirlerr(n) == pytest.approx(true, rel=1e-14), n


def test_bd0():
    mp.mp.dps = 50
    for x, np_ in [(5.0, 5.1), (100.0, 99.0), (3.0, 30.0), (1e4, 1e4 + 1),
                   (7.0, 0.5)]:
        true = float(mp.mpf(x) * mp.log(mp.mpf(x) / mp.mpf(np_))
                     + mp.mpf(np_) - mp.mpf(x))
        assert rmath._bd0(x, np_) == pytest.approx(true, rel=1e-13,
                                                   abs=1e-300)


@pytest.mark.parametrize("lower", [True, False])
def test_pnorm_regions_vs_mpmath(lower):
    """All three Cody regions at design accuracy (R's pnorm is accurate
    to ~1e-15 relative; the small-tail side of region 2 to ~3e-15)."""
    mp.mp.dps = 60
    rng = random.Random(11)
    xs = ([rng.uniform(-0.674, 0.674) for _ in range(50)]
          + [rng.uniform(0.675, 5.656) for _ in range(100)]
          + [rng.uniform(-5.656, -0.675) for _ in range(100)]
          + [rng.uniform(5.66, 37.0) for _ in range(50)]
          + [rng.uniform(-37.0, -5.66) for _ in range(50)])
    for x in xs:
        mine = rmath._pnorm(x, lower, False)
        true = mp.ncdf(mp.mpf(repr(x))) if lower else \
            mp.ncdf(-mp.mpf(repr(x)))
        t = float(true)
        if t == 0.0:
            assert mine == 0.0
            continue
        # exp(-x^2/2) carries ~(x^2/2)*eps relative error — intrinsic
        # to R's algorithm too; constants errors would show at >=1e-9
        tol = 5e-15 + 0.5 * x * x * 3e-16
        assert abs(mine - t) / t < tol, (x, lower, mine, t)


def test_pnorm_log_path():
    mp.mp.dps = 400
    for x in [-30.0, -10.0, -5.0, -1.0, 0.3, 2.0, 8.0, 20.0]:
        mine = rmath._pnorm(x, True, True)
        true = float(mp.log(mp.ncdf(mp.mpf(repr(x)))))
        if true == 0.0:
            assert abs(mine) < 1e-80
        else:
            assert abs(mine - true) / abs(true) < 5e-14, (x, mine, true)


# ---------------------------------------------------------------------------
# 2. ppois_upper vs mpmath across every pgamma branch
# ---------------------------------------------------------------------------

def _true_upper(x, lam):
    """P(X > x) for X~Poisson(lam) = regularized lower gamma(x+1, lam)."""
    try:
        return mp.gammainc(x + 1, 0, mp.mpf(repr(lam)), regularized=True)
    except Exception:
        return 1 - mp.gammainc(x + 1, mp.mpf(repr(lam)), mp.inf,
                               regularized=True)


def test_ppois_upper_branches():
    mp.mp.dps = 120
    rng = random.Random(1)
    cases = []
    for _ in range(400):
        reads = rng.choice([1, 2, 3, 5, 8, 13, 40, 100, 317, 1000, 5000,
                            31623, 100000])
        regime = rng.random()
        if regime < 0.3:
            E = rng.uniform(1e-12, 0.99)        # pgamma_smallx
        elif regime < 0.6:
            E = reads * rng.uniform(0.01, 0.95)  # pd_upper_series
        elif regime < 0.85:
            E = reads * rng.uniform(1.05, 50)    # pd_lower_series
        else:
            E = reads * rng.uniform(0.8, 1.25)   # ppois_asymp
        cases.append((reads - 1, E))
    # the deep OMEGA_A tail explicitly
    cases += [(49, 1.0), (99, 2.0), (39, 0.1), (9, 1e-6), (4, 1e-9)]
    for x, lam in cases:
        mine = rmath.ppois_upper(x, lam)
        t = float(_true_upper(x, lam))
        if t == 0.0 or t < 5e-324:
            continue  # oracle below double range
        if t < 1e-290:
            tol = 1e-11   # R redoes these in log space; accuracy ~1e-12
        else:
            tol = 2e-12
        assert abs(mine - t) / t < tol, (x, lam, mine, t)


def test_ppois_upper_edges():
    assert rmath.ppois_upper(-1, 2.0) == 1.0
    assert rmath.ppois_upper(5, 0.0) == 0.0
    assert math.isnan(rmath.ppois_upper(5, -1.0))
    # reads=1 (x=0): P(X > 0) = 1 - exp(-lam)
    for lam in [1e-10, 0.5, 3.0, 40.0]:
        assert rmath.ppois_upper(0, lam) == pytest.approx(
            -math.expm1(-lam), rel=1e-14)


# ---------------------------------------------------------------------------
# 3. bit-identity with the C++ twin used by the reference engine
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cpp_ppois(tmp_path_factory):
    src = os.path.join(str(tmp_path_factory.mktemp("rmath")), "shim.cpp")
    with open(src, "w") as f:
        f.write('#include "rmath_ppois.h"\n'
                'extern "C" double ref_ppois_upper(double x, double l) {\n'
                '  return dada2_rmath::ppois_upper(x, l);\n}\n')
    so = src[:-4] + ".so"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
         "-fPIC", "-I", HARNESS, "-o", so, src],
        check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.ref_ppois_upper.restype = ctypes.c_double
    lib.ref_ppois_upper.argtypes = [ctypes.c_double, ctypes.c_double]
    return lib


def test_python_cpp_bit_identity(cpp_ppois):
    """The engine under test (Python rmath) and the compiled reference
    engine (C++ rmath_ppois.h) must produce BIT-IDENTICAL p-values over
    the full branch space — this is what lets the engine-parity suite
    run with no ppois hook."""
    rng = random.Random(202)
    checked = 0
    for _ in range(5000):
        reads = rng.choice([1, 2, 3, 4, 6, 10, 25, 77, 240, 1111, 4999,
                            20000, 100000])
        regime = rng.random()
        if regime < 0.25:
            E = rng.uniform(1e-300, 1e-10)
        elif regime < 0.5:
            E = rng.uniform(1e-10, 0.999)
        elif regime < 0.7:
            E = reads * rng.uniform(0.005, 0.999)
        elif regime < 0.9:
            E = reads * rng.uniform(1.001, 80)
        else:
            E = reads * rng.uniform(0.8, 1.25)
        py = rmath.ppois_upper(reads - 1, E)
        cc = cpp_ppois.ref_ppois_upper(float(reads - 1), E)
        assert np.float64(py).tobytes() == np.float64(cc).tobytes(), \
            (reads, E, py, cc)
        checked += 1
    assert checked == 5000


def test_calc_pA_uses_rmath():
    """calc_pA end-to-end: conditioning + Taylor fallback still exact
    (reference: src/pval.cpp:44-64)."""
    from dada2_tpu.ops.subs import calc_pA

    mp.mp.dps = 60
    for reads, E in [(5, 2.0), (2, 1e-9), (100, 3.0), (3, 1e-8)]:
        got = calc_pA(reads, E, prior=False)
        t = float(_true_upper(reads - 1, E))
        norm = 1.0 - math.exp(-E)
        if norm < 1e-7:
            norm = E - 0.5 * E * E
        assert got == pytest.approx(t / norm, rel=1e-11)


def test_native_batch_bit_identity_and_fallback(monkeypatch):
    """The production native batch (rmath_native.cpp) must be
    bit-identical to the Python implementation, and the fallback path
    must engage under DADA2_TPU_NATIVE=0."""
    from dada2_tpu.native import get_lib
    from dada2_tpu.utils.rmath import ppois_upper_vec

    rng = random.Random(7)
    xs, lams = [], []
    for _ in range(2000):
        reads = rng.choice([1, 2, 3, 5, 20, 100, 999, 31623])
        regime = rng.random()
        if regime < 0.4:
            E = rng.uniform(1e-300, 0.999)
        elif regime < 0.8:
            E = reads * rng.uniform(0.01, 30)
        else:
            E = reads * rng.uniform(0.8, 1.25)
        xs.append(float(reads - 1))
        lams.append(E)
    xs = np.array(xs)
    lams = np.array(lams)
    assert get_lib() is not None, "native build failed"
    native = ppois_upper_vec(xs, lams)
    monkeypatch.setenv("DADA2_TPU_NATIVE", "0")
    pure = ppois_upper_vec(xs, lams)
    assert native.tobytes() == pure.tobytes()
    expect = np.array([rmath.ppois_upper(x, l) for x, l in zip(xs, lams)])
    assert pure.tobytes() == expect.tobytes()
