"""Loess surfaces: R's default kd-tree interpolate scheme vs the exact
direct fit (reference: stats::loess defaults used by loessErrfun,
R/errorModels.R:28-67)."""
import numpy as np

from dada2_tpu.errors import (_kdtree_vertices, loess_errfun, loess_fit,
                              loess_interp_fit)


def test_quadratic_exact_both_surfaces():
    """A local quadratic fit reproduces quadratic data exactly; the
    Hermite blend of exact values/derivatives is then also exact."""
    rng = np.random.default_rng(3)
    x = np.arange(41, dtype=float)
    y = 0.01 * x ** 2 - 0.3 * x + 2.0
    w = rng.integers(1, 1000, 41).astype(float)
    xp = np.linspace(0, 40, 113)
    truth = 0.01 * xp ** 2 - 0.3 * xp + 2.0
    np.testing.assert_allclose(loess_fit(x, y, w, xp), truth, atol=1e-10)
    np.testing.assert_allclose(loess_interp_fit(x, y, w, xp), truth,
                               atol=1e-10)


def test_interpolate_agrees_at_vertices_and_between():
    rng = np.random.default_rng(5)
    x = np.arange(41, dtype=float)
    y = -2.5 - 0.05 * x + 0.1 * np.sin(x / 4) + rng.normal(0, 0.02, 41)
    w = rng.integers(1, 2000, 41).astype(float)
    d = loess_fit(x, y, w, x)
    i = loess_interp_fit(x, y, w, x)
    fc = max(int(np.floor(41 * 0.75 * 0.2)), 1)
    verts = _kdtree_vertices(np.sort(x), fc)
    assert 5 <= len(verts) <= 41
    vi = np.searchsorted(x, verts)
    # vertex evaluations ARE the exact local regression
    np.testing.assert_allclose(i[vi], d[vi], rtol=0, atol=1e-12)
    # between vertices the Hermite blend tracks the direct fit closely
    assert np.abs(i - d).max() < 0.02


def test_interpolate_no_extrapolation():
    x = np.arange(10, dtype=float)
    y = x * 0.1
    w = np.ones(10)
    out = loess_interp_fit(x, y, w, np.array([-0.5, 4.0, 9.0, 9.5]))
    assert np.isnan(out[0]) and np.isnan(out[3])
    assert np.isfinite(out[1]) and np.isfinite(out[2])


def test_kdtree_tie_adjustment():
    """Duplicated x values: the split searches outward for a splittable
    position and gives up (leaf) when none exists (loessf.f ehg124 incl.
    the 2006 tie fix)."""
    xs = np.sort(np.array([0., 1, 1, 1, 1, 1, 1, 1, 2]))
    verts = _kdtree_vertices(xs, 2)
    assert verts[0] == 0.0 and verts[-1] == 2.0
    assert np.all(np.isin(verts, xs))
    # all-identical points: no split possible
    np.testing.assert_array_equal(_kdtree_vertices(np.ones(9), 2),
                                  np.array([1.0]))


def test_errfun_surfaces_close():
    rng = np.random.default_rng(7)
    trans = rng.integers(0, 60, (16, 41)).astype(float)
    trans[[0, 5, 10, 15]] += 8000
    e_i = loess_errfun(trans)                       # default: interpolate
    e_d = loess_errfun(trans, surface="direct")
    assert np.abs(e_i - e_d).max() < 2e-3
    for base in range(4):
        np.testing.assert_allclose(
            e_i[4 * base: 4 * base + 4].sum(axis=0), 1.0, atol=1e-12)


def test_interp_degenerate_single_x():
    """A single distinct x (e.g. constant-quality data) must not NaN out:
    the Hermite blend collapses to the lone vertex value (R's loess
    rejects such input outright, so this is a defined extension)."""
    import numpy as np

    from dada2_tpu.errors import loess_interp_fit

    x = np.full(8, 35.0)
    y = np.linspace(-3, -2, 8)
    w = np.full(8, 10.0)
    out = loess_interp_fit(x, y, w, np.array([34.0, 35.0, 36.0]))
    assert np.isnan(out[0]) and np.isnan(out[2])
    assert np.isfinite(out[1])


# ---------------------------------------------------------------------------
# Independent validation (VERDICT r2 #10): no R/Fortran loess exists in
# this environment, so the direct surface is checked against a
# from-scratch high-precision oracle (mpmath normal equations — a
# different formulation AND solver than errors._local_poly's float64
# SVD lstsq), and the kd-tree build rules are property-tested.
# ---------------------------------------------------------------------------
import math

import pytest

mp = pytest.importorskip("mpmath")

from dada2_tpu.errors import (_kdtree_vertices, _loess_q, loess_fit,
                              loess_interp_fit)


def _oracle_local_fit(x, y, w, x0, span=0.75, degree=2):
    """Weighted local polynomial at x0 via 50-digit normal equations."""
    mp.mp.dps = 50
    n = len(x)
    q = max(int(math.floor(n * span)), degree + 1)
    q = min(q, n)
    d = np.abs(x - x0)
    idx = np.argsort(d, kind="stable")[:q]
    dmax = float(d[idx].max()) or 1.0
    rows, rhs = [], []
    W = []
    for i in idx:
        u = min(abs(float(x[i]) - x0) / dmax, 1.0)
        tri = (1 - mp.mpf(repr(u)) ** 3) ** 3
        W.append(tri * mp.mpf(repr(float(w[i]))))
        rows.append([mp.mpf(repr(float(x[i]) - x0)) ** j
                     for j in range(degree + 1)])
        rhs.append(mp.mpf(repr(float(y[i]))))
    A = mp.matrix(rows)
    Wm = mp.diag(W)
    AT = A.T
    beta = mp.lu_solve(AT * Wm * A, AT * Wm * mp.matrix(rhs))
    return float(beta[0])


def test_direct_surface_vs_independent_oracle():
    rng = np.random.default_rng(31)
    for trial in range(6):
        n = int(rng.integers(8, 41))
        x = np.sort(rng.uniform(0, 40, n))
        if trial % 2:
            x[:: 3] = np.round(x[:: 3])  # inject ties
        y = -3 + 0.05 * x + 0.002 * x * x + rng.normal(0, 0.1, n)
        w = rng.uniform(0.5, 200.0, n)
        xp = np.linspace(x.min(), x.max(), 23)
        got = loess_fit(x, y, w, xp)
        for k, x0 in enumerate(xp):
            want = _oracle_local_fit(x, y, w, float(x0))
            assert got[k] == pytest.approx(want, rel=1e-9, abs=1e-11), \
                (trial, x0)


def test_kdtree_cell_occupancy_property():
    """Distinct inputs: recursive lower-median splitting leaves at most
    fc points strictly between consecutive vertices (the published
    build rule's defining invariant)."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(5, 200))
        xs = np.sort(rng.uniform(0, 100, n))  # distinct w.p. 1
        fc = int(rng.integers(1, max(2, n // 2)))
        verts = _kdtree_vertices(xs, fc)
        assert verts[0] == xs[0] and verts[-1] == xs[-1]
        assert set(verts) <= set(xs)          # splits are data values
        # each half-open cell (v_i, v_{i+1}] holds <= fc points
        for i in range(len(verts) - 1):
            inside = np.sum((xs > verts[i]) & (xs <= verts[i + 1]))
            assert inside <= fc, (n, fc, i)
        # the leading cell includes its left endpoint
        assert np.sum((xs >= verts[0]) & (xs <= verts[1])) <= fc + 1


def test_kdtree_tie_rules_terminate_and_stay_on_data():
    """Heavily tied inputs (the integer quality scores the error model
    actually fits) must terminate, produce data-valued vertices, and
    never split between equal values."""
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(5, 300))
        xs = np.sort(rng.integers(0, 12, n).astype(np.float64))
        fc = int(rng.integers(1, 8))
        verts = _kdtree_vertices(xs, fc)
        assert set(verts) <= set(xs)
        # a vertex is a cell bound: the split point's value differs
        # from its right neighbour in the sorted data
        for v in verts[:-1]:
            nxt = xs[np.searchsorted(xs, v, side="right")]
            assert nxt != v


def test_interpolate_converges_to_direct_as_cells_shrink():
    """cell -> 0 makes every distinct x a vertex, where the Hermite
    blend evaluates the exact local regression: the interpolate surface
    must then equal the direct surface at the data points."""
    rng = np.random.default_rng(13)
    x = np.sort(rng.uniform(0, 40, 30))
    y = np.sin(x / 7) + rng.normal(0, 0.05, 30)
    w = rng.uniform(1, 50, 30)
    direct = loess_fit(x, y, w, x)
    interp = loess_interp_fit(x, y, w, x, cell=1e-9)
    np.testing.assert_allclose(interp, direct, rtol=1e-12, atol=1e-12)


def test_interpolate_is_c1_at_interior_vertices():
    """The Hermite blend must be C1: one-sided slopes at an interior
    vertex agree (they both equal the fitted derivative there)."""
    rng = np.random.default_rng(17)
    x = np.sort(rng.uniform(0, 40, 60))
    y = 0.1 * x + np.sin(x / 5) + rng.normal(0, 0.02, 60)
    w = np.ones(60)
    fc = max(int(math.floor(60 * 0.75 * 0.2)), 1)
    verts = _kdtree_vertices(np.sort(x), fc)
    eps = 1e-7
    for v in verts[1:-1]:
        pts = np.array([v - 2 * eps, v - eps, v + eps, v + 2 * eps])
        f = loess_interp_fit(x, y, w, pts)
        dl = (f[1] - f[0]) / eps
        dr = (f[3] - f[2]) / eps
        assert dl == pytest.approx(dr, rel=1e-4, abs=1e-5), v
