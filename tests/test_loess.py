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
