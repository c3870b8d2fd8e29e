"""Native C++ data-loader parity with the Python dereplicator."""
import os

import numpy as np
import pytest


def _python_derep(path):
    os.environ["DADA2_TPU_NATIVE"] = "0"
    try:
        import importlib
        import dada2_tpu.native as nat
        nat._failed = True  # force fallback for this call
        from dada2_tpu.derep import derep_fastq
        return derep_fastq(path)
    finally:
        os.environ.pop("DADA2_TPU_NATIVE", None)
        import dada2_tpu.native as nat
        nat._failed = False


def test_native_matches_python(extdata):
    from dada2_tpu.native import derep_fastq_native
    from dada2_tpu.derep import derep_fastq

    path = str(extdata / "sam1F.fastq.gz")
    nat = derep_fastq_native(path)
    assert nat is not None, "native build failed"
    py = _python_derep(path)
    seqs_n, counts_n, quals_n, map_n = nat
    assert seqs_n == py.sequences
    np.testing.assert_array_equal(counts_n, py.abundances)
    np.testing.assert_array_equal(map_n, py.map)
    np.testing.assert_array_equal(quals_n, py.quals)  # bit-identical f64


def test_native_chunked_invariance(extdata):
    """Chunk size must not change the derep (reference example:
    R/sequenceIO.R:39-43)."""
    from dada2_tpu.native import derep_fastq_native

    path = str(extdata / "sam1F.fastq.gz")
    a = derep_fastq_native(path, 1_000_000)
    b = derep_fastq_native(path, 35)
    # same uniques/abundances up to tie order (the reference example also
    # compares after reindexing by name, R/sequenceIO.R:39-43)
    ua = dict(zip(a[0], a[1]))
    ub = dict(zip(b[0], b[1]))
    assert ua == ub
    order = [b[0].index(s) for s in a[0][:50]]
    np.testing.assert_allclose(a[2][:50], b[2][order], rtol=1e-12)


def test_native_is_default_path(extdata):
    import dada2_tpu.native as nat
    from dada2_tpu.derep import derep_fastq

    assert nat.get_lib() is not None
    d = derep_fastq(str(extdata / "sam1F.fastq.gz"))
    assert len(d.uniques) == 896
    assert int(d.abundances.sum()) == 1500


def test_quality_type_offsets(tmp_path):
    """phred+64 decoding parity between the native and Python loaders."""
    from dada2_tpu.derep import derep_fastq
    from dada2_tpu.io.fastq import write_fastq

    seqs = ["ACGTACGT", "ACGTACGT", "TTTTAAAA"]
    q33 = ["IIIIIIII", "IIIIIIII", "########"]          # Q40 / Q2
    q64 = ["".join(chr(ord(c) + 31) for c in q) for q in q33]
    f33 = tmp_path / "p33.fastq"
    f64 = tmp_path / "p64.fastq"
    write_fastq(str(f33), [f"r{i}" for i in range(3)], seqs, q33)
    write_fastq(str(f64), [f"r{i}" for i in range(3)], seqs, q64)
    d33 = derep_fastq(str(f33))
    d64 = derep_fastq(str(f64), qualityType="SFastqQuality")
    assert d33.uniques == d64.uniques
    np.testing.assert_array_equal(d33.quals, d64.quals)
    d64py = _python_derep_qt(str(f64), "SFastqQuality")
    np.testing.assert_array_equal(d64.quals, d64py.quals)
    with pytest.raises(ValueError):
        derep_fastq(str(f33), qualityType="bogus")


def _python_derep_qt(path, qt):
    import dada2_tpu.native as nat
    nat._failed = True
    try:
        from dada2_tpu.derep import derep_fastq
        return derep_fastq(path, qualityType=qt)
    finally:
        nat._failed = False


def test_env_var_forces_fallback_after_load(extdata):
    """DADA2_TPU_NATIVE=0 must bypass an already-loaded native lib."""
    import dada2_tpu.native as nat

    assert nat.get_lib() is not None
    os.environ["DADA2_TPU_NATIVE"] = "0"
    try:
        assert nat.get_lib() is None
        assert nat.derep_fastq_native(str(extdata / "sam1F.fastq.gz")) is None
    finally:
        os.environ.pop("DADA2_TPU_NATIVE", None)
    assert nat.get_lib() is not None


def test_native_lambda_parity(extdata):
    """The native lambda kernels (dense / substitution-tile / gapless)
    must be bit-identical to the numpy fallback on real data — the
    sequential-f64 product order is the contract (CLAUDE.md
    invariant)."""
    import numpy as np

    from dada2_tpu.core.backend_tpu import TpuBackend
    from dada2_tpu.core.raws import make_rawset
    from dada2_tpu.data import tperr1
    from dada2_tpu.derep import derep_fastq
    from dada2_tpu.native import get_lib
    from dada2_tpu.options import DEFAULT_OPTIONS

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    d = derep_fastq(str(extdata / "sam1F.fastq.gz"))
    rs = make_rawset(d.sequences[:200], d.abundances[:200], None,
                     d.quals[:200])
    be = TpuBackend(rs, use_quals=True)
    err = np.hstack([tperr1()] + [tperr1()[:, -1:]] * 10)
    rng = np.random.default_rng(3)
    rows = rng.integers(0, rs.n, 64).astype(np.int64)

    def with_fallback(fn):
        os.environ["DADA2_TPU_NATIVE"] = "0"
        try:
            return fn()
        finally:
            os.environ.pop("DADA2_TPU_NATIVE", None)

    # gapless form
    lam_n = be._lam_gapless(0, rows, err)
    lam_p = with_fallback(lambda: be._lam_gapless(0, rows, err))
    np.testing.assert_array_equal(lam_n, lam_p)

    # dense form (int8-coded tvec straight from the gapless builder)
    tvec, _ = be._gapless_tvec_ham(0, rows)
    lam_n = be._lambdas(rows, tvec, err)
    lam_p = with_fallback(lambda: be._lambdas(rows, tvec, err))
    np.testing.assert_array_equal(lam_n, lam_p)

    # substitution-tile form: synthesize tiles from the dense tvec
    K = 24
    subs = np.full((len(rows), K), 0xFFFF, np.uint16)
    counts = np.zeros(len(rows), np.int64)
    for r, row in enumerate(rows):
        s1 = rs.seqs[row].astype(np.int64)
        diff = np.nonzero((tvec[r] != 5 * s1)
                          & (np.arange(rs.max_len) < rs.lens[row]))[0]
        diff = diff[:K]
        counts[r] = len(diff)
        nt0 = (tvec[r][diff].astype(np.int64) - s1[diff]) // 4
        subs[r, : len(diff)] = diff | (nt0.astype(np.uint16) << 14)
    lam_n = be._lam_subs(rows, subs, counts, err)
    lam_p = with_fallback(lambda: be._lam_subs(rows, subs, counts, err))
    np.testing.assert_array_equal(lam_n, lam_p)


def test_native_exp_neg_parity():
    """Native libm exp(-x) batch must be bit-identical to the Python
    math.exp loop (both call libm; the reference's calc_pA norm term,
    src/pval.cpp:55)."""
    import math

    import numpy as np

    from dada2_tpu.native import exp_neg_native

    rng = np.random.default_rng(5)
    E = np.concatenate([
        rng.uniform(0, 1e-7, 200),          # Taylor-fallback region
        rng.uniform(1e-7, 50, 500),
        rng.uniform(50, 700, 100),
        [0.0, 1e-300, 700.0, 745.0]])
    out = exp_neg_native(E)
    if out is None:
        import pytest
        pytest.skip("native lib unavailable")
    ref = np.array([math.exp(-e) for e in E])
    np.testing.assert_array_equal(out, ref)


def test_native_shuffle_best_parity():
    """Native fused best-E scan vs the numpy per-cluster loop: strict >
    semantics, ascending cluster order, engineered ties."""
    import numpy as np

    from dada2_tpu.native import shuffle_best_native

    rng = np.random.default_rng(9)
    n = 500
    c0lam = rng.uniform(0, 1, n)
    c0ham = rng.integers(0, 50, n)
    c0reads = 321.0
    nclust = 7
    parts = []
    for k in range(nclust):
        m = int(rng.integers(0, 200))
        idx = rng.choice(n, size=m, replace=False).astype(np.int64)
        lam = rng.uniform(0, 1, m)
        ham = rng.integers(0, 50, m).astype(np.int64)
        parts.append((idx, lam, ham))
    bireads = rng.integers(1, 1000, nclust).astype(np.float64)
    # engineered exact ties: cluster 3 replays cluster 1's first entries
    # with lambda scaled so e matches exactly
    if len(parts[1][0]) >= 4:
        i4, l4, h4 = parts[3]
        tie_idx = parts[1][0][:4]
        tie_lam = parts[1][1][:4] * bireads[1] / bireads[3]
        parts[3] = (np.concatenate([i4, tie_idx]),
                    np.concatenate([l4, tie_lam]),
                    np.concatenate([h4, np.full(4, 99)]))
    offs = np.zeros(nclust + 1, np.int64)
    for k, p in enumerate(parts):
        offs[k + 1] = offs[k] + len(p[0])
    fidx = np.concatenate([p[0] for p in parts])
    flam = np.concatenate([p[1] for p in parts])
    fham = np.concatenate([p[2] for p in parts])

    out = shuffle_best_native(c0lam, c0ham, c0reads, offs, fidx, flam,
                              fham, bireads)
    if out is None:
        import pytest
        pytest.skip("native lib unavailable")
    best_i, best_lam, best_ham, emax = out

    # numpy reference loop (the engine's fallback path)
    emax_r = c0lam * c0reads
    bi_r = np.zeros(n, np.int64)
    bl_r = c0lam.copy()
    bh_r = c0ham.astype(np.int64).copy()
    for k, (idx, lam, ham) in enumerate(parts):
        e = lam * bireads[k]
        upd = e > emax_r[idx]
        ui = idx[upd]
        emax_r[ui] = e[upd]
        bi_r[ui] = k + 1
        bl_r[ui] = lam[upd]
        bh_r[ui] = ham[upd]
    np.testing.assert_array_equal(best_i, bi_r)
    np.testing.assert_array_equal(best_lam, bl_r)
    np.testing.assert_array_equal(best_ham, bh_r)
    np.testing.assert_array_equal(emax, emax_r)
