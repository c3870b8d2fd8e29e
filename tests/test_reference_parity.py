"""Parity fuzz vs the ACTUAL reference implementation.

The reference package's aligner and k-mer translation units
(src/nwalign_vectorized.cpp, src/nwalign_endsfree.cpp, src/kmers.cpp) are
compiled UNMODIFIED from /root/reference at test time, behind the minimal
Rcpp stub in tests/refharness/, and fuzzed against this repo's semantic
oracle (ops/nw_ref.py). This grounds every downstream parity test (the
TPU kernels are parity-tested against the oracle) in the reference
itself, not in a second in-repo reading of it.
"""
import ctypes
import os
import subprocess

import numpy as np
import pytest

from dada2_tpu.ops import nw_ref
from dada2_tpu.encode import KMER_SIZE, kmer_counts, kmer_ords

REF_SRC = "/root/reference/src"
HARNESS = os.path.join(os.path.dirname(__file__), "refharness")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference sources not mounted")


@pytest.fixture(scope="module")
def reflib(tmp_path_factory):
    so = str(tmp_path_factory.mktemp("refbuild") / "refalign.so")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared", "-fPIC",
         "-I", HARNESS, "-I", REF_SRC, "-o", so,
         os.path.join(HARNESS, "wrapper.cpp"),
         os.path.join(REF_SRC, "filter.cpp"),
         os.path.join(REF_SRC, "nwalign_vectorized.cpp"),
         os.path.join(REF_SRC, "nwalign_endsfree.cpp"),
         os.path.join(REF_SRC, "kmers.cpp")],
        check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.ref_align.restype = ctypes.c_int
    lib.ref_align.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                              ctypes.c_char_p, ctypes.c_int] + \
        [ctypes.c_int] * 6 + [ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_int]
    for f in ("ref_kmer_dist", "ref_kord_dist"):
        fn = getattr(lib, f)
        fn.restype = ctypes.c_double
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                       ctypes.c_int, ctypes.c_int, ctypes.c_int]
    return lib


def _ref_align(lib, which, s1, s2, match, mismatch, gap_p, end_gap_p=0,
               homo_gap_p=0, band=16):
    """Call a reference aligner on our 0..3 code arrays; returns (a1, a2)
    in our conventions (codes 0..3, GAP=254) or None on its error."""
    cap = len(s1) + len(s2) + 2
    b0 = ctypes.create_string_buffer(cap)
    b1 = ctypes.create_string_buffer(cap)
    r1 = bytes((np.asarray(s1) + 1).astype(np.uint8))
    r2 = bytes((np.asarray(s2) + 1).astype(np.uint8))
    L = lib.ref_align(which, r1, len(s1), r2, len(s2), match, mismatch,
                      gap_p, end_gap_p, homo_gap_p, band, b0, b1, cap)
    if L < 0:
        return None

    def dec(buf):
        a = np.frombuffer(buf.raw[:L], dtype=np.uint8).astype(np.int16)
        return np.where(a == ord("-"), nw_ref.GAP, a - 1).astype(np.uint8)

    return dec(b0), dec(b1)


def _rand_pair(rng, lo=30, hi=260, maxshift=12):
    l1 = int(rng.integers(lo, hi))
    s1 = rng.integers(0, 4, l1).astype(np.uint8)
    s2 = s1.copy().tolist()
    # substitutions
    for _ in range(int(rng.integers(0, max(2, l1 // 6)))):
        p = int(rng.integers(0, len(s2)))
        s2[p] = int(rng.integers(0, 4))
    # indels
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(0, len(s2)))
        if rng.random() < 0.5 and len(s2) > lo:
            del s2[p]
        else:
            s2.insert(p, int(rng.integers(0, 4)))
    # end shifts (ends-free territory)
    shift = int(rng.integers(0, maxshift))
    if shift and rng.random() < 0.5:
        s2 = s2[shift:]
    elif shift:
        s2 = [int(rng.integers(0, 4)) for _ in range(shift)] + s2
    return s1, np.array(s2, dtype=np.uint8)


def _assert_alignment_equal(ours, refs, ctx):
    if refs is None:
        assert ours is None, f"{ctx}: reference errored, oracle did not"
        return
    assert ours is not None, f"{ctx}: oracle errored, reference did not"
    np.testing.assert_array_equal(ours[0], refs[0], err_msg=ctx)
    np.testing.assert_array_equal(ours[1], refs[1], err_msg=ctx)


def _oracle(s1, s2, mode, match, mismatch, gap_p, end_gap_p, band,
            homo_gap_p=None):
    try:
        return nw_ref.nw_align_ref(s1, s2, match, mismatch, gap_p,
                                   end_gap_p=end_gap_p, band=band,
                                   mode=mode, homo_gap_p=homo_gap_p)
    except RuntimeError:
        return None


def test_vectorized_parity(reflib):
    """Oracle vec mode == nwalign_vectorized2, incl. band widening, the
    swap variant and ends-free boundary recalc (reference:
    src/nwalign_vectorized.cpp:71-318)."""
    rng = np.random.default_rng(7)
    params = [(5, -4, -8), (1, -64, -64), (4, -5, -7)]
    for trial in range(300):
        s1, s2 = _rand_pair(rng)
        match, mismatch, gap_p = params[trial % len(params)]
        band = int(rng.choice([4, 8, 16, 32, 64]))
        for end_gap_p in (0, gap_p):
            ctx = f"vec trial={trial} band={band} egp={end_gap_p}"
            refs = _ref_align(reflib, 0, s1, s2, match, mismatch, gap_p,
                              end_gap_p=end_gap_p, band=band)
            ours = _oracle(s1, s2, "vec", match, mismatch, gap_p,
                           end_gap_p, band)
            _assert_alignment_equal(ours, refs, ctx)


def test_scalar_endsfree_parity(reflib):
    """Oracle scalar mode == nwalign_endsfree (reference:
    src/nwalign_endsfree.cpp:76-216)."""
    rng = np.random.default_rng(11)
    for trial in range(150):
        s1, s2 = _rand_pair(rng)
        band = int(rng.choice([0, 8, 16, 32]))
        ctx = f"ef trial={trial} band={band}"
        refs = _ref_align(reflib, 1, s1, s2, 5, -4, -8, band=band)
        ours = _oracle(s1, s2, "scalar", 5, -4, -8, 0, band)
        _assert_alignment_equal(ours, refs, ctx)


def test_scalar_global_parity(reflib):
    """Oracle scalar mode with end_gap_p == gap_p == nwalign (reference:
    src/nwalign_endsfree.cpp:403-537)."""
    rng = np.random.default_rng(13)
    for trial in range(150):
        s1, s2 = _rand_pair(rng)
        band = int(rng.choice([0, 8, 16, 32]))
        ctx = f"global trial={trial} band={band}"
        refs = _ref_align(reflib, 3, s1, s2, 5, -4, -8, band=band)
        ours = _oracle(s1, s2, "scalar", 5, -4, -8, -8, band)
        _assert_alignment_equal(ours, refs, ctx)


def test_homopolymer_parity(reflib):
    """Oracle homopolymer variant == nwalign_endsfree_homo (reference:
    src/nwalign_endsfree.cpp:220-396)."""
    rng = np.random.default_rng(17)
    for trial in range(150):
        s1, s2 = _rand_pair(rng)
        # inject homopolymer runs, the variant's raison d'etre
        for _ in range(3):
            p = int(rng.integers(0, len(s1) - 8))
            s1[p: p + int(rng.integers(3, 8))] = int(rng.integers(0, 4))
        band = int(rng.choice([0, 16, 32]))
        hgp = int(rng.choice([-1, -2, -4]))
        ctx = f"homo trial={trial} band={band} hgp={hgp}"
        refs = _ref_align(reflib, 2, s1, s2, 5, -4, -8, homo_gap_p=hgp,
                          band=band)
        ours = _oracle(s1, s2, "scalar", 5, -4, -8, 0, band,
                       homo_gap_p=hgp)
        _assert_alignment_equal(ours, refs, ctx)


def test_gapless_parity(reflib):
    rng = np.random.default_rng(19)
    for _ in range(50):
        s1, s2 = _rand_pair(rng)
        refs = _ref_align(reflib, 4, s1, s2, 5, -4, -8)
        ours = nw_ref.nw_gapless(s1, s2)
        _assert_alignment_equal(tuple(ours), refs, "gapless")


def test_kmer_screen_parity(reflib):
    """The backend's integer min-sum/kord screens reproduce the
    reference's kmer_dist / kord_dist at every SSE level (reference:
    src/kmers.cpp)."""
    rng = np.random.default_rng(23)
    k = KMER_SIZE
    for trial in range(200):
        s1, s2 = _rand_pair(rng, lo=40, hi=300)
        l1, l2 = len(s1), len(s2)
        L = max(l1, l2)
        seqs = np.full((2, L), 255, np.uint8)
        seqs[0, :l1] = s1
        seqs[1, :l2] = s2
        lens = np.array([l1, l2])
        km = kmer_counts(seqs, lens)
        ko = kmer_ords(seqs, lens)
        minsum = int(np.minimum(km[0], km[1]).sum())
        our_kdist = 1.0 - minsum / (min(l1, l2) - k + 1.0)
        minklen = min(l1, l2) - (k - 1)
        kmatch = int(((ko[0, :minklen] == ko[1, :minklen]) &
                      (ko[0, :minklen] >= 0)).sum())
        our_kord = 1.0 - kmatch / (min(l1, l2) - k + 1.0)
        r1 = bytes((s1 + 1).astype(np.uint8))
        r2 = bytes((s2 + 1).astype(np.uint8))
        for sse in (0, 1, 2):
            rd = reflib.ref_kmer_dist(r1, l1, r2, l2, k, sse)
            assert abs(rd - our_kdist) < 1e-12, (trial, sse, rd, our_kdist)
        for sse in (0, 1):
            if sse == 0 and l1 != l2:
                continue  # scalar kord_dist returns 1 on length mismatch
            rd = reflib.ref_kord_dist(r1, l1, r2, l2, k, sse)
            assert abs(rd - our_kord) < 1e-12, (trial, sse, rd, our_kord)


# ---------------------------------------------------------------------------
# Engine-level parity: the reference's divisive clustering engine
# (cluster.cpp / containers.cpp / pval.cpp), compiled unmodified and driven
# through its own C API exactly as run_dada drives it, vs this repo's Engine
# on real MiSeq data. The reference engine computes its Poisson tails with
# its OWN C++ build of R's pgamma machinery (refharness/rmath_ppois.h, the
# math the reference documents at src/pval.cpp:199-339); no equalizing hook
# is installed, so lambdas, pvals, E_minmax pruning, shuffles, budding and
# greedy locks are all covered end-to-end.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def refengine(tmp_path_factory):
    so = str(tmp_path_factory.mktemp("refeng") / "refengine.so")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared", "-fPIC",
         "-I", HARNESS, "-I", REF_SRC, "-o", so,
         os.path.join(HARNESS, "engine_wrapper.cpp")] +
        [os.path.join(REF_SRC, f) for f in
         ("cluster.cpp", "containers.cpp", "pval.cpp",
          "nwalign_vectorized.cpp", "nwalign_endsfree.cpp", "kmers.cpp")],
        check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.run_ref_dada.restype = ctypes.c_int
    return lib


@pytest.mark.parametrize("overrides,pallas,use_priors", [
    ({}, False, False),                          # production defaults
    ({}, True, False),  # pallas route incl. shortlisted compare fetch
    ({"GAPLESS": False, "GREEDY": False}, False, False),  # no screens
    ({"DETECT_SINGLETONS": True, "BAND_SIZE": 32}, False, False),
    ({"OMEGA_A": 1e-10, "MIN_HAMMING": 2}, False, False),  # more buds
    # prior sequences: the OMEGA_P birth path (reference:
    # src/cluster.cpp:313-349 "P"-type buds) and MIN_FOLD screening,
    # through the pallas route so the store screen sees prior raws
    ({"OMEGA_A": 1e-60, "OMEGA_P": 1e-2, "MIN_FOLD": 2.0}, True, True),
    # the PacBio path: homopolymer gap penalty forces the scalar
    # aligner (VECTORIZED_ALIGNMENT off via normalization, dada.R:232)
    ({"HOMOPOLYMER_GAP_PENALTY": -1, "BAND_SIZE": 32}, False, False),
])
def test_engine_parity_sam1F(refengine, overrides, pallas, use_priors,
                             monkeypatch):
    if pallas:
        monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    """Full clustering run on sam1F + tperr1: cluster assignments,
    comparison lambdas/hammings, p-values, E_minmax, centers and birth
    records must match the reference engine exactly."""
    from dada2_tpu.core.backend_tpu import TpuBackend
    from dada2_tpu.core.engine import Engine
    from dada2_tpu.core.raws import make_rawset
    from dada2_tpu.data import tperr1
    from dada2_tpu.derep import derep_fastq
    from dada2_tpu.options import DEFAULT_OPTIONS

    extdata = os.path.join(os.path.dirname(__file__), "extdata")
    d = derep_fastq(os.path.join(extdata, "sam1F.fastq.gz"))
    N = 300  # most-abundant uniques; keeps the python-driven run quick
    seqs = d.sequences[:N]
    ab = d.abundances[:N]
    quals = d.quals[:N]

    err = tperr1()
    qmax = int(np.nanmax(quals))
    if qmax + 1 > err.shape[1]:
        err = np.hstack([err] + [err[:, -1:]] * (qmax + 1 - err.shape[1]))

    # --- reference engine (runs its own R-exact ppois; no hook) ---
    n = len(seqs)
    code = {"A": 1, "C": 2, "G": 3, "T": 4}
    enc = [bytes(code[c] for c in s) for s in seqs]
    arr = (ctypes.c_char_p * n)(*enc)
    qstride = quals.shape[1]
    qflat = np.ascontiguousarray(np.nan_to_num(quals, nan=0.0))
    reads = np.ascontiguousarray(ab, dtype=np.int32)
    priors = np.zeros(n, np.uint8)
    if use_priors:
        priors[5::17] = 1    # arbitrary non-center raws flagged priors
    errflat = np.ascontiguousarray(err)
    cluster_of = np.full(n, -1, np.int32)
    comp_lambda = np.zeros(n)
    comp_ham = np.zeros(n, np.int32)
    pvals = np.zeros(n)
    e_minmax = np.zeros(n)
    centers = np.full(n, -1, np.int32)
    btypes = ctypes.create_string_buffer(n)
    bpvals = np.zeros(n)

    def P(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    opts = DEFAULT_OPTIONS.replace(**overrides).normalized()
    homo_gap = (opts.HOMOPOLYMER_GAP_PENALTY
                if opts.HOMOPOLYMER_GAP_PENALTY is not None
                else opts.GAP_PENALTY)
    nclust = refengine.run_ref_dada(
        n, arr, P(qflat), qstride, P(reads), P(priors), P(errflat),
        err.shape[1], opts.MATCH, opts.MISMATCH, opts.GAP_PENALTY,
        homo_gap, int(opts.USE_KMERS),
        ctypes.c_double(opts.KDIST_CUTOFF), opts.BAND_SIZE,
        ctypes.c_double(opts.OMEGA_A), ctypes.c_double(opts.OMEGA_P),
        int(opts.DETECT_SINGLETONS), 0, ctypes.c_double(opts.MIN_FOLD),
        opts.MIN_HAMMING, opts.MIN_ABUNDANCE, 1,
        int(opts.VECTORIZED_ALIGNMENT), opts.SSE,
        int(opts.GAPLESS), int(opts.GREEDY),
        P(cluster_of), P(comp_lambda), P(comp_ham), P(pvals),
        P(e_minmax), P(centers), btypes, P(bpvals))
    assert nclust > 1

    # --- our engine ---
    rs = make_rawset(seqs, ab, priors != 0, quals)
    be = TpuBackend(rs, use_quals=True)
    be.SHORTLIST_MIN_N = 0    # exercise the shortlisted compare fetch
    be.SHORTLIST_M0 = 32      # ... incl. its second-fetch branch
    eng = Engine(rs, err, opts, be, use_quals=True)
    eng.run(max_clust=0)

    assert len(eng.clusters) == nclust
    np.testing.assert_array_equal(eng.cluster_of, cluster_of)
    np.testing.assert_array_equal(eng.comp_ham, comp_ham)
    np.testing.assert_array_equal(eng.comp_lam, comp_lambda)
    np.testing.assert_array_equal(eng.p, pvals)
    np.testing.assert_array_equal(eng.E_minmax, e_minmax)
    for i, c in enumerate(eng.clusters):
        assert c.center == centers[i], i
        assert c.birth_type.encode() == btypes.raw[i: i + 1], i
        if i > 0:
            assert c.birth_pval == bpvals[i], i
    if use_priors:
        # the case is tuned so at least one bud takes the OMEGA_P path
        assert any(c.birth_type == "P" for c in eng.clusters[1:])


@pytest.fixture(scope="module")
def reffilter(tmp_path_factory):
    so = str(tmp_path_factory.mktemp("reffil") / "reffilter.so")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
         "-fPIC", "-I", HARNESS, "-I", REF_SRC, "-o", so,
         os.path.join(HARNESS, "wrapper.cpp"),
         os.path.join(REF_SRC, "filter.cpp"),
         os.path.join(REF_SRC, "nwalign_vectorized.cpp"),
         os.path.join(REF_SRC, "nwalign_endsfree.cpp"),
         os.path.join(REF_SRC, "kmers.cpp")],
        check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.ref_match_ref.restype = None
    lib.ref_matrix_ee.restype = None
    return lib


def test_match_ref_parity(reffilter):
    """Vectorized rolling-hash match_ref == C_matchRef (reference:
    src/filter.cpp:7-32), incl. the non-overlapping skip."""
    from dada2_tpu.filter import match_ref

    rng = np.random.default_rng(41)
    nt = "ACGT"
    ref = "".join(rng.choice(list(nt), 300))
    seqs = []
    for _ in range(60):
        L = int(rng.integers(10, 120))
        if rng.random() < 0.5:  # embed real ref chunks
            st = int(rng.integers(0, 280))
            s = ref[st: st + L]
        else:
            s = "".join(rng.choice(list(nt), L))
        if rng.random() < 0.2:  # non-ACGT characters
            p = int(rng.integers(0, max(1, len(s))))
            s = s[:p] + "N" + s[p + 1:]
        seqs.append(s)
    for ws, novl in ((16, 1), (16, 0), (8, 1)):
        ours = match_ref(seqs, ref, ws, bool(novl))
        enc = [s.encode() for s in seqs]
        arr = (ctypes.c_char_p * len(seqs))(*enc)
        out = np.zeros(len(seqs), np.int64)
        reffilter.ref_match_ref(arr, len(seqs), ref.encode(), ws, novl,
                                out.ctypes.data_as(ctypes.c_void_p))
        np.testing.assert_array_equal(ours, out, err_msg=f"ws={ws}")


def test_matrix_ee_parity(reffilter):
    """matrix_ee == C_matrixEE bitwise (reference: src/filter.cpp:35-49),
    incl. the sequential float64 accumulation order."""
    from dada2_tpu.filter import matrix_ee

    rng = np.random.default_rng(43)
    NA = np.iinfo(np.int32).min
    quals = [rng.integers(0, 42, size=int(rng.integers(1, 250)))
             for _ in range(200)]
    ours = matrix_ee([q.astype(np.float64) for q in quals])
    ncol = max(len(q) for q in quals)
    m = np.full((len(quals), ncol), NA, np.int32)
    for i, q in enumerate(quals):
        m[i, : len(q)] = q
    out = np.zeros(len(quals))
    reffilter.ref_matrix_ee(
        m.ctypes.data_as(ctypes.c_void_p), len(quals), ncol,
        out.ctypes.data_as(ctypes.c_void_p))
    np.testing.assert_array_equal(ours, out)


# ---------------------------------------------------------------------------
# Pooled and pseudo-pooled parity: the refharness engine driven through the
# same combine -> cluster -> split-back / two-pass-priors protocols the R
# driver uses (reference: R/dada.R:443-475 pool surgery, :392-404 pseudo),
# vs the production dada(pool=...) on real MiSeq data.
# ---------------------------------------------------------------------------

def _run_ref_engine(refengine, seqs, ab, quals, priors, err, opts,
                    max_clust=0):
    """Drive run_ref_dada; returns dict of output arrays."""
    n = len(seqs)
    code = {"A": 1, "C": 2, "G": 3, "T": 4}
    enc = [bytes(code[c] for c in s) for s in seqs]
    arr = (ctypes.c_char_p * n)(*enc)
    qmax = int(np.nanmax(quals))
    if qmax + 1 > err.shape[1]:
        err = np.hstack([err] + [err[:, -1:]] * (qmax + 1 - err.shape[1]))
    qflat = np.ascontiguousarray(np.nan_to_num(quals, nan=0.0))
    reads = np.ascontiguousarray(ab, dtype=np.int32)
    priors = np.ascontiguousarray(priors, dtype=np.uint8)
    errflat = np.ascontiguousarray(err)
    out = dict(cluster_of=np.full(n, -1, np.int32),
               comp_lambda=np.zeros(n), comp_ham=np.zeros(n, np.int32),
               pvals=np.zeros(n), e_minmax=np.zeros(n),
               centers=np.full(n, -1, np.int32), bpvals=np.zeros(n))
    btypes = ctypes.create_string_buffer(n)

    def P(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    nclust = refengine.run_ref_dada(
        n, arr, P(qflat), quals.shape[1], P(reads), P(priors), P(errflat),
        err.shape[1], opts.MATCH, opts.MISMATCH, opts.GAP_PENALTY,
        opts.GAP_PENALTY, int(opts.USE_KMERS),
        ctypes.c_double(opts.KDIST_CUTOFF), opts.BAND_SIZE,
        ctypes.c_double(opts.OMEGA_A), ctypes.c_double(opts.OMEGA_P),
        int(opts.DETECT_SINGLETONS), max_clust,
        ctypes.c_double(opts.MIN_FOLD), opts.MIN_HAMMING,
        opts.MIN_ABUNDANCE, 1, 1, opts.SSE, int(opts.GAPLESS),
        int(opts.GREEDY),
        P(out["cluster_of"]), P(out["comp_lambda"]), P(out["comp_ham"]),
        P(out["pvals"]), P(out["e_minmax"]), P(out["centers"]), btypes,
        P(out["bpvals"]))
    assert nclust > 0
    out["nclust"] = nclust
    out["err"] = err
    return out


def _ref_final_map(out, reads, omegaC):
    """The reference's final per-raw map with the OMEGA_C correction
    gate (reference: src/Rmain.cpp:238-252; post-hoc pval is the bare
    Poisson tail, prior=TRUE semantics). -1 = NA (uncorrected)."""
    from dada2_tpu.utils.rmath import ppois_upper

    cluster_of = out["cluster_of"]
    centers = out["centers"][: out["nclust"]]
    bi_reads = np.zeros(out["nclust"], np.int64)
    np.add.at(bi_reads, cluster_of, reads)
    mp = np.full(len(reads), -1, np.int64)
    for r in range(len(reads)):
        bi = int(cluster_of[r])
        if centers[bi] == r:
            mp[r] = bi
            continue
        pv = ppois_upper(int(reads[r]) - 1,
                         float(out["comp_lambda"][r]) * int(bi_reads[bi]))
        if not pv < omegaC:
            mp[r] = bi
    return mp


@pytest.fixture(scope="module")
def pool_dereps():
    from dada2_tpu.derep import derep_fastq

    extdata = os.path.join(os.path.dirname(__file__), "extdata")
    drps = []
    for f in ("sam1F.fastq.gz", "sam2F.fastq.gz"):
        d = derep_fastq(os.path.join(extdata, f))
        top = dict(list(d.uniques.items())[:250])
        d.uniques = top
        d.quals = d.quals[:250]
        d.map = d.map[d.map < 250]  # drop reads of truncated uniques
        drps.append(d)
    return drps


def test_pool_parity(refengine, pool_dereps):
    """dada(pool=TRUE) == reference engine on the combined derep
    followed by the R driver's split-back surgery
    (reference: R/dada.R:186-196, 443-475)."""
    import dada2_tpu as d2
    from dada2_tpu.data import tperr1
    from dada2_tpu.derep import combine_dereps
    from dada2_tpu.options import DEFAULT_OPTIONS

    drps = pool_dereps
    opts = DEFAULT_OPTIONS.normalized()
    err = tperr1()

    ours = d2.dada(drps, err=err, pool=True, verbose=False,
                   multithread=False)
    ours = list(ours.values())

    # --- reference replay: combine -> cluster -> split back ---
    pooled = combine_dereps(drps)
    seqs = pooled.sequences
    ab = pooled.abundances
    out = _run_ref_engine(refengine, seqs, ab, pooled.quals,
                          np.zeros(len(seqs), np.uint8), err, opts)
    ref_map = _ref_final_map(out, ab, opts.OMEGA_C)
    name_to_pooled = {s: k for k, s in enumerate(seqs)}
    center_seq = [seqs[c] for c in out["centers"][: out["nclust"]]]

    for drp, our in zip(drps, ours):
        member = np.array([name_to_pooled[s] for s in drp.sequences])
        own = ref_map[member]
        keep_set = {int(c) for c in own if c >= 0}
        keep = np.array([k in keep_set for k in range(out["nclust"])])
        newBi = np.cumsum(keep) - 1
        exp_map = np.array([newBi[c] if c >= 0 else -1 for c in own],
                           np.int64)
        exp_seqs = [s for s, k in zip(center_seq, keep) if k]
        exp_ab = np.zeros(int(keep.sum()), np.int64)
        for u, c in enumerate(exp_map):
            if c >= 0:
                exp_ab[c] += int(drp.abundances[u])

        np.testing.assert_array_equal(our.map, exp_map)
        assert list(our.denoised.keys()) == exp_seqs
        np.testing.assert_array_equal(
            np.array(list(our.denoised.values())), exp_ab)
        assert list(our.clustering["sequence"]) == exp_seqs
        np.testing.assert_array_equal(
            our.clustering["abundance"].to_numpy(), exp_ab)


def test_pseudo_parity(refengine, pool_dereps):
    """dada(pool='pseudo') == two reference-engine passes with the R
    driver's prior-selection protocol between them
    (reference: R/dada.R:392-404)."""
    import dada2_tpu as d2
    from dada2_tpu.data import tperr1
    from dada2_tpu.options import DEFAULT_OPTIONS

    drps = pool_dereps
    opts = DEFAULT_OPTIONS.normalized()
    err = tperr1()

    ours = d2.dada(drps, err=err, pool="pseudo", verbose=False,
                   multithread=False)
    ours = list(ours.values())

    # --- reference replay: pass 1 (no priors) per sample ---
    pass1 = []
    for drp in drps:
        out = _run_ref_engine(refengine, drp.sequences, drp.abundances,
                              drp.quals, np.zeros(len(drp.sequences),
                                                  np.uint8), err, opts)
        pass1.append(out)

    # prior selection: ASVs in >= PSEUDO_PREVALENCE samples or with
    # total abundance >= PSEUDO_ABUNDANCE (R/dada.R:399-401)
    # R builds the seqtab from the clustering dfs, whose abundance is
    # the full cluster read total (NOT the OMEGA_C-gated map sums)
    tot = {}
    nsam = {}
    for drp, out in zip(drps, pass1):
        bi_reads = np.zeros(out["nclust"], np.int64)
        np.add.at(bi_reads, out["cluster_of"], drp.abundances)
        for c in range(out["nclust"]):
            s = drp.sequences[out["centers"][c]]
            tot[s] = tot.get(s, 0) + int(bi_reads[c])
            nsam[s] = nsam.get(s, 0) + 1
    pseudo_priors = {s for s in tot
                     if nsam[s] >= opts.PSEUDO_PREVALENCE
                     or tot[s] >= opts.PSEUDO_ABUNDANCE}
    assert pseudo_priors  # the fixture shares ASVs across samples

    # R re-estimates the error model from pass-1 transitions before the
    # second pass (R/dada.R:368-380) — replicate with pass-1 runs of our
    # (engine-parity-proven) engine, since run_ref_dada exposes no trans
    import dada2_tpu as d2p1
    from dada2_tpu.errors import accumulate_trans, loess_errfun

    res_p1 = list(d2p1.dada(drps, err=err, verbose=False,
                            multithread=False).values())
    err2 = loess_errfun(accumulate_trans([r.trans for r in res_p1]))

    # --- pass 2 with the pseudo priors flagged + re-estimated err ---
    for drp, our in zip(drps, ours):
        pri = np.array([s in pseudo_priors for s in drp.sequences],
                       np.uint8)
        out = _run_ref_engine(refengine, drp.sequences, drp.abundances,
                              drp.quals, pri, err2, opts)
        ref_map = _ref_final_map(out, drp.abundances, opts.OMEGA_C)
        exp_seqs = [drp.sequences[c] for c in out["centers"][: out["nclust"]]]
        np.testing.assert_array_equal(our.map, ref_map)
        assert list(our.denoised.keys()) == exp_seqs


@pytest.mark.parametrize("dataset", ["sam2F", "pooled"])
def test_engine_parity_other_data(refengine, dataset, monkeypatch):
    """Engine parity on a second dataset and on a pooled length/quality
    mix (default options, pallas shortlist route) — guards against
    data-dependent divergence the sam1F cases can't see."""
    from dada2_tpu.core.backend_tpu import TpuBackend
    from dada2_tpu.core.engine import Engine
    from dada2_tpu.core.raws import make_rawset
    from dada2_tpu.data import tperr1
    from dada2_tpu.derep import combine_dereps, derep_fastq
    from dada2_tpu.options import DEFAULT_OPTIONS

    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    extdata = os.path.join(os.path.dirname(__file__), "extdata")
    if dataset == "sam2F":
        d = derep_fastq(os.path.join(extdata, "sam2F.fastq.gz"))
    else:
        d = combine_dereps([
            derep_fastq(os.path.join(extdata, "sam1F.fastq.gz")),
            derep_fastq(os.path.join(extdata, "sam2F.fastq.gz"))])
    N = 300
    seqs, ab, quals = d.sequences[:N], d.abundances[:N], d.quals[:N]
    opts = DEFAULT_OPTIONS.normalized()
    err = tperr1()
    out = _run_ref_engine(refengine, seqs, ab, quals,
                          np.zeros(len(seqs), np.uint8), err, opts)

    qmax = int(np.nanmax(quals))
    errx = np.hstack([err] + [err[:, -1:]] * max(0, qmax + 1
                                                 - err.shape[1]))
    rs = make_rawset(seqs, ab, None, quals)
    be = TpuBackend(rs, use_quals=True)
    be.SHORTLIST_MIN_N = 0
    eng = Engine(rs, errx, opts, be, use_quals=True)
    eng.run(max_clust=0)

    assert len(eng.clusters) == out["nclust"]
    np.testing.assert_array_equal(eng.cluster_of, out["cluster_of"])
    np.testing.assert_array_equal(eng.comp_lam, out["comp_lambda"])
    np.testing.assert_array_equal(eng.comp_ham, out["comp_ham"])
    np.testing.assert_array_equal(eng.p, out["pvals"])
    np.testing.assert_array_equal(eng.E_minmax, out["e_minmax"])
    for i, c in enumerate(eng.clusters):
        assert c.center == out["centers"][i], i
