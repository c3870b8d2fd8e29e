"""Parity: TpuBackend (device-batched) vs OracleBackend (exact numpy) on
real MiSeq data. The clustering output must match bit-for-bit."""
import numpy as np
import pandas as pd
import pytest

from dada2_tpu.core.backend_ref import OracleBackend
from dada2_tpu.core.backend_tpu import TpuBackend
from dada2_tpu.core.engine import Engine
from dada2_tpu.core.output import finalize
from dada2_tpu.core.raws import make_rawset
from dada2_tpu.data import tperr1
from dada2_tpu.derep import derep_fastq
from dada2_tpu.options import DEFAULT_OPTIONS


@pytest.fixture(scope="module")
def sample(extdata):
    d = derep_fastq(str(extdata / "sam1F.fastq.gz"))
    seqs = d.sequences[:150]
    ab = d.abundances[:150]
    quals = d.quals[:150]
    return seqs, ab, quals


def _run(backend_cls, sample, err, **overrides):
    seqs, ab, quals = sample
    opts = DEFAULT_OPTIONS.replace(**overrides).normalized()
    rs = make_rawset(seqs, ab, None, quals)
    backend = backend_cls(rs, use_quals=True)
    eng = Engine(rs, err, opts, backend, use_quals=True)
    eng.run(max_clust=opts.MAX_CLUST)
    return eng, finalize(eng, opts, err.shape[1], opts.OMEGA_C)


def _assert_same(res_a, res_b):
    pd.testing.assert_frame_equal(res_a["clustering"], res_b["clustering"])
    pd.testing.assert_frame_equal(res_a["birth_subs"], res_b["birth_subs"])
    np.testing.assert_array_equal(res_a["subqual"], res_b["subqual"])
    np.testing.assert_array_equal(res_a["map"], res_b["map"])
    np.testing.assert_array_equal(res_a["pval"], res_b["pval"])
    np.testing.assert_array_equal(res_a["clusterquals"],
                                  res_b["clusterquals"])


def test_compare_parity(sample):
    """Single compare(): lam/ham identical between backends."""
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    skip = np.zeros(rs.n, dtype=bool)
    lam_o, ham_o = OracleBackend(rs).compare(0, skip, opts, err, True, 1.0)
    lam_t, ham_t = TpuBackend(rs).compare(0, skip, opts, err, True, 1.0)
    np.testing.assert_array_equal(ham_o, ham_t)
    np.testing.assert_array_equal(lam_o, lam_t)
    # with the kdist screen active
    lam_o, ham_o = OracleBackend(rs).compare(0, skip, opts, err, True, 0.42)
    lam_t, ham_t = TpuBackend(rs).compare(0, skip, opts, err, True, 0.42)
    np.testing.assert_array_equal(ham_o, ham_t)
    np.testing.assert_array_equal(lam_o, lam_t)


def test_full_run_parity(sample):
    err = tperr1()
    eng_o, res_o = _run(OracleBackend, sample, err)
    eng_t, res_t = _run(TpuBackend, sample, err)
    assert len(eng_o.clusters) == len(eng_t.clusters)
    _assert_same(res_o, res_t)


def test_full_run_parity_no_gapless_no_greedy(sample):
    err = tperr1()
    eng_o, res_o = _run(OracleBackend, sample, err,
                        GAPLESS=False, GREEDY=False)
    eng_t, res_t = _run(TpuBackend, sample, err,
                        GAPLESS=False, GREEDY=False)
    _assert_same(res_o, res_t)


def test_full_run_parity_band0(sample):
    err = tperr1()
    eng_o, res_o = _run(OracleBackend, sample, err, BAND_SIZE=0)
    eng_t, res_t = _run(TpuBackend, sample, err, BAND_SIZE=0)
    _assert_same(res_o, res_t)


def test_full_run_parity_pallas_interpret(sample, monkeypatch):
    """The pallas wavefront path (interpret mode on CPU) must match the
    oracle bit-for-bit through a full engine run."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    small = (seqs[:60], ab[:60], quals[:60])
    err = tperr1()
    eng_o, res_o = _run(OracleBackend, small, err)
    eng_t, res_t = _run(TpuBackend, small, err)
    _assert_same(res_o, res_t)


def test_screen_thresholded_compare(sample, monkeypatch):
    """With e_thresh set, the screened compare must agree with the exact
    compare on every row it keeps, and rows it zeroes must be provably
    below the engine's store threshold."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    be = TpuBackend(rs, use_quals=True)
    assert be.use_pallas
    skip = np.zeros(rs.n, bool)
    lam_full, ham_full = be.compare(0, skip, opts, err, True, 1.0)
    total = int(rs.reads.sum())
    # a mid-scale threshold: half the rows land on each side
    e_minmax = np.full(rs.n, np.median(lam_full[lam_full > 0]) * total / 2)
    lam_s, ham_s = be.compare(0, skip, opts, err, True, 1.0,
                              e_minmax / total)
    np.testing.assert_array_equal(ham_s, ham_full)
    kept = lam_s != 0
    np.testing.assert_array_equal(lam_s[kept], lam_full[kept])
    # zeroed rows would have been discarded by the engine's store rule
    assert (lam_full[~kept] * total <= e_minmax[~kept]).all()
    # and every row the engine WOULD store was kept
    store = lam_full * total > e_minmax
    assert kept[store].all()


def test_full_run_parity_scalar_homo(sample):
    """Non-vectorized homopolymer config (the 454/PacBio engine mode):
    the batched scalar path must match the oracle bit-for-bit."""
    err = tperr1()
    kw = dict(VECTORIZED_ALIGNMENT=False, HOMOPOLYMER_GAP_PENALTY=-1,
              BAND_SIZE=32)
    seqs, ab, quals = sample
    small = (seqs[:60], ab[:60], quals[:60])
    eng_o, res_o = _run(OracleBackend, small, err, **kw)
    eng_t, res_t = _run(TpuBackend, small, err, **kw)
    assert len(eng_o.clusters) == len(eng_t.clusters)
    np.testing.assert_array_equal(eng_o.cluster_of, eng_t.cluster_of)
    np.testing.assert_array_equal(eng_o.comp_lam, eng_t.comp_lam)
    _assert_same(res_o, res_t)


def test_full_run_parity_scalar_novec(sample):
    """VECTORIZED_ALIGNMENT=False without homopolymer gaps."""
    err = tperr1()
    kw = dict(VECTORIZED_ALIGNMENT=False)
    seqs, ab, quals = sample
    small = (seqs[:60], ab[:60], quals[:60])
    eng_o, res_o = _run(OracleBackend, small, err, **kw)
    eng_t, res_t = _run(TpuBackend, small, err, **kw)
    _assert_same(res_o, res_t)


def test_compare_shortlist_path(sample, monkeypatch):
    """The budded-compare shortlist path (device store-screen + compacted
    fetch): rows it reports must match the full fetch exactly; rows it
    screens out (ham == -2) must be provably un-storable; the device
    naligned/nshroud scalars must match the full path's counts."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    be = TpuBackend(rs, use_quals=True)
    be.SHORTLIST_MIN_N = 0    # the size gate would skip this tiny sample
    be.SHORTLIST_M0 = 16      # force the second-fetch (m > M0) branch
    skip = np.zeros(rs.n, bool)
    cutoff = opts.KDIST_CUTOFF
    lam_full, ham_full = be.compare(0, skip, opts, err, True, cutoff)
    assert be.last_stats is None          # full path sets no stats
    total = int(rs.reads.sum())
    pos = lam_full[lam_full > 0]
    e_minmax = np.full(rs.n, np.median(pos) * total / 2)
    lam_s, ham_s = be.compare(0, skip, opts, err, True, cutoff,
                              e_minmax / total)
    assert be.last_stats is not None
    naligned, nshroud = be.last_stats
    assert naligned == int((ham_full >= 0).sum())
    assert nshroud == int(((ham_full < 0) & ~skip).sum())
    fetched = ham_s != -2
    assert fetched.sum() < rs.n           # the screen actually screened
    np.testing.assert_array_equal(ham_s[fetched], ham_full[fetched])
    np.testing.assert_array_equal(lam_s[fetched], lam_full[fetched])
    # screened rows would never be stored by the engine
    store = lam_full * total > e_minmax
    assert fetched[store].all()
    assert (lam_full[~fetched] * total <= e_minmax[~fetched]).all()
    # single-fetch branch (m <= M0): one fetch carries indices, small
    # rows AND substitution tiles; lambdas must be bit-equal. K=1
    # forces most rows through the dense overflow re-fetch too.
    for K in (None, 1):
        be2 = TpuBackend(rs, use_quals=True)
        be2.SHORTLIST_MIN_N = 0
        if K is not None:
            be2.SHORTLIST_K = K
        lam_p, ham_p = be2.compare(0, skip, opts, err, True, cutoff,
                                   e_minmax / total)
        fetched_p = ham_p != -2
        np.testing.assert_array_equal(fetched_p, fetched)
        np.testing.assert_array_equal(ham_p[fetched_p],
                                      ham_full[fetched_p])
        np.testing.assert_array_equal(lam_p[fetched_p],
                                      lam_full[fetched_p])

    # greedy-skip rows keep the -1 sentinel and are excluded from stats
    skip2 = np.zeros(rs.n, bool)
    skip2[1::3] = True
    lam_k, ham_k = be.compare(0, skip2, opts, err, True, cutoff,
                              e_minmax / total)
    naligned2, _ = be.last_stats
    assert (ham_k[skip2] == -1).all()
    assert (lam_k[skip2] == 0).all()
    assert naligned2 == int((ham_full >= 0) .sum() - (ham_full[skip2] >= 0).sum())


def test_speculative_multibud_parity(sample, monkeypatch):
    """The speculative multi-bud transport: an engine run that CONSUMES
    prefetched shortlists (stale E_minmax/locks corrected on host) must
    be bit-identical to one with speculation disabled — including the
    nalign/nshroud counters — and speculation must actually hit."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    from dada2_tpu.trace import COUNTERS

    err = tperr1()

    def run(spec_k, m0=None):
        seqs, ab, quals = sample
        opts = DEFAULT_OPTIONS.normalized()
        rs = make_rawset(seqs, ab, None, quals)
        be = TpuBackend(rs, use_quals=True)
        assert be.use_pallas
        be.SHORTLIST_MIN_N = 0
        be.SPEC_K = spec_k
        if m0 is not None:
            be.SHORTLIST_M0 = m0   # force m > M0 inside consumed segments
        eng = Engine(rs, err, opts, be, use_quals=True)
        eng.run()
        return eng, finalize(eng, opts, err.shape[1], opts.OMEGA_C)

    eng0, res0 = run(0)
    h0 = COUNTERS.spec_hits
    eng8, res8 = run(8)
    assert COUNTERS.spec_hits > h0, "speculation never hit"
    assert (eng0.nalign, eng0.nshroud) == (eng8.nalign, eng8.nshroud)
    np.testing.assert_array_equal(eng0.cluster_of, eng8.cluster_of)
    np.testing.assert_array_equal(eng0.comp_lam, eng8.comp_lam)
    _assert_same(res0, res8)
    # consumed segments overflowing their M0 take the follow-up fetch
    f0 = COUNTERS.followup_fetches
    engf, resf = run(8, m0=16)
    assert COUNTERS.followup_fetches > f0
    _assert_same(res0, resf)

    # a second run on the SAME backend (the selfConsist shape) must roll
    # the bud sequence into the predictor and still agree
    seqs, ab, quals = sample
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    be = TpuBackend(rs, use_quals=True)
    be.SHORTLIST_MIN_N = 0
    be.SPEC_K = 4
    eng_a = Engine(rs, err, opts, be, use_quals=True)
    eng_a.run()
    assert be._centers_cur
    h1 = COUNTERS.spec_hits
    eng_b = Engine(rs, err, opts, be, use_quals=True)
    eng_b.run()
    assert be._centers_prev   # rolled over at the init compare
    assert COUNTERS.spec_hits > h1
    np.testing.assert_array_equal(eng_a.cluster_of, eng_b.cluster_of)
    np.testing.assert_array_equal(eng_a.comp_lam, eng_b.comp_lam)


def test_device_construction_derivations():
    """The 2-bit seq upload and the device-derived merged candidate tile
    must reproduce the host encodings bit-for-bit (the host
    ops/nw_pallas.pack_s2_blocks stays as the oracle)."""
    import dada2_tpu.ops.nw_pallas as nwp

    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"),
                               size=rng.integers(60, 121)))
            for _ in range(300)]
    quals = np.full((300, 120), np.nan)
    for i, s in enumerate(seqs):
        quals[i, : len(s)] = rng.integers(2, 94, len(s))  # incl. q93
    n = 300
    rs = make_rawset(seqs, np.arange(1, n + 1), None, quals)
    bk = TpuBackend(rs, use_quals=True)
    # device rows are padded to a coarse bucket; real rows bit-identical
    assert np.array_equal(np.asarray(bk.d_seqs)[:n],
                          np.asarray(rs.seqs, np.int8))
    assert np.array_equal(np.asarray(bk.d_quals)[:n], rs.quals)  # q93
    # 6-bit qual packing path (qmax < 64)
    rs6 = make_rawset(seqs, np.arange(1, n + 1), None,
                      np.minimum(quals, 41))
    bk6 = TpuBackend(rs6, use_quals=True)
    assert np.array_equal(np.asarray(bk6.d_quals)[:n], rs6.quals)
    from dada2_tpu.core.backend_tpu import _PallasBlocks
    rsp = bk._rs_pad
    pb = bk._pb or _PallasBlocks(rsp, bk._put, d_seqs=bk.d_seqs,
                                 d_quals=bk.d_quals, d_lens=bk.d_lens)
    merged = ((rsp.seqs & 3).astype(np.int32)
              | (rsp.quals.astype(np.int32) << 2))
    host = nwp.pack_s2_blocks(merged, rsp.lens, pb.block_idx, pb.L2R)
    assert np.array_equal(host, np.asarray(pb.d_s2q))
    # quality-free variant (merged tile carries chars only)
    rs2 = make_rawset(seqs, np.arange(1, n + 1))
    bk2 = TpuBackend(rs2, use_quals=False)
    assert np.array_equal(np.asarray(bk2.d_seqs)[:n],
                          np.asarray(rs2.seqs, np.int8))
    rsp2 = bk2._rs_pad
    pb2 = bk2._pb or _PallasBlocks(rsp2, bk2._put, d_seqs=bk2.d_seqs,
                                   d_lens=bk2.d_lens)
    host2 = nwp.pack_s2_blocks((rsp2.seqs & 3).astype(np.int32),
                               rsp2.lens, pb2.block_idx, pb2.L2R)
    assert np.array_equal(host2, np.asarray(pb2.d_s2q))


def test_compare_many_parity(sample, monkeypatch):
    """compare_many(k centers, one fetch) must be bit-identical to k
    independent compare() calls under the same engine state — screened,
    unscreened, and the per-center fallback path."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.replace(GAPLESS=False).normalized()
    rs = make_rawset(seqs, ab, None, quals)
    skip = np.zeros(rs.n, bool)
    total = int(rs.reads.sum())
    centers = [0, 3, 7, 11]

    from dada2_tpu.trace import COUNTERS
    ref = TpuBackend(rs, use_quals=True)
    assert ref.use_pallas
    e_minmax = np.full(rs.n, -999.0)
    for c in range(4):
        lam_c, _ = ref.compare(c, skip, opts, err, True, 1.0)
        e_minmax = np.maximum(e_minmax, lam_c * int(rs.reads[c]))
    eth = e_minmax / total
    f0 = COUNTERS.device_fetches
    singles = [ref.compare(c, skip, opts, err, True, 1.0, eth)
               for c in centers]
    n_single = COUNTERS.device_fetches - f0

    be = TpuBackend(rs, use_quals=True)
    for c in range(4):          # same warm state as the singles run
        be.compare(c, skip, opts, err, True, 1.0)
    f0 = COUNTERS.device_fetches
    many = be.compare_many(centers, skip, opts, err, True, 1.0, eth)
    # the batch shares ONE main fetch where singles paid one each
    assert COUNTERS.device_fetches - f0 <= n_single - (len(centers) - 1)
    for (lam_s, ham_s), (lam_m, ham_m) in zip(singles, many):
        np.testing.assert_array_equal(ham_s, ham_m)
        np.testing.assert_array_equal(lam_s, lam_m)

    # unscreened batch (init-compare shape): e_thresh=None
    ref2 = TpuBackend(rs, use_quals=True)
    singles2 = [ref2.compare(c, skip, opts, err, True, 1.0)
                for c in centers]
    be2 = TpuBackend(rs, use_quals=True)
    many2 = be2.compare_many(centers, skip, opts, err, True, 1.0, None)
    for (lam_s, ham_s), (lam_m, ham_m) in zip(singles2, many2):
        np.testing.assert_array_equal(ham_s, ham_m)
        np.testing.assert_array_equal(lam_s, lam_m)

    # fallback path: BAND_SIZE=0 routes every center through compare()
    opts0 = DEFAULT_OPTIONS.replace(BAND_SIZE=0).normalized()
    be3 = TpuBackend(rs, use_quals=True)
    many3 = be3.compare_many(centers, skip, opts0, err, True, 1.0, eth)
    ref3 = TpuBackend(rs, use_quals=True)
    for c, (lam_m, ham_m) in zip(centers, many3):
        lam_s, ham_s = ref3.compare(c, skip, opts0, err, True, 1.0, eth)
        np.testing.assert_array_equal(ham_s, ham_m)
        np.testing.assert_array_equal(lam_s, lam_m)


def test_compare_many_budded_parity(sample, monkeypatch):
    """compare_many under the engine's steady-state conditions (default
    kdist cutoff + live e_thresh) rides the budded shortlist transport:
    one fetch, bit-identical to k independent compare() calls."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    skip = np.zeros(rs.n, bool)
    total = int(rs.reads.sum())
    centers = [0, 3, 7, 11, 19]

    ref = TpuBackend(rs, use_quals=True)
    e_minmax = np.full(rs.n, -999.0)
    for c in range(8):
        lam_c, _ = ref.compare(c, skip, opts, err, True, 1.0)
        e_minmax = np.maximum(e_minmax, lam_c * int(rs.reads[c]))
    eth = e_minmax / total
    singles = [ref.compare(c, skip, opts, err, True,
                           opts.KDIST_CUTOFF, eth) for c in centers]

    from dada2_tpu.trace import COUNTERS
    be = TpuBackend(rs, use_quals=True)
    be.SPEC_K = 0
    for c in range(8):
        be.compare(c, skip, opts, err, True, 1.0)
    f0 = COUNTERS.device_fetches
    many = be.compare_many(centers, skip, opts, err, True,
                           opts.KDIST_CUTOFF, eth)
    assert COUNTERS.device_fetches - f0 <= 2   # one main + rare overflow
    for (lam_s, ham_s), (lam_m, ham_m) in zip(singles, many):
        np.testing.assert_array_equal(ham_s, ham_m)
        np.testing.assert_array_equal(lam_s, lam_m)

    # greedy skip state: lock bits + per-center abundance reconstruction
    lock = np.zeros(rs.n, bool)
    lock[5::13] = True
    ref2 = TpuBackend(rs, use_quals=True)
    be2 = TpuBackend(rs, use_quals=True)
    be2.SPEC_K = 0
    for c in range(4):
        ref2.compare(c, skip, opts, err, True, 1.0)
        be2.compare(c, skip, opts, err, True, 1.0)
    for c in centers:
        sk = (rs.reads > int(rs.reads[c])) | lock
        lam_s, ham_s = ref2.compare(c, sk, opts, err, True,
                                    opts.KDIST_CUTOFF, eth)
        lam_m, ham_m = be2.compare_many([c], sk, opts, err, True,
                                        opts.KDIST_CUTOFF, eth)[0]
        np.testing.assert_array_equal(ham_s, ham_m)
        np.testing.assert_array_equal(lam_s, lam_m)


def test_full_run_parity_bits_transport(sample, monkeypatch):
    """Engine run with the bitmap substitution transport forced tiny
    (nt0 stream K=8, buffer M0=16): exercises the bits decode, the
    follow-up fetch and the dense-refetch overflow branch; results must
    match the oracle bit-for-bit."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    eng_o, res_o = _run(OracleBackend, sample, err)
    backend = TpuBackend(rs, use_quals=True)
    backend.SHORTLIST_M0 = 16
    backend.SHORTLIST_FORCE = ("bits", 8)
    eng_t = Engine(rs, err, opts, backend, use_quals=True)
    eng_t.run(max_clust=opts.MAX_CLUST)
    res_t = finalize(eng_t, opts, err.shape[1], opts.OMEGA_C)
    _assert_same(res_o, res_t)


def test_compare_many_bits_followup_parity(sample, monkeypatch):
    """compare_many under forced-tiny bits shapes: every segment
    overflows M0, so the batched follow-up fetch path runs; results
    must equal unforced single compares."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    skip = np.zeros(rs.n, bool)
    total = int(rs.reads.sum())
    centers = [0, 3, 7, 11]
    ref = TpuBackend(rs, use_quals=True)
    e_minmax = np.full(rs.n, -999.0)
    for c in range(4):
        lam_c, _ = ref.compare(c, skip, opts, err, True, 1.0)
        e_minmax = np.maximum(e_minmax, lam_c * int(rs.reads[c]))
    eth = e_minmax / total
    singles = [ref.compare(c, skip, opts, err, True,
                           opts.KDIST_CUTOFF, eth) for c in centers]
    be = TpuBackend(rs, use_quals=True)
    be.SPEC_K = 0
    be.SHORTLIST_M0 = 16
    be.SHORTLIST_FORCE = ("bits", 8)
    many = be.compare_many(centers, skip, opts, err, True,
                           opts.KDIST_CUTOFF, eth)
    for (lam_s, ham_s), (lam_m, ham_m) in zip(singles, many):
        np.testing.assert_array_equal(ham_s, ham_m)
        np.testing.assert_array_equal(lam_s, lam_m)


def test_underflow_screen_soundness(monkeypatch):
    """E_minmax == 0 (the permanent state of distant singletons after
    their first lambda underflow): the device screen drops rows whose
    host float64 lambda PROVABLY underflows to exactly 0.0 — verify
    against the oracle that every dropped row's exact lambda is 0.0 and
    every kept row matches bit-for-bit."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    rng = np.random.default_rng(7)
    n = 60
    seqs = ["".join(rng.choice(list("ACGT"), size=400))
            for _ in range(n)]
    ab = np.concatenate([[500], np.ones(n - 1)]).astype(np.int64)
    quals = np.full((n, 400), 35.0)
    rs = make_rawset(seqs, ab, None, quals)
    err = tperr1()
    # cutoff 1.0 so random-sequence pairs are not kmer-shrouded and the
    # budded path still applies (cutoff == opts.KDIST_CUTOFF)
    opts = DEFAULT_OPTIONS.replace(KDIST_CUTOFF=1.0).normalized()
    skip = np.zeros(n, bool)
    lam_o, ham_o = OracleBackend(rs).compare(0, skip, opts, err, True,
                                             1.0)
    be = TpuBackend(rs, use_quals=True)
    assert be.use_pallas
    # mixed threshold like a real run: a few rows carry live positive
    # thresholds (the budded-path gate requires any > 0), the rest sit
    # in the underflow-pinned E_minmax == 0 state
    eth = np.zeros(n)
    eth[:3] = 1e-12
    lam_t, ham_t = be.compare(0, skip, opts, err, True, 1.0, eth)
    dropped = ham_t == -2
    # rows with a live positive threshold may be dropped by the normal
    # store screen; rows at e_thresh == 0 may ONLY be dropped when
    # their exact host lambda is exactly 0.0
    dropped_z = dropped & (eth == 0)
    assert dropped_z.any()                  # the underflow rule fired
    assert (lam_o[dropped_z] == 0.0).all()  # soundly
    kept = ~dropped
    np.testing.assert_array_equal(lam_t[kept], lam_o[kept])
    np.testing.assert_array_equal(ham_t[kept], ham_o[kept])
    # the E_minmax < 0 init state must still ship lambda-0 rows (they
    # ARE stored by the reference's rule: 0 * total > -999)
    lam_t2, ham_t2 = be.compare(0, skip, opts, err, True, 1.0,
                                np.full(n, -999.0 / int(rs.reads.sum())))
    np.testing.assert_array_equal(ham_t2, ham_o)
    np.testing.assert_array_equal(lam_t2, lam_o)


def test_cross_round_subs_cache_parity(sample, monkeypatch):
    """selfConsist reuses one backend across engine runs; round 2+
    budded compares ship only UNCACHED rows' substitution records (the
    rest rebuild from the cross-round host cache). Two consecutive
    engine runs on one backend must match two oracle runs bit-for-bit,
    and the second run must ship fewer substitution bytes."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    err2 = err ** 1.1          # a second, equally valid error matrix
    for b in range(4):
        rows = [4 * b + j for j in range(4) if j != b]
        err2[4 * b + b] = 1.0 - err2[rows].sum(axis=0)
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)

    from dada2_tpu.trace import COUNTERS
    outs = {}
    for cls in (OracleBackend, TpuBackend):
        backend = cls(rs, use_quals=True)
        res = []
        fb = []
        for e in (err, err2, err):   # 3 rounds, same backend
            f0 = COUNTERS.fetch_bytes
            eng = Engine(rs, e, opts, backend, use_quals=True)
            eng.run(max_clust=opts.MAX_CLUST)
            res.append(finalize(eng, opts, e.shape[1], opts.OMEGA_C))
            fb.append(COUNTERS.fetch_bytes - f0)
        outs[cls] = (res, fb)
    for a, b in zip(outs[OracleBackend][0], outs[TpuBackend][0]):
        _assert_same(a, b)
    tpu_bytes = outs[TpuBackend][1]
    assert tpu_bytes[2] < tpu_bytes[0]    # cached round ships less


def test_subs_cache_overflow_parity(sample, monkeypatch):
    """Forced-tiny uncached buffer (M0U) drives the cache-mode
    follow-up fetch; results stay bit-identical."""
    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    seqs, ab, quals = sample
    err = tperr1()
    opts = DEFAULT_OPTIONS.normalized()
    rs = make_rawset(seqs, ab, None, quals)
    be = TpuBackend(rs, use_quals=True)
    be._predict_m0u = lambda ordinal, M0: 16   # force m_u > M0U
    eng_o, res_o = _run(OracleBackend, sample, err)
    for _ in range(2):
        eng_t = Engine(rs, err, opts, be, use_quals=True)
        eng_t.run(max_clust=opts.MAX_CLUST)
    res_t = finalize(eng_t, opts, err.shape[1], opts.OMEGA_C)
    _assert_same(res_o, res_t)
