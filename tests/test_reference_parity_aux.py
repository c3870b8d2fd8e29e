"""Parity fuzz vs the reference's chimera, pairwise-evaluation and
taxonomy translation units.

src/chimera.cpp, src/evaluate.cpp, src/taxonomy.cpp and src/misc.cpp are
compiled UNMODIFIED from /root/reference behind the Rcpp stub in
tests/refharness/ (see aux_wrapper.cpp) and fuzzed against this repo's
implementations:

- C_nwalign / C_eval_pair / C_pair_consensus / C_is_bimera /
  C_table_bimera2 are deterministic -> exact equality.
- C_assign_taxonomy2's bootstrap indices come from R's runif and its
  tie-breaks from an OS-seeded mt19937; the harness feeds a fixed
  uniform stream through a hook (Rcpp.h stub) and checks our lgk table /
  karray semantics BITWISE via a sequential-float32 mirror of the
  reference's scoring loop, then checks the production MXU classifier
  (argmax + bootstrap confidences) against the reference output.
"""
import ctypes
import os
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
HARNESS = os.path.join(os.path.dirname(__file__), "refharness")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference sources not mounted")

NT = np.array(list("ACGT"))


@pytest.fixture(scope="module")
def refaux(tmp_path_factory):
    so = str(tmp_path_factory.mktemp("refaux") / "refaux.so")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
         "-fPIC", "-Wl,--no-undefined", "-I", HARNESS, "-I", REF_SRC,
         "-o", so, os.path.join(HARNESS, "aux_wrapper.cpp")] +
        [os.path.join(REF_SRC, f) for f in
         ("chimera.cpp", "evaluate.cpp", "taxonomy.cpp", "misc.cpp",
          "nwalign_endsfree.cpp", "nwalign_vectorized.cpp", "kmers.cpp")],
        check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.ref_is_bimera.restype = ctypes.c_int
    lib.ref_table_bimera2.restype = ctypes.c_int
    lib.ref_table_bimera2.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.ref_nwalign_acgt.restype = ctypes.c_int
    lib.ref_eval_pair.restype = ctypes.c_int
    lib.ref_pair_consensus.restype = ctypes.c_int
    lib.ref_assign_taxonomy.restype = ctypes.c_int
    return lib


def _rand_seq(rng, lo, hi):
    return "".join(rng.choice(NT, int(rng.integers(lo, hi))))


def _mutate(rng, s, nsub, nindel=0):
    s = list(s)
    for _ in range(nsub):
        s[int(rng.integers(0, len(s)))] = str(rng.choice(NT))
    for _ in range(nindel):
        p = int(rng.integers(0, len(s)))
        if rng.random() < 0.5 and len(s) > 20:
            del s[p]
        else:
            s.insert(p, str(rng.choice(NT)))
    return "".join(s)


# ---------------------------------------------------------------------------
# evaluate.cpp: C_nwalign / C_eval_pair / C_pair_consensus
# ---------------------------------------------------------------------------

def test_nwalign_fn_parity(refaux):
    """paired.nwalign == C_nwalign across endsfree/homo/global modes and
    band settings (reference: src/evaluate.cpp:18-61)."""
    from dada2_tpu.paired import nwalign

    rng = np.random.default_rng(101)
    cap = 4096
    b0 = ctypes.create_string_buffer(cap)
    b1 = ctypes.create_string_buffer(cap)
    for trial in range(120):
        s1 = _rand_seq(rng, 40, 200)
        s2 = _mutate(rng, s1, int(rng.integers(0, 12)),
                     int(rng.integers(0, 3)))
        if rng.random() < 0.3:  # end shifts
            sh = int(rng.integers(1, 10))
            s2 = s2[sh:] if rng.random() < 0.5 else _rand_seq(
                rng, sh, sh + 1) + s2
        match, mismatch, gap = 5, -4, int(rng.choice([-8, -6]))
        band = int(rng.choice([-1, 16, 32]))
        endsfree = bool(rng.random() < 0.7)
        if endsfree and rng.random() < 0.4:
            homo = int(rng.choice([-1, -3]))
        else:
            homo = gap
        L = refaux.ref_nwalign_acgt(
            s1.encode(), s2.encode(), match, mismatch, gap, homo, band,
            int(endsfree), b0, b1, cap)
        assert L > 0
        ours = nwalign(s1, s2, match=match, mismatch=mismatch, gap=gap,
                       homo_gap=(homo if homo != gap else None), band=band,
                       endsfree=endsfree)
        ctx = f"trial={trial} band={band} ef={endsfree} homo={homo}"
        assert ours[0] == b0.value.decode(), ctx
        assert ours[1] == b1.value.decode(), ctx


def _rand_aligned_pair(rng, lo=20, hi=120):
    """Random same-length aligned strings with no double-gap columns and
    realistic end-gap runs."""
    L = int(rng.integers(lo, hi))
    a1, a2 = [], []
    # end gaps on the left
    for _ in range(int(rng.integers(0, 8))):
        if rng.random() < 0.5:
            a1.append("-"), a2.append(str(rng.choice(NT)))
        else:
            a1.append(str(rng.choice(NT))), a2.append("-")
    while len(a1) < L:
        r = rng.random()
        if r < 0.08:
            a1.append("-"), a2.append(str(rng.choice(NT)))
        elif r < 0.16:
            a1.append(str(rng.choice(NT))), a2.append("-")
        elif r < 0.3:
            a1.append(str(rng.choice(NT))), a2.append(str(rng.choice(NT)))
        else:
            c = str(rng.choice(NT))
            a1.append(c), a2.append(c)
    for _ in range(int(rng.integers(0, 8))):  # right end gaps
        if rng.random() < 0.5:
            a1.append("-"), a2.append(str(rng.choice(NT)))
        else:
            a1.append(str(rng.choice(NT))), a2.append("-")
    return "".join(a1), "".join(a2)


def test_eval_pair_parity(refaux):
    """paired.eval_pair == C_eval_pair incl. end-gap trimming quirks
    (reference: src/evaluate.cpp:73-113)."""
    from dada2_tpu.paired import eval_pair

    rng = np.random.default_rng(103)
    out3 = (ctypes.c_int * 3)()
    for trial in range(300):
        a1, a2 = _rand_aligned_pair(rng)
        rc = refaux.ref_eval_pair(a1.encode(), a2.encode(), out3)
        assert rc == 0
        ours = eval_pair(a1, a2)
        assert tuple(ours) == tuple(out3), f"trial={trial} {a1} {a2}"


def test_pair_consensus_parity(refaux):
    """paired.pair_consensus == C_pair_consensus for both prefer values
    and trim_overhang settings (reference: src/evaluate.cpp:124-174)."""
    from dada2_tpu.paired import pair_consensus

    rng = np.random.default_rng(107)
    cap = 4096
    buf = ctypes.create_string_buffer(cap)
    for trial in range(200):
        a1, a2 = _rand_aligned_pair(rng)
        for prefer in (1, 2):
            for trim in (False, True):
                L = refaux.ref_pair_consensus(
                    a1.encode(), a2.encode(), prefer, int(trim), buf, cap)
                assert L >= 0
                ours = pair_consensus(a1, a2, prefer, trim_overhang=trim)
                assert ours == buf.value.decode(), \
                    f"trial={trial} prefer={prefer} trim={trim}"


# ---------------------------------------------------------------------------
# chimera.cpp: C_is_bimera / C_table_bimera2
# ---------------------------------------------------------------------------

def _chimera_pool(rng, npar=6, L=140):
    """Parent sequences + queries that are sometimes true two-parent
    chimeras, sometimes mutated singles."""
    parents = [_rand_seq(rng, L, L + 1) for _ in range(npar)]
    queries = []
    for _ in range(10):
        r = rng.random()
        if r < 0.5:  # true chimera
            i, j = rng.choice(npar, 2, replace=False)
            cut = int(rng.integers(20, L - 20))
            q = parents[i][:cut] + parents[j][cut:]
            q = _mutate(rng, q, int(rng.integers(0, 2)))
        elif r < 0.8:  # near-copy of one parent
            q = _mutate(rng, parents[int(rng.integers(npar))],
                        int(rng.integers(1, 6)))
        else:
            q = _rand_seq(rng, L - 10, L + 10)
        queries.append(q)
    return parents, queries


def test_is_bimera_parity(refaux):
    """chimeras.is_bimera == C_is_bimera (reference:
    src/chimera.cpp:18-58) on chimeric / near-parent / random queries."""
    from dada2_tpu.chimeras import is_bimera
    from dada2_tpu.options import current_options

    opts = current_options()
    rng = np.random.default_rng(109)
    for trial in range(12):
        parents, queries = _chimera_pool(rng)
        enc = [p.encode() for p in parents]
        arr = (ctypes.c_char_p * len(enc))(*enc)
        for allow_oo in (False, True):
            for q in queries:
                r = refaux.ref_is_bimera(
                    q.encode(), arr, len(enc), int(allow_oo), 4,
                    opts.MATCH, opts.MISMATCH, opts.GAP_PENALTY, 16)
                assert r in (0, 1)
                ours = is_bimera(q, parents, allowOneOff=allow_oo)
                assert ours == bool(r), \
                    f"trial={trial} oo={allow_oo} q={q}"


def test_table_bimera2_parity(refaux):
    """_table_bimera_stats == C_table_bimera2's per-sequence (nflag,
    nsam) (reference: src/chimera.cpp:60-192)."""
    from dada2_tpu.chimeras import _table_bimera_stats
    from dada2_tpu.options import current_options

    opts = current_options()
    rng = np.random.default_rng(113)
    for trial in range(6):
        parents, queries = _chimera_pool(rng, npar=5, L=120)
        seqs = parents + queries
        ncol = len(seqs)
        nsam = 4
        mat = np.zeros((nsam, ncol), dtype=np.int32)
        for i in range(nsam):
            for j in range(ncol):
                if rng.random() < 0.7:
                    mat[i, j] = int(rng.integers(1, 40)) * \
                        (4 if j < len(parents) else 1)
        enc = [s.encode() for s in seqs]
        arr = (ctypes.c_char_p * ncol)(*enc)
        nflag = np.zeros(ncol, np.int32)
        nsam_out = np.zeros(ncol, np.int32)
        colmajor = np.asfortranarray(mat)
        for allow_oo in (False, True):
            rc = refaux.ref_table_bimera2(
                colmajor.ctypes.data_as(ctypes.c_void_p), nsam, ncol, arr,
                1.5, 2, int(allow_oo), 4, opts.MATCH, opts.MISMATCH,
                opts.GAP_PENALTY, 16,
                nflag.ctypes.data_as(ctypes.c_void_p),
                nsam_out.ctypes.data_as(ctypes.c_void_p))
            assert rc == 0
            our_flag, our_sam = _table_bimera_stats(
                mat.astype(np.int64), seqs, 1.5, 2, allow_oo, 4, 16, opts)
            np.testing.assert_array_equal(
                our_sam, nsam_out, err_msg=f"trial={trial} oo={allow_oo}")
            np.testing.assert_array_equal(
                our_flag, nflag, err_msg=f"trial={trial} oo={allow_oo}")


# ---------------------------------------------------------------------------
# taxonomy.cpp: C_assign_taxonomy2
# ---------------------------------------------------------------------------

def _tax_fixture(rng, ngenus=10, nlevel=3, refs_per=4, L=120, nq=18):
    """Well-separated genera: references are mutated copies of per-genus
    base sequences; queries are further-mutated references."""
    bases = [_rand_seq(rng, L, L + 1) for _ in range(ngenus)]
    refs, r2g = [], []
    for g in range(ngenus):
        for _ in range(refs_per):
            refs.append(_mutate(rng, bases[g], 6))
            r2g.append(g + 1)  # 1-based, as the R caller passes it
    genusmat = rng.integers(1, 5, size=(ngenus, nlevel)).astype(np.int32)
    # shared upper levels so bootstrap level-agreement is non-trivial
    genusmat[:, 0] = np.arange(ngenus) % 2 + 1
    queries = []
    for _ in range(nq):
        g = int(rng.integers(ngenus))
        queries.append(_mutate(rng, bases[g], 10))
    return refs, np.array(r2g, np.int32), genusmat, queries


def _seq_logp32(lgk, kmers):
    """Sequential float32 log-prob sums over all genera, in the given
    k-mer order — bitwise the reference's scoring loop
    (src/taxonomy.cpp:84-107; the early break cannot change the result
    because every addend is negative)."""
    if len(kmers) == 0:
        return np.zeros(lgk.shape[0], np.float32)
    return np.cumsum(lgk[:, kmers], axis=1, dtype=np.float32)[:, -1]


def _first_argmax(scores):
    """(winner, is_tied): first index achieving the float32 max, and
    whether the reference would reservoir-sample among ties."""
    mx = scores.max()
    w = np.nonzero(scores == mx)[0]
    return int(w[0]), len(w) > 1


def test_assign_taxonomy_parity(refaux):
    """C_assign_taxonomy2 vs (a) a sequential-float32 mirror of our lgk /
    karray semantics driven by the SAME uniform stream (bitwise:
    assignments, bootstrap draws, per-level agreement counts) and (b) the
    production MXU classifier (argmax identity on clear margins,
    bootstrap confidences statistically). reference:
    src/taxonomy.cpp:113-338."""
    import jax

    from dada2_tpu.encode import rc
    from dada2_tpu.taxonomy import (NBOOT, _build_lgk, _score_batch,
                                    tax_karray)

    rng = np.random.default_rng(127)
    refs, r2g, genusmat, queries = _tax_fixture(rng)
    ngenus, nlevel = genusmat.shape
    nq = len(queries)
    rcs = [rc(q) for q in queries]

    # fixed uniform stream through the runif hook
    karrays = [np.sort(tax_karray(q)) for q in queries]
    max_arraylen = max(len(a) for a in karrays)
    UN = nq * NBOOT * (max_arraylen // 8)
    stream = rng.random(UN)

    RUNIF = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                             ctypes.c_longlong)

    def fill(ptr, n):
        # no asserts: exceptions may not propagate out of a C callback
        ctypes.memmove(ptr, stream.ctypes.data, min(int(n), UN) * 8)

    hook = RUNIF(fill)
    refaux.set_runif_hook(hook)

    enc_q = (ctypes.c_char_p * nq)(*[q.encode() for q in queries])
    enc_rc = (ctypes.c_char_p * nq)(*[r.encode() for r in rcs])
    enc_ref = (ctypes.c_char_p * len(refs))(*[r.encode() for r in refs])
    tax_out = np.zeros(nq, np.int32)
    boot_out = np.zeros((nq, nlevel), np.int32)
    boot_tax_out = np.zeros((nq, NBOOT), np.int32)
    gm_rowmajor = np.ascontiguousarray(genusmat)
    nb = refaux.ref_assign_taxonomy(
        enc_q, enc_rc, nq, enc_ref, len(refs),
        np.ascontiguousarray(r2g).ctypes.data_as(ctypes.c_void_p),
        gm_rowmajor.ctypes.data_as(ctypes.c_void_p), ngenus, nlevel, 0,
        tax_out.ctypes.data_as(ctypes.c_void_p),
        boot_out.ctypes.data_as(ctypes.c_void_p),
        boot_tax_out.ctypes.data_as(ctypes.c_void_p))
    assert nb == NBOOT

    # --- (a) bitwise mirror: our lgk + sorted karray + the reference's
    # draw indexing (unifs stride j*max_arraylen, src/taxonomy.cpp:181-187)
    lgk = _build_lgk(refs, r2g - 1, ngenus)
    for j, q in enumerate(queries):
        ka = karrays[j]
        arraylen = len(ka)
        best, tied = _first_argmax(_seq_logp32(lgk, ka))
        if not tied:
            assert best + 1 == tax_out[j], f"q={j}"
        else:
            best = tax_out[j] - 1  # reference reservoir-sampled; adopt
        m = arraylen // 8
        unifs = stream[j * max_arraylen:]
        mirror_boot = np.zeros(nlevel, np.int64)
        for b in range(NBOOT):
            u = unifs[b * m: (b + 1) * m]
            draw = ka[(arraylen * u).astype(np.int64)]
            bg, btied = _first_argmax(_seq_logp32(lgk, draw))
            if not btied:
                assert bg + 1 == boot_tax_out[j, b], f"q={j} boot={b}"
            else:
                bg = boot_tax_out[j, b] - 1
            for lev in range(nlevel):
                if genusmat[bg, lev] == genusmat[best, lev]:
                    mirror_boot[lev] += 1
                else:
                    break
        np.testing.assert_array_equal(mirror_boot, boot_out[j],
                                      err_msg=f"q={j}")

    # --- (b) production MXU classifier: argmax parity on clear margins,
    # bootstrap confidences within sampling noise
    import jax.numpy as jnp

    lgk_dev = jnp.asarray(lgk)
    karrs = [tax_karray(q) for q in queries]
    best_p, logp_p, boot_p = _score_batch(karrs, lgk_dev,
                                          jax.random.PRNGKey(5), ngenus)
    prod_boot = np.zeros((nq, nlevel), np.int64)
    for j in range(nq):
        scores = _seq_logp32(lgk, karrays[j])
        top2 = np.sort(scores)[-2:]
        if top2[1] - top2[0] > 1e-2:  # clear margin -> must agree
            assert best_p[j] + 1 == tax_out[j], f"q={j}"
        for bg in boot_p[j]:
            for lev in range(nlevel):
                if genusmat[int(bg), lev] == genusmat[best_p[j], lev]:
                    prod_boot[j, lev] += 1
                else:
                    break
    diff = np.abs(prod_boot - boot_out)
    assert diff.max() <= 30 and diff.mean() <= 6.0, \
        (diff.max(), diff.mean())
