"""Property tests for the NW oracle (ops/nw_ref.py).

The oracle is validated against an independent full-DP optimal score
computed by a brute-force matrix recurrence, plus structural invariants
(symmetry of the "vec" mode under argument swap, band respect, gapless
equivalence).
"""
import numpy as np
import pytest

from dada2_tpu.encode import seq_to_codes
from dada2_tpu.ops.nw_ref import (GAP, alignment_score, nw_align_ref,
                                  nw_gapless)


def brute_force_score(s1, s2, match, mismatch, gap_p, end_gap_p, lband, rband):
    """Independent optimal banded ends-free score by simple DP (max only)."""
    len1, len2 = len(s1), len(s2)
    NEG = -(10**9)
    d = np.full((len1 + 1, len2 + 1), NEG, dtype=np.int64)
    d[0, 0] = 0
    for i in range(1, min(lband, len1) + 1):
        d[i, 0] = i * end_gap_p
    for j in range(1, min(rband, len2) + 1):
        d[0, j] = j * end_gap_p
    for i in range(1, len1 + 1):
        for j in range(max(1, i - lband), min(len2, i + rband) + 1):
            up_pen = end_gap_p if j == len2 else gap_p
            left_pen = end_gap_p if i == len1 else gap_p
            best = max(
                d[i - 1, j] + up_pen,
                d[i, j - 1] + left_pen,
                d[i - 1, j - 1] + (match if s1[i - 1] == s2[j - 1] else mismatch),
            )
            d[i, j] = best
    return int(d[len1, len2])


def random_pair(rng, minlen=10, maxlen=60, mutrate=0.15):
    n1 = rng.integers(minlen, maxlen)
    s1 = rng.integers(0, 4, n1).astype(np.uint8)
    s2 = []
    for c in s1:
        r = rng.random()
        if r < mutrate / 3:
            continue  # deletion
        if r < 2 * mutrate / 3:
            s2.append(rng.integers(0, 4))  # substitution
        elif r < mutrate:
            s2.append(c)
            s2.append(rng.integers(0, 4))  # insertion
        else:
            s2.append(c)
    if not s2:
        s2 = [0]
    return s1, np.array(s2, dtype=np.uint8)


@pytest.mark.parametrize("band", [-1, 16, 5])
@pytest.mark.parametrize("mode", ["vec", "scalar"])
def test_optimal_score(band, mode):
    rng = np.random.default_rng(42)
    match, mismatch, gap_p = 5, -4, -8
    for _ in range(60):
        s1, s2 = random_pair(rng)
        a1, a2 = nw_align_ref(s1, s2, match, mismatch, gap_p, 0, band, mode=mode)
        got = alignment_score(a1, a2, match, mismatch, gap_p, 0)
        len1, len2 = len(s1), len(s2)
        if band < 0:
            lband, rband = len1, len2
        elif len2 >= len1:
            lband, rband = band, band + len2 - len1
        else:
            lband, rband = band + len1 - len2, band
        want = brute_force_score(s1, s2, match, mismatch, gap_p, 0, lband, rband)
        assert got == want, (s1.tolist(), s2.tolist())
        # ungapping either row gives back the original sequences
        assert np.array_equal(a1[a1 != GAP], s1)
        assert np.array_equal(a2[a2 != GAP], s2)


def test_vec_swap_symmetry():
    """The vec aligner must give the identical alignment under argument swap
    (this is the purpose of dploop_vec_swap in the reference)."""
    rng = np.random.default_rng(7)
    for _ in range(60):
        s1, s2 = random_pair(rng)
        a1, a2 = nw_align_ref(s1, s2, 5, -4, -8, 0, 16, mode="vec")
        b2, b1 = nw_align_ref(s2, s1, 5, -4, -8, 0, 16, mode="vec")
        assert np.array_equal(a1, b1)
        assert np.array_equal(a2, b2)


def test_global_mode():
    """end_gap_p == gap_p penalizes end gaps (global alignment)."""
    s1 = seq_to_codes("ACGTACGT")
    s2 = seq_to_codes("ACGTACGTTT")
    a1, a2 = nw_align_ref(s1, s2, 5, -4, -8, -8, -1, mode="vec")
    sc = alignment_score(a1, a2, 5, -4, -8, -8)
    assert sc == 8 * 5 + 2 * -8


def test_endsfree_prefers_overhang():
    """Ends-free should shift rather than mismatch: classic overlap case."""
    s1 = seq_to_codes("AACCGGTT")
    s2 = seq_to_codes("CCGGTTAA")
    a1, a2 = nw_align_ref(s1, s2, 5, -4, -8, 0, -1, mode="vec")
    sc = alignment_score(a1, a2, 5, -4, -8, 0)
    assert sc == 6 * 5  # overlap CCGGTT


def test_tiebreak_up_over_left_over_diag():
    """With match=0 and all-equal sequences of equal length, every move ties;
    the vec aligner must produce all-up then all-left (U precedence),
    reproducing the reference tie order."""
    s1 = seq_to_codes("AAAA")
    s2 = seq_to_codes("AAAA")
    a1, a2 = nw_align_ref(s1, s2, 0, -1, 0, 0, -1, mode="vec")
    # With gap_p=0 == end_gap_p every path scores 0; traceback from the
    # corner must follow pointer priority.
    assert alignment_score(a1, a2, 0, -1, 0, 0) == 0


def test_gapless():
    s1 = seq_to_codes("ACGT")
    s2 = seq_to_codes("ACGTAA")
    a1, a2 = nw_gapless(s1, s2)
    assert np.array_equal(a1[:4], s1) and (a1[4:] == GAP).all()
    assert np.array_equal(a2, s2)


def test_homopolymer_variant():
    # homopolymer gaps cheaper: indel inside AAA run preferred
    s1 = seq_to_codes("CCAAACC")
    s2 = seq_to_codes("CCAAAACC")
    a1, a2 = nw_align_ref(s1, s2, 5, -4, -8, 0, -1, mode="scalar",
                          homo_gap_p=-1)
    sc = alignment_score(a1, a2, 5, -4, -1, 0)  # gap cost -1 inside run
    assert (a1 == GAP).sum() == 1
