"""Parity: Pallas wavefront NW kernel (interpret mode on CPU) vs oracle."""
import numpy as np
import pytest

from dada2_tpu.ops.nw_ref import nw_align_ref
from dada2_tpu.ops.nw_batch import steps_to_alignment
from dada2_tpu.ops.nw_pallas import nw_pallas_grouped
from dada2_tpu.ops.subs import al2subs


def _mutate(rng, s, lmin=8, nops=6):
    s2 = list(s)
    for _ in range(int(rng.integers(0, nops))):
        op = rng.integers(0, 3)
        p = int(rng.integers(0, len(s2))) if s2 else 0
        if op == 0 and s2:
            s2[p] = int(rng.integers(0, 4))
        elif op == 1 and len(s2) > lmin:
            del s2[p]
        else:
            s2.insert(p, int(rng.integers(0, 4)))
    return np.array(s2, dtype=np.uint8)


def _check(s1, cands, band, egp=0):
    n = len(cands)
    L2 = max(len(c) for c in cands)
    s2b = np.full((n, L2), 255, np.uint8)
    l2b = np.zeros(n, np.int64)
    for k, c in enumerate(cands):
        s2b[k, : len(c)] = c
        l2b[k] = len(c)
    kinds, p0, p1, ham, tvec, ok = nw_pallas_grouped(
        s1, len(s1), s2b, l2b, match=5, mismatch=-4, gap_p=-8,
        end_gap_p=egp, band=band, interpret=True)
    assert ok.all()
    for k, c in enumerate(cands):
        ref0, ref1 = nw_align_ref(s1, c, 5, -4, -8, egp, band, mode="vec")
        got0, got1 = steps_to_alignment(kinds[k], p0[k], p1[k], s1, c)
        assert np.array_equal(ref0, got0), f"pair {k} al0"
        assert np.array_equal(ref1, got1), f"pair {k} al1"
        sub = al2subs(ref0, ref1)
        assert ham[k] == sub.nsubs
        tv = 5 * c.astype(np.int64)
        if sub.nsubs:
            tv[sub.map[sub.pos]] = 4 * sub.nt0.astype(np.int64) + sub.nt1
        assert np.array_equal(tvec[k, : len(c)], tv)


@pytest.mark.parametrize("band", [4, 16])
def test_pallas_parity_uniform_len(band):
    rng = np.random.default_rng(band)
    s1 = rng.integers(0, 4, 40).astype(np.uint8)
    # same-length candidates (substitutions only)
    cands = []
    for _ in range(5):
        c = s1.copy()
        for _ in range(int(rng.integers(0, 6))):
            c[int(rng.integers(0, len(c)))] = int(rng.integers(0, 4))
        cands.append(c)
    cands.append(rng.integers(0, 4, 40).astype(np.uint8))
    _check(s1, cands, band)


def test_pallas_parity_mixed_lengths():
    rng = np.random.default_rng(99)
    s1 = rng.integers(0, 4, 50).astype(np.uint8)
    cands = [_mutate(rng, s1) for _ in range(9)]
    cands += [s1[5:], s1[:44], rng.integers(0, 4, 31).astype(np.uint8)]
    _check(s1, cands, 16)


@pytest.mark.parametrize("len1", [150, 251])
def test_pallas_parity_long_sequences(len1):
    """Amplicon-scale lengths: len1 >= 2*WP engages the interior-phase
    fast body and its 4-diagonal chunks plus the unaligned remainders
    at the phase boundaries; short fuzz cases (no_mid) never reach that
    code."""
    rng = np.random.default_rng(len1)
    s1 = rng.integers(0, 4, len1).astype(np.uint8)
    cands = [_mutate(rng, s1, nops=20) for _ in range(7)]
    cands += [s1[8:], s1[: len1 - 13],
              rng.integers(0, 4, len1 - 5).astype(np.uint8)]
    _check(s1, cands, 16)
    _check(s1, cands, 4)


def test_pallas_parity_global_endgaps():
    rng = np.random.default_rng(5)
    s1 = rng.integers(0, 4, 30).astype(np.uint8)
    cands = [_mutate(rng, s1) for _ in range(4)]
    _check(s1, cands, 16, egp=-8)


def test_pallas_multi_block():
    """More than 128 candidates of one length forces multiple blocks."""
    rng = np.random.default_rng(13)
    s1 = rng.integers(0, 4, 24).astype(np.uint8)
    cands = []
    for _ in range(140):
        c = s1.copy()
        c[int(rng.integers(0, 24))] = int(rng.integers(0, 4))
        cands.append(c)
    _check(s1, cands, 8)


def test_pack_s2_blocks_matches_scatter_formula():
    """The per-block contiguous-flip packing must equal the original
    storage rule s2rows[row, l2max-1-p] = s2b[row, p] (p < len2)."""
    import dada2_tpu.ops.nw_pallas as nwp

    rng = np.random.default_rng(7)
    n, L, L2R = 333, 96, 128
    lens = rng.integers(40, 97, n)
    s2b = rng.integers(0, 200, (n, L)).astype(np.int32)
    bidx = nwp.assemble_blocks(
        (lens[:, None] > np.arange(L)).astype(np.int8), lens)
    got = nwp.pack_s2_blocks(s2b, lens, bidx, L2R)
    flat = bidx.reshape(-1)
    lf = lens[flat]
    l2m = np.repeat(lf.reshape(-1, nwp.LANES).max(axis=1), nwp.LANES)
    pos = np.arange(L)[None, :]
    valid = pos < lf[:, None]
    tgt = l2m[:, None] - 1 - pos
    rows = np.broadcast_to(np.arange(len(flat))[:, None], tgt.shape)
    s2rows = np.zeros((len(flat), L2R), np.int32)
    s2rows[rows[valid], tgt[valid]] = s2b[flat][valid]
    want = np.ascontiguousarray(
        s2rows.reshape(-1, nwp.LANES, L2R).transpose(0, 2, 1))
    np.testing.assert_array_equal(got, want)
