"""Parity: batched JAX NW (ops/nw_batch) vs the exact oracle (ops/nw_ref)."""
import numpy as np
import pytest

from dada2_tpu.ops.nw_ref import GAP, nw_align_ref
from dada2_tpu.ops.nw_batch import nw_batch, steps_to_alignment
from dada2_tpu.ops.subs import al2subs


def _random_pair(rng, lmin=8, lmax=60, mutate=True):
    l1 = int(rng.integers(lmin, lmax))
    s1 = rng.integers(0, 4, l1).astype(np.uint8)
    if mutate:
        # derive s2 from s1 with subs/indels so alignments are non-trivial
        s2 = list(s1)
        for _ in range(int(rng.integers(0, 8))):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, len(s2))) if s2 else 0
            if op == 0 and s2:
                s2[p] = int(rng.integers(0, 4))
            elif op == 1 and len(s2) > lmin:
                del s2[p]
            else:
                s2.insert(p, int(rng.integers(0, 4)))
        s2 = np.array(s2, dtype=np.uint8)
    else:
        s2 = rng.integers(0, 4, int(rng.integers(lmin, lmax))).astype(np.uint8)
    return s1, s2


def _run_batch(pairs, match, mismatch, gap, egp, band):
    n = len(pairs)
    L1 = max(len(a) for a, _ in pairs)
    L2 = max(len(b) for _, b in pairs)
    s1b = np.full((n, L1), 255, np.uint8)
    s2b = np.full((n, L2), 255, np.uint8)
    l1 = np.zeros(n, np.int32)
    l2 = np.zeros(n, np.int32)
    for k, (a, b) in enumerate(pairs):
        s1b[k, : len(a)] = a
        s2b[k, : len(b)] = b
        l1[k], l2[k] = len(a), len(b)
    kinds, p0, p1, ham, tvec, ok = nw_batch(
        s1b, l1, s2b, l2, match=match, mismatch=mismatch, gap_p=gap,
        end_gap_p=egp, band=band)
    return (np.asarray(kinds), np.asarray(p0), np.asarray(p1),
            np.asarray(ham), np.asarray(tvec), np.asarray(ok))


@pytest.mark.parametrize("band,egp", [(-1, 0), (16, 0), (4, 0), (16, -8),
                                      (2, 0), (999, 0)])
def test_vec_parity_random(band, egp):
    rng = np.random.default_rng(hash((band, egp)) % 2**32)
    match, mismatch, gap = 5, -4, -8
    pairs = [_random_pair(rng) for _ in range(40)]
    pairs += [_random_pair(rng, mutate=False) for _ in range(10)]
    kinds, p0, p1, ham, tvec, ok = _run_batch(pairs, match, mismatch, gap,
                                              egp, band)
    assert ok.all()
    for k, (a, b) in enumerate(pairs):
        ref0, ref1 = nw_align_ref(a, b, match, mismatch, gap, egp, band,
                                  mode="vec")
        got0, got1 = steps_to_alignment(kinds[k], p0[k], p1[k], a, b)
        assert np.array_equal(ref0, got0), f"pair {k} al0 mismatch"
        assert np.array_equal(ref1, got1), f"pair {k} al1 mismatch"
        # derived outputs match al2subs on the oracle alignment
        sub = al2subs(ref0, ref1)
        assert ham[k] == sub.nsubs
        tv = 5 * b.astype(np.int64)
        if sub.nsubs:
            tv[sub.map[sub.pos]] = 4 * sub.nt0.astype(np.int64) + sub.nt1
        assert np.array_equal(tvec[k, : len(b)], tv)
        assert (tvec[k, len(b):] == 16).all()


def test_identical_sequences():
    rng = np.random.default_rng(7)
    s = rng.integers(0, 4, 30).astype(np.uint8)
    kinds, p0, p1, ham, tvec, ok = _run_batch([(s, s)], 5, -4, -8, 0, 16)
    assert ok.all() and ham[0] == 0
    a0, a1 = steps_to_alignment(kinds[0], p0[0], p1[0], s, s)
    assert np.array_equal(a0, s) and np.array_equal(a1, s)


def test_mixed_length_batch():
    """One batch mixing very different length offsets exercises per-pair
    band geometry and window padding."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, 80).astype(np.uint8)
    pairs = []
    for off in (0, 3, 10, 25):
        pairs.append((base, base[off:]))
        pairs.append((base[off:], base))
    kinds, p0, p1, ham, tvec, ok = _run_batch(pairs, 5, -4, -8, 0, 16)
    assert ok.all()
    for k, (a, b) in enumerate(pairs):
        ref0, ref1 = nw_align_ref(a, b, 5, -4, -8, 0, 16, mode="vec")
        got0, got1 = steps_to_alignment(kinds[k], p0[k], p1[k], a, b)
        assert np.array_equal(ref0, got0) and np.array_equal(ref1, got1)
        assert ham[k] == 0  # pure shifts have no substitutions in-band


@pytest.mark.parametrize("egp,params", [(0, (1, -64, -64)),
                                        (0, (1, -8, -8)),
                                        (-8, (5, -4, -8))])
def test_scalar_mode_parity(egp, params):
    """Batched scalar mode vs the oracle scalar aligner (the mergePairs
    configuration: unbanded, ends-free, merge scoring)."""
    match, mismatch, gap = params
    rng = np.random.default_rng(hash((egp, params)) % 2**32)
    pairs = [_random_pair(rng, lmin=10, lmax=50) for _ in range(30)]
    kinds, p0, p1, ham, tvec, ok = _run_batch(pairs, match, mismatch, gap,
                                              egp, -1)
    assert ok.all()
    from dada2_tpu.ops.nw_batch import nw_batch
    n = len(pairs)
    L1 = max(len(a) for a, _ in pairs)
    L2 = max(len(b) for _, b in pairs)
    s1b = np.full((n, L1), 255, np.uint8)
    s2b = np.full((n, L2), 255, np.uint8)
    l1 = np.array([len(a) for a, _ in pairs], np.int64)
    l2 = np.array([len(b) for _, b in pairs], np.int64)
    for k, (a, b) in enumerate(pairs):
        s1b[k, : len(a)] = a
        s2b[k, : len(b)] = b
    out = nw_batch(s1b, l1, s2b, l2, match=match, mismatch=mismatch,
                   gap_p=gap, end_gap_p=egp, band=-1, mode="scalar")
    kinds, p0, p1 = (np.asarray(out[0]), np.asarray(out[1]),
                     np.asarray(out[2]))
    assert np.asarray(out[5]).all()
    for k, (a, b) in enumerate(pairs):
        ref0, ref1 = nw_align_ref(a, b, match, mismatch, gap, egp, -1,
                                  mode="scalar")
        got0, got1 = steps_to_alignment(kinds[k], p0[k], p1[k], a, b)
        assert np.array_equal(ref0, got0), f"pair {k} al0"
        assert np.array_equal(ref1, got1), f"pair {k} al1"


def test_scalar_banded_homo_parity():
    """Batched scalar mode (banded, homopolymer) vs the scalar oracle,
    which is itself fuzz-verified against the compiled reference
    (tests/test_reference_parity.py)."""
    from dada2_tpu.ops import nw_batch as nwb
    from dada2_tpu.ops import nw_ref

    rng = np.random.default_rng(31)
    for trial in range(40):
        l1 = int(rng.integers(40, 120))
        s1 = rng.integers(0, 4, l1).astype(np.uint8)
        # homopolymer runs
        for _ in range(3):
            p = int(rng.integers(0, l1 - 8))
            s1[p: p + int(rng.integers(3, 7))] = int(rng.integers(0, 4))
        s2 = s1.copy().tolist()
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, len(s2)))
            op = rng.random()
            if op < 0.4:
                s2[p] = int(rng.integers(0, 4))
            elif op < 0.7 and len(s2) > 30:
                del s2[p]
            else:
                s2.insert(p, int(rng.integers(0, 4)))
        s2 = np.array(s2, np.uint8)
        band = int(rng.choice([-1, 8, 16, 32]))
        hgp = [None, -1, -3][trial % 3]
        egp = 0 if trial % 4 else -8  # mostly endsfree, some global

        ours = nw_ref.nw_align_ref(s1, s2, 5, -4, -8, end_gap_p=egp,
                                   band=band, mode="scalar",
                                   homo_gap_p=hgp)
        L = max(l1, len(s2))
        s1p = np.full((1, L), 255, np.uint8)
        s2p = np.full((1, L), 255, np.uint8)
        s1p[0, :l1] = s1
        s2p[0, : len(s2)] = s2
        out = nwb.nw_batch(s1p, np.array([l1]), s2p,
                           np.array([len(s2)]), match=5, mismatch=-4,
                           gap_p=-8, end_gap_p=egp, band=band,
                           mode="scalar", homo_gap_p=hgp)
        kinds, p0, p1 = (np.asarray(out[0])[0], np.asarray(out[1])[0],
                         np.asarray(out[2])[0])
        assert np.asarray(out[5])[0], f"trial {trial}: traceback failed"
        a0, a1 = nwb.steps_to_alignment(kinds, p0, p1, s1, s2)
        np.testing.assert_array_equal(
            a0, ours[0], err_msg=f"trial {trial} band={band} hgp={hgp}")
        np.testing.assert_array_equal(a1, ours[1])


def test_homo_mask_batch():
    from dada2_tpu.ops.nw_batch import homo_mask_batch
    from dada2_tpu.ops.nw_ref import _homo_mask

    rng = np.random.default_rng(5)
    for _ in range(50):
        L = int(rng.integers(3, 80))
        s = rng.integers(0, 3, L).astype(np.uint8)
        m = homo_mask_batch(s[None, :], np.array([L]))[0]
        np.testing.assert_array_equal(m, _homo_mask(s))
