"""Chimera detection on synthetic bimeras and real dada output."""
import numpy as np
import pandas as pd
import pytest

from dada2_tpu.chimeras import (is_bimera, is_bimera_denovo,
                                is_bimera_denovo_table, is_shift_denovo,
                                remove_bimera_denovo)


@pytest.fixture(scope="module")
def parents():
    rng = np.random.default_rng(42)
    nt = "ACGT"
    a = "".join(nt[i] for i in rng.integers(0, 4, 120))
    # parent B shares no structure with A
    b = "".join(nt[i] for i in rng.integers(0, 4, 120))
    return a, b


def test_is_bimera_synthetic(parents):
    a, b = parents
    chimera = a[:60] + b[60:]
    assert is_bimera(chimera, [a, b])
    assert not is_bimera(a, [b])
    # a sequence with a private mutation in the middle is NOT an exact
    # bimera
    mut = list(chimera)
    mut[60] = "A" if mut[60] != "A" else "C"
    mut = "".join(mut)
    assert not is_bimera(mut, [a, b])
    # ...but is a one-off bimera
    assert is_bimera(mut, [a, b], allowOneOff=True)


def test_is_bimera_denovo(parents):
    a, b = parents
    chimera = a[:60] + b[60:]
    unqs = {a: 100, b: 80, chimera: 5}
    bim = is_bimera_denovo(unqs)
    assert not bim[a] and not bim[b] and bim[chimera]


def test_is_bimera_denovo_table(parents):
    a, b = parents
    chimera = a[:60] + b[60:]
    st = pd.DataFrame(
        [[100, 80, 5], [50, 60, 3], [70, 10, 0]],
        index=["s1", "s2", "s3"], columns=[a, b, chimera])
    bim = is_bimera_denovo_table(st)
    assert bim[chimera] and not bim[a] and not bim[b]
    out = remove_bimera_denovo(st, method="consensus")
    assert list(out.columns) == [a, b]
    out2 = remove_bimera_denovo(st, method="pooled")
    assert chimera not in out2.columns
    out3 = remove_bimera_denovo(st, method="per-sample")
    assert chimera not in out3.columns


def test_remove_bimera_uniques(parents):
    a, b = parents
    chimera = a[:60] + b[60:]
    out = remove_bimera_denovo({a: 100, b: 80, chimera: 5})
    assert set(out) == {a, b}


def test_is_shift_denovo(parents):
    a, b = parents
    # true shift: loses a prefix, gains an unrelated suffix
    shifted = a[10:] + b[:10]
    unqs = {a: 100, shifted: 5}
    sh = is_shift_denovo(unqs)
    assert sh[shifted] and not sh[a]
    # strict subsequence only flagged with flagSubseqs
    sub = a[10:]
    unqs2 = {a: 100, sub: 5}
    assert not is_shift_denovo(unqs2)[sub]
    assert is_shift_denovo(unqs2, flagSubseqs=True)[sub]


# ---------------------------------------------------------------------------
# Vectorized lr/ham scans vs the scalar pointer-walk ORACLES (exact
# ports of the reference's get_lr / get_ham_endsfree,
# src/chimera.cpp:228-269 and :196-224, kept here for fuzzing only)
# ---------------------------------------------------------------------------

from dada2_tpu.chimeras import _lr_ham_batch, _PAD  # noqa: E402
from dada2_tpu.ops.nw_ref import GAP  # noqa: E402


def _oracle_ham_endsfree(al0, al1):
    n = len(al0)
    i = 0
    gap1 = al0[i] == GAP
    gap2 = al1[i] == GAP
    while gap1 or gap2:
        i += 1
        gap1 = gap1 and al0[i] == GAP
        gap2 = gap2 and al1[i] == GAP
    j = n - 1
    gap1 = al0[j] == GAP
    gap2 = al1[j] == GAP
    while gap1 or gap2:
        j -= 1
        gap1 = gap1 and al0[j] == GAP
        gap2 = gap2 and al1[j] == GAP
    return int(np.sum(al0[i: j + 1] != al1[i: j + 1]))


def _oracle_get_lr(al0, al1, allow_one_off, max_shift):
    n = len(al0)
    pos = 0
    left = 0
    while pos < n and al0[pos] == GAP:
        pos += 1
    while pos < max_shift and al1[pos] == GAP:
        pos += 1
        left += 1
    while pos < n and al0[pos] == al1[pos]:
        pos += 1
        left += 1
    left_oo = right_oo = 0
    if allow_one_off:
        left_oo = left
        pos += 1
        if pos < n and al0[pos] != GAP:
            left_oo += 1
        while pos < n and al0[pos] == al1[pos]:
            pos += 1
            left_oo += 1
    pos = n - 1
    right = 0
    while pos >= 0 and al0[pos] == GAP:
        pos -= 1
    while pos > n - max_shift and al1[pos] == GAP:
        pos -= 1
        right += 1
    while pos >= 0 and al0[pos] == al1[pos]:
        pos -= 1
        right += 1
    if allow_one_off:
        right_oo = right
        pos -= 1
        if pos >= 0 and al0[pos] != GAP:
            right_oo += 1
        while pos >= 0 and al0[pos] == al1[pos]:
            pos -= 1
            right_oo += 1
    return left, right, left_oo, right_oo


def _random_alignment_pair(rng, n):
    """A plausible gapped alignment: never GAP in both rows at once;
    end-gap runs on either side; mismatches and interior indels."""
    al0 = rng.integers(1, 5, n).astype(np.uint8)
    al1 = np.where(rng.random(n) < 0.7, al0,
                   rng.integers(1, 5, n)).astype(np.uint8)
    # leading/trailing end gaps on one row per side (bounded so no row
    # is ever all-gap — impossible in a real alignment)
    lead = int(rng.integers(0, min(25, n // 3 + 1)))
    trail = int(rng.integers(0, min(25, n // 3 + 1)))
    if lead:
        (al0 if rng.random() < 0.5 else al1)[:lead] = GAP
    if trail:
        (al0 if rng.random() < 0.5 else al1)[n - trail:] = GAP
    # sparse interior gaps
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(lead + 1, max(lead + 2, n - trail - 1)))
        (al0 if rng.random() < 0.5 else al1)[p] = GAP
    # guard: no double-gap columns
    both = (al0 == GAP) & (al1 == GAP)
    al1[both] = 1
    return al0, al1


@pytest.mark.parametrize("allow_one_off", [False, True])
@pytest.mark.parametrize("max_shift", [1, 4, 16, 64])
def test_lr_ham_batch_vs_oracle(allow_one_off, max_shift):
    rng = np.random.default_rng(12345 + max_shift)
    P = 300
    lens = rng.integers(8, 200, P)
    Lmax = int(lens.max())
    A = np.full((P, Lmax), _PAD, np.uint8)
    B = np.full((P, Lmax), _PAD, np.uint8)
    pairs = []
    for p in range(P):
        a0, a1 = _random_alignment_pair(rng, int(lens[p]))
        A[p, : lens[p]] = a0
        B[p, : lens[p]] = a1
        pairs.append((a0, a1))
    left, right, left_oo, right_oo, ham = _lr_ham_batch(
        A, B, lens.astype(np.int64), allow_one_off, max_shift)
    for p, (a0, a1) in enumerate(pairs):
        el, er, elo, ero = _oracle_get_lr(a0, a1, allow_one_off,
                                          max_shift)
        assert (left[p], right[p]) == (el, er), p
        if allow_one_off:
            assert (left_oo[p], right_oo[p]) == (elo, ero), p
            assert ham[p] == _oracle_ham_endsfree(a0, a1), p


def test_device_lr_stats_match_host_scans():
    """The on-device stats path (traceback steps -> stats, no host
    alignment materialization) must equal the host numpy scan pipeline
    on real nw_batch outputs."""
    from dada2_tpu.chimeras import (_alignment_code_mats, _batch_lr_stats,
                                    _lr_ham_batch)
    from dada2_tpu.encode import pack_sequences

    rng = np.random.default_rng(77)
    nt = np.array(list("ACGT"))
    base = "".join(nt[rng.integers(0, 4, 150)])
    seqs = [base]
    for _ in range(40):
        s = list(base)
        for _ in range(int(rng.integers(0, 12))):
            s[int(rng.integers(0, len(s)))] = nt[rng.integers(0, 4)]
        if rng.random() < 0.4:  # shifts / indels
            cut = int(rng.integers(1, 10))
            s = s[cut:] if rng.random() < 0.5 else \
                list(nt[rng.integers(0, 4, cut)]) + s
        seqs.append("".join(s))
    pairs = [(0, k) for k in range(1, len(seqs))] + \
        [(k, 0) for k in range(1, len(seqs), 3)]
    for allow_oo, max_shift in ((False, 16), (True, 16), (True, 4)):
        dev = _batch_lr_stats(pairs, seqs, max_shift, 5, -4, -8, allow_oo)
        mat, lens = pack_sequences(seqs)
        A, B, m = _alignment_code_mats(pairs, mat, lens, max_shift,
                                       5, -4, -8)
        host = _lr_ham_batch(A, B, m, allow_oo, max_shift)
        for k in range(5):
            np.testing.assert_array_equal(dev[k], host[k],
                                          err_msg=f"stat {k}")


def test_lr_stats_pallas_route_parity(monkeypatch):
    """The wavefront-kernel lr/ham route (alignment reconstructed on
    device from the kernel's merged map rows) must match the nw_batch
    route exactly — which is itself fuzzed against the scalar pointer
    walks above."""
    import numpy as np

    from dada2_tpu.chimeras import (_batch_lr_stats, _batch_lr_stats_pallas,
                                    _chimera_backend)

    rng = np.random.default_rng(23)
    nt = np.array(list("ACGT"))
    base = ["".join(nt[rng.integers(0, 4, 60)]) for _ in range(6)]
    seqs = []
    for k in range(40):
        s = list(base[k % 6])
        for _ in range(int(rng.integers(0, 4))):
            s[int(rng.integers(0, len(s)))] = nt[rng.integers(0, 4)]
        if rng.random() < 0.3:   # shifts/indels across the band
            cut = int(rng.integers(1, 8))
            s = s[cut:] + list(nt[rng.integers(0, 4, cut)])
        seqs.append("".join(s))
    pairs = [(i, int(j)) for i in range(40)
             for j in rng.integers(0, 40, 5) if int(j) != i]

    monkeypatch.delenv("DADA2_TPU_PALLAS", raising=False)
    ref = _batch_lr_stats(pairs, seqs, 16, 5, -4, -8, True)

    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    be, bopts = _chimera_backend(seqs, 5, -4, -8, 16)
    assert be is not None and be.use_pallas
    got = _batch_lr_stats_pallas(be, bopts, pairs, 16, True)
    assert got is not None
    for a, b, name in zip(got, ref,
                          ("left", "right", "left_oo", "right_oo",
                           "ham")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_lr_stats_pairs_mode_mixed_lengths(monkeypatch):
    """Pairs-mode specifics: queries of DIFFERENT lengths land in
    different blocks (len1 is block-uniform); parity against both the
    nw_batch route and the per-query fallback sweep."""
    import numpy as np

    from dada2_tpu import chimeras as ch

    rng = np.random.default_rng(31)
    nt = np.array(list("ACGT"))
    seqs = []
    for k in range(50):
        L = int(rng.choice([52, 57, 60, 64]))
        s = list(nt[rng.integers(0, 4, L)])
        seqs.append("".join(s))
    # clustered variants so some pairs have real lr credit
    for k in range(10):
        s = list(seqs[k])
        s[5] = "A" if s[5] != "A" else "C"
        seqs.append("".join(s))
    pairs = [(i, int(j)) for i in range(len(seqs))
             for j in rng.integers(0, len(seqs), 4) if int(j) != i]

    monkeypatch.delenv("DADA2_TPU_PALLAS", raising=False)
    ref = ch._batch_lr_stats(pairs, seqs, 16, 5, -4, -8, True)

    monkeypatch.setenv("DADA2_TPU_PALLAS", "1")
    be, bopts = ch._chimera_backend(seqs, 5, -4, -8, 16)
    assert be is not None and be.use_pallas
    qi = np.fromiter((p[0] for p in pairs), np.int64, len(pairs))
    pi = np.fromiter((p[1] for p in pairs), np.int64, len(pairs))
    got = ch._pairs_lr_stats(be, bopts, qi, pi, 16, True)
    assert got is not None
    for a, b, name in zip(got, ref,
                          ("left", "right", "left_oo", "right_oo",
                           "ham")):
        np.testing.assert_array_equal(a, b, err_msg=name)
    # the per-query fallback sweep must agree too (it is the route for
    # geometry misfits)
    monkeypatch.setattr(ch, "_pairs_lr_stats",
                        lambda *a, **k: None)
    got3 = ch._batch_lr_stats_pallas(be, bopts, pairs, 16, True)
    assert got3 is not None
    for a, b in zip(got3, ref):
        np.testing.assert_array_equal(a, b)
