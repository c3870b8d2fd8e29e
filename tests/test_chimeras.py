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
