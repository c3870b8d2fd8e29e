"""Sequence tables: construction, collapse, merge, exporters."""
import numpy as np
import pandas as pd
import pytest

import dada2_tpu as d2


def test_make_sequence_table_order():
    st = d2.make_sequence_table({"s1": {"AAAATTTT": 5, "CCCCGGGG": 10},
                                 "s2": {"AAAATTTT": 7}})
    assert list(st.columns) == ["AAAATTTT", "CCCCGGGG"]  # 12 > 10
    assert st.loc["s2", "CCCCGGGG"] == 0
    st2 = d2.make_sequence_table({"s1": {"AAAATTTT": 5, "CCCCGGGG": 10},
                                  "s2": {"AAAATTTT": 7}},
                                 orderBy="nsamples")
    assert list(st2.columns)[0] == "AAAATTTT"


def test_collapse_no_mismatch():
    rng = np.random.default_rng(0)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    shifted = base[3:]          # identical up to a shift
    other = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    st = d2.make_sequence_table({"s1": {base: 50, shifted: 5, other: 20}})
    out = d2.collapse_no_mismatch(st, minOverlap=20)
    assert out.shape[1] == 2
    assert out.loc["s1", base] == 55  # shifted collapsed into base
    assert out.loc["s1", other] == 20


def test_merge_sequence_tables():
    st1 = d2.make_sequence_table({"s1": {"AAAATTTT": 5}})
    st2 = d2.make_sequence_table({"s2": {"CCCCGGGG": 3, "AAAATTTT": 1}})
    m = d2.merge_sequence_tables(st1, st2)
    assert m.shape == (2, 2)
    assert m.loc["s1", "CCCCGGGG"] == 0
    # duplicate sample names error by default, sum when asked
    with pytest.raises(ValueError):
        d2.merge_sequence_tables(st1, st1)
    summed = d2.merge_sequence_tables(st1, st1, repeats="sum")
    assert summed.loc["s1", "AAAATTTT"] == 10


def test_merge_sequence_tables_tryrc():
    st1 = d2.make_sequence_table({"s1": {"AAAACCCC": 5}})
    st2 = d2.make_sequence_table({"s2": {d2.rc("AAAACCCC"): 3}})
    m = d2.merge_sequence_tables(st1, st2, tryRC=True)
    assert m.shape[1] == 1
    assert m.loc["s2", "AAAACCCC"] == 3


def test_uniques_to_fasta(tmp_path):
    f = tmp_path / "u.fasta"
    d2.uniques_to_fasta({"ACGT": 7, "TTTT": 2}, str(f))
    text = f.read_text()
    assert ">sq1;size=7;\nACGT\n" in text


def test_errfun_variants():
    from dada2_tpu.errors import (inflate_err, make_binned_qual_errfun,
                                  noqual_errfun)
    from dada2_tpu.data import tperr1

    err = tperr1()
    infl = inflate_err(err, 2.0)
    off = [t for t in range(16) if t not in (0, 5, 10, 15)]
    assert np.all(infl[off] >= err[off])
    assert np.all(infl <= 1.0)

    trans = np.random.default_rng(0).integers(0, 100, (16, 41))
    trans[[0, 5, 10, 15]] += 10000
    nq = noqual_errfun(trans.astype(float))
    assert nq.shape == (16, 41)
    assert np.allclose(nq[:, 0], nq[:, -1])  # quality-independent

    # binned fit: counts only at the binned quality columns
    btrans = np.zeros((16, 41))
    for q in (2, 11, 25, 37):
        btrans[:, q] = trans[:, q]
    binned = make_binned_qual_errfun([2, 11, 25, 37])
    be = binned(btrans)
    assert be.shape[0] == 16
    assert np.all((be >= 0) & (be <= 1))
