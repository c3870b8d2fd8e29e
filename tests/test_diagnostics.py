"""Diagnostics, exporters and session options."""
import numpy as np
import pandas as pd

import dada2_tpu as d2


def test_kmer_diagnostics():
    s1 = ["ACGTACGTACGTACGT"]
    s2 = ["ACGTACGTACGTACGT"]
    assert d2.kmer_dist(s1, s2)[0] == 0.0
    assert d2.kord_dist(s1, s2)[0] == 0.0
    s3 = ["TTTTTTTTTTTTTTTT"]
    assert d2.kmer_dist(s1, s3)[0] > 0.9
    assert d2.kmer_matches(s1, s2)[0] == 12
    assert d2.kdist_matches(s1, s2)[0] == 12
    # scalar kord on unequal lengths returns -1
    assert d2.kord_dist(["ACGTACGTA"], ["ACGTACGTAC"], SSE=0)[0] == -1


def test_set_dada_opt():
    assert d2.get_dada_opt("OMEGA_A") == 1e-40
    d2.set_dada_opt(OMEGA_A=1e-30)
    try:
        assert d2.get_dada_opt("OMEGA_A") == 1e-30
    finally:
        d2.set_dada_opt(OMEGA_A=1e-40)
    import pytest
    with pytest.raises(ValueError):
        d2.set_dada_opt(NOT_AN_OPTION=1)


def test_exporters(tmp_path):
    st = pd.DataFrame([[5, 3], [2, 0]], index=["s1", "s2"],
                      columns=["ACGT", "TTTT"])
    d2.seqtab_to_qiime(st, str(tmp_path / "q.txt"))
    d2.seqtab_to_mothur(st, str(tmp_path / "m.shared"))
    d2.samdf_to_qiime2(pd.DataFrame({"x": [1]}, index=["s1"]),
                       str(tmp_path / "sam.tsv"))
    assert (tmp_path / "q.txt").stat().st_size > 0
    assert "numOtus" in (tmp_path / "m.shared").read_text()
    assert (tmp_path / "sam.tsv").read_text().startswith("#SampleID")


def test_pfasta():
    out = d2.pfasta(["ACGT", "TTTT"])
    assert out == ">1\nACGT\n>2\nTTTT"
