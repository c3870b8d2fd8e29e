"""Filter/trim pipeline on the bundled MiSeq pairs."""
import gzip
import os

import numpy as np
import pytest

from dada2_tpu.filter import (fastq_filter, fastq_paired_filter,
                              filter_and_trim, is_phix, match_ref,
                              matrix_ee, seq_complexity)
from dada2_tpu.io.fastq import read_fastq


def test_matrix_ee():
    q = [np.array([20, 30]), np.array([10])]
    ee = matrix_ee(q)
    np.testing.assert_allclose(ee, [0.01 + 0.001, 0.1])


def test_match_ref_words():
    ref = "ACGTACGGTTAA"
    # word in ref matches; circularization wraps the end
    assert match_ref(["ACGTAC"], ref, word_size=6)[0] == 1
    assert match_ref(["TTAAAC"], ref, word_size=6)[0] == 1  # wraparound
    assert match_ref(["GGGGGG"], ref, word_size=6)[0] == 0


def test_seq_complexity_bimodal():
    sq_norm = ("TACGGAAGGTCCGGGCGTTATCCGGATTTATTGGGTTTAAAGGGAGCGTAGGCC"
               "GGAGATTAAGCGTGTTGTGA")
    sq_lowc = ("TCCTTCTTCTCCTCTCTTTCTCCTTCTTTCTTTTTTTTCCCTTTCTCTTCTTCT"
               "TTTTCTTCCTTCCTTTTTTC")
    si = seq_complexity([sq_norm, sq_lowc])
    assert si[0] > 10 and si[1] < 6


def test_phix_negative(extdata):
    ch = read_fastq(str(extdata / "sam1F.fastq.gz"))
    seqs = [s.decode() for s in ch.seqs[:50]]
    assert not is_phix(seqs).any()
    # phiX genome fragments are positive
    import dada2_tpu
    phix = os.path.join(os.path.dirname(dada2_tpu.__file__), "data",
                        "phix_genome.fa")
    with open(phix) as f:
        sq = "".join(x.strip() for x in f if not x.startswith(">"))
    assert is_phix([sq[100:350]])[0]


def test_fastq_filter_single(extdata, tmp_path):
    fout = str(tmp_path / "filt.fastq.gz")
    nin, nout = fastq_filter(str(extdata / "sam1F.fastq.gz"), fout,
                             maxN=0, maxEE=2, truncLen=240)
    assert nin == 1500
    assert 0 < nout < nin
    ch = read_fastq(fout)
    assert len(ch) == nout
    lens = {len(s) for s in ch.seqs}
    assert lens == {240}
    # maxEE enforced on output
    from dada2_tpu.io.fastq import quals_to_matrix
    q = quals_to_matrix(ch.quals)
    ee = np.nansum(10.0 ** (-q / 10.0), axis=1)
    assert (ee <= 2).all()


def test_fastq_filter_trim_left(extdata, tmp_path):
    fout = str(tmp_path / "filt2.fastq.gz")
    nin, nout = fastq_filter(str(extdata / "sam1F.fastq.gz"), fout,
                             trimLeft=10, truncLen=200, maxEE=2)
    ch = read_fastq(fout)
    assert {len(s) for s in ch.seqs} == {190}


def test_filter_and_trim_paired(extdata, tmp_path):
    res = filter_and_trim(
        [str(extdata / "sam1F.fastq.gz"), str(extdata / "sam2F.fastq.gz")],
        [str(tmp_path / "f1.fastq.gz"), str(tmp_path / "f2.fastq.gz")],
        rev=[str(extdata / "sam1R.fastq.gz"),
             str(extdata / "sam2R.fastq.gz")],
        filt_rev=[str(tmp_path / "r1.fastq.gz"),
                  str(tmp_path / "r2.fastq.gz")],
        truncLen=(240, 200), maxEE=2)
    assert list(res["reads.in"]) == [1500, 1500]
    assert (res["reads.out"] > 500).all()
    f1 = read_fastq(str(tmp_path / "f1.fastq.gz"))
    r1 = read_fastq(str(tmp_path / "r1.fastq.gz"))
    assert len(f1) == len(r1) == res["reads.out"].iloc[0]
    # pairs stay in the same order
    assert [i.split()[0] for i in
            (x.decode() for x in f1.ids)] == \
           [i.split()[0] for i in (x.decode() for x in r1.ids)]
    assert {len(s) for s in f1.seqs} == {240}
    assert {len(s) for s in r1.seqs} == {200}


@pytest.mark.parametrize("multithread", [False, 2])
def test_filter_and_trim_collects_per_file_errors(extdata, tmp_path,
                                                  multithread):
    """One corrupt fastq must not abandon the batch: the good files
    are still filtered and the error surfaces at the end, naming the
    bad file (reference: R/filter.R:479-489)."""
    bad = tmp_path / "corrupt.fastq.gz"
    bad.write_bytes(b"this is not a gzip fastq")
    good_out = tmp_path / "good.fastq.gz"
    with pytest.raises(RuntimeError) as exc:
        filter_and_trim(
            [str(extdata / "sam1F.fastq.gz"), str(bad)],
            [str(good_out), str(tmp_path / "bad_out.fastq.gz")],
            truncLen=240, maxEE=2, multithread=multithread)
    assert "corrupt.fastq.gz" in str(exc.value)
    assert "1 of 2" in str(exc.value)
    # the good file was fully processed despite the failure
    ch = read_fastq(str(good_out))
    assert len(ch) > 500


def test_paired_match_ids(extdata, tmp_path):
    nin, nout = fastq_paired_filter(
        [str(extdata / "sam1F.fastq.gz"), str(extdata / "sam1R.fastq.gz")],
        [str(tmp_path / "mf.fastq.gz"), str(tmp_path / "mr.fastq.gz")],
        truncLen=(240, 200), maxEE=(2, 2), matchIDs=True)
    assert nin == 1500 and nout > 500


def test_remove_primers_pacbio(extdata, tmp_path):
    from dada2_tpu.filter import remove_primers
    from dada2_tpu.encode import rc as _rc

    F27 = "AGRGTTYGATYMTGGCTCAG"
    R1492 = "RGYTACCTTGTTACGACTT"
    fout = str(tmp_path / "noprime.fastq.gz")
    res = remove_primers(str(extdata / "samPBprimers.fastq.gz"), fout,
                         primer_fwd=F27, primer_rev=_rc(R1492), orient=True)
    nin, nout = res.iloc[0]
    assert nin > 0
    assert nout > 0.8 * nin  # most CCS reads contain both primers
    ch = read_fastq(fout)
    # primers trimmed: reads no longer start with the forward primer motif
    seqs = [s.decode() for s in ch.seqs[:20]]
    assert not any(s.startswith("AGAGTTTGAT") or s.startswith("AGGGTTTGAT")
                   for s in seqs)
    assert all(1000 < len(s) < 1600 for s in seqs)  # full-length 16S


def test_matrix_ee_out_of_range_quals():
    """Negative / non-integer scores must use the exact formula, not the
    wrapped table (e.g. phred64 data mis-read as phred33)."""
    from dada2_tpu.filter import matrix_ee

    quals = [np.array([-31.0, 2.5, 40.0]), np.array([0.0])]
    out = matrix_ee(quals)
    exp0 = 10.0 ** (31 / 10.0) + 10.0 ** (-2.5 / 10.0) + 10.0 ** (-4.0)
    assert out[0] == exp0
    assert out[1] == 1.0


def test_match_ref_non_acgt_words():
    """Words containing N match literally, as the reference's raw-string
    hashing does (src/filter.cpp:7-32)."""
    from dada2_tpu.filter import match_ref

    ref = "ACGTACGTNNACGTACGTAAACCCGGGTTT"
    s_hit = ref[4:24]          # contains the NN window
    s_miss = s_hit.replace("NN", "NT")
    out = match_ref([s_hit, s_miss, "N" * 20], ref, word_size=16,
                    non_overlapping=True)
    assert out[0] >= 1
    assert out[2] == 0


def test_primer_dp_matches_percell_recurrence():
    """The row-vectorized semi-global DP (running-minimum trick) must
    equal the textbook per-cell recurrence."""
    from dada2_tpu.filter import _match_matrix, _primer_dp

    rng = np.random.default_rng(31)
    mm = _match_matrix(False)
    nts = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(20):
        plen = int(rng.integers(4, 25))
        slen = int(rng.integers(plen, 120))
        pv = nts[rng.integers(0, 4, plen)]
        sv = nts[rng.integers(0, 4, slen)]
        got = _primer_dp(pv, sv, mm)
        D = np.zeros((plen + 1, slen + 1), np.int64)
        D[:, 0] = np.arange(plen + 1)
        for i in range(1, plen + 1):
            for j in range(1, slen + 1):
                sub = D[i - 1, j - 1] + (0 if mm[pv[i - 1], sv[j - 1]]
                                         else 1)
                D[i, j] = min(sub, D[i - 1, j] + 1, D[i, j - 1] + 1)
        np.testing.assert_array_equal(got, D)
