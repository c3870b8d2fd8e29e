"""End-to-end paired pipeline on the bundled MiSeq data (the reference
vignette workflow): filter -> derep -> learnErrors -> dada F/R ->
mergePairs -> sequence table -> chimera removal -> taxonomy."""
import numpy as np
import pytest

import dada2_tpu as d2
from dada2_tpu.data import tperr1


@pytest.fixture(scope="module")
def filtered(extdata, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("filt")
    filtF = [str(tmp / "f1.fastq.gz"), str(tmp / "f2.fastq.gz")]
    filtR = [str(tmp / "r1.fastq.gz"), str(tmp / "r2.fastq.gz")]
    res = d2.filter_and_trim(
        [str(extdata / "sam1F.fastq.gz"), str(extdata / "sam2F.fastq.gz")],
        filtF,
        rev=[str(extdata / "sam1R.fastq.gz"),
             str(extdata / "sam2R.fastq.gz")],
        filt_rev=filtR, truncLen=(240, 160), maxEE=2, truncQ=2, maxN=0)
    assert (res["reads.out"] > 800).all()
    return filtF, filtR


def test_paired_pipeline(filtered):
    filtF, filtR = filtered
    drpF = [d2.derep_fastq(f) for f in filtF]
    drpR = [d2.derep_fastq(f) for f in filtR]

    errF = d2.learn_errors(drpF, verbose=False)
    errR = d2.learn_errors(drpR, verbose=False)
    assert errF["err_out"].shape[0] == 16
    assert np.all(errF["err_out"] <= 1) and np.all(errF["err_out"] >= 0)

    ddF = d2.dada(drpF, err=errF["err_out"], verbose=False)
    ddR = d2.dada(drpR, err=errR["err_out"], verbose=False)
    ddF = list(ddF.values())
    ddR = list(ddR.values())
    assert all(len(d.denoised) >= 1 for d in ddF)

    mergers = [d2.merge_pairs(f, df, r, dr, verbose=False)
               for f, df, r, dr in zip(ddF, drpF, ddR, drpR)]
    assert all(m["accept"].any() for m in mergers)

    st = d2.make_sequence_table({f"s{i+1}": m for i, m in
                                 enumerate(mergers)})
    assert st.shape[0] == 2
    assert st.values.sum() > 500
    # merged amplicon lengths ~ 252-254 for this 16S region
    lens = np.array([len(c) for c in st.columns])
    assert ((lens > 230) & (lens < 260)).all()

    st_nochim = d2.remove_bimera_denovo(st, method="consensus")
    assert st_nochim.shape[1] <= st.shape[1]
    assert st_nochim.values.sum() > 0.7 * st.values.sum()

    tax = d2.assign_taxonomy(list(st_nochim.columns)[:5],
                             "/root/repo/tests/extdata/"
                             "example_train_set.fa.gz")
    assert set(tax["Kingdom"].dropna()) <= {"Bacteria"}


def test_single_sample_dada_known_asvs(extdata):
    """dada on raw sam1F with tperr1 yields a stable small ASV set."""
    drp = d2.derep_fastq(str(extdata / "sam1F.fastq.gz"))
    res = d2.dada(drp, err=tperr1(), verbose=False)
    assert 5 <= len(res.denoised) <= 20
    assert max(res.denoised.values()) > 300
    assert sum(res.denoised.values()) <= 1500


def test_plots(extdata, tmp_path):
    fig = d2.plot_quality_profile(str(extdata / "sam1F.fastq.gz"))
    fig.savefig(str(tmp_path / "qp.png"))
    fig2 = d2.plot_complexity(str(extdata / "sam1F.fastq.gz"))
    fig2.savefig(str(tmp_path / "cx.png"))
    drp = d2.derep_fastq(str(extdata / "sam1F.fastq.gz"))
    res = d2.dada(drp, err=tperr1(), verbose=False)
    fig3 = d2.plot_errors(res, nominalQ=True)
    fig3.savefig(str(tmp_path / "err.png"))
    assert (tmp_path / "qp.png").stat().st_size > 1000
    assert (tmp_path / "err.png").stat().st_size > 1000


def test_pacbio_mode(extdata, tmp_path):
    """PacBio long-amplicon flow: removePrimers -> filter -> derep ->
    dada with PacBioErrfun and BAND_SIZE=32 (driver config #5)."""
    from dada2_tpu.errors import pacbio_errfun
    from dada2_tpu.filter import remove_primers

    F27 = "AGRGTTYGATYMTGGCTCAG"
    R1492 = "RGYTACCTTGTTACGACTT"
    noprime = str(tmp_path / "pb_noprime.fastq.gz")
    remove_primers(str(extdata / "samPBprimers.fastq.gz"), noprime,
                   primer_fwd=F27, primer_rev=d2.rc(R1492), orient=True)
    filt = str(tmp_path / "pb_filt.fastq.gz")
    nin, nout = d2.fastq_filter(noprime, filt, minQ=3, minLen=1000,
                                maxLen=1600, maxN=0, rm_phix=False,
                                maxEE=2, truncQ=0)
    assert nout > 0
    drp = d2.derep_fastq(filt)
    res = d2.dada(drp, err=None, errorEstimationFunction=pacbio_errfun,
                  selfConsist=True, BAND_SIZE=32, verbose=False,
                  MAX_CONSIST=3)
    assert len(res.denoised) >= 1
    assert all(len(s) > 1000 for s in res.denoised)


def test_learn_errors_nbases_budget(extdata):
    """The base budget cuts off sample streaming exactly like the
    reference (R/errorModels.R:344-355): a tiny budget uses only the
    first file, a huge one uses all."""
    import dada2_tpu as d2

    f1 = str(extdata / "sam1F.fastq.gz")
    f2 = str(extdata / "sam2F.fastq.gz")
    small = d2.learn_errors([f1, f2], nbases=1, MAX_CONSIST=1,
                            verbose=False)
    only1 = d2.learn_errors([f1], nbases=1, MAX_CONSIST=1, verbose=False)
    np.testing.assert_array_equal(small["trans"], only1["trans"])
    both = d2.learn_errors([f1, f2], nbases=1e12, MAX_CONSIST=1,
                           verbose=False)
    assert int(both["trans"].sum()) > int(small["trans"].sum())
