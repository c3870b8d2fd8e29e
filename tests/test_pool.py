"""Pooled and pseudo-pooled multi-sample inference (driver config #4)."""
import numpy as np
import pytest

import dada2_tpu as d2
from dada2_tpu.data import tperr1


@pytest.fixture(scope="module")
def drps(extdata):
    return [d2.derep_fastq(str(extdata / "sam1F.fastq.gz")),
            d2.derep_fastq(str(extdata / "sam2F.fastq.gz"))]


def test_pool_true(drps):
    err = tperr1()
    res = d2.dada(drps, err=err, pool=True, verbose=False)
    res = list(res.values())
    assert len(res) == 2
    # per-sample abundances sum to at most the sample's reads
    for r, drp in zip(res, drps):
        assert sum(r.denoised.values()) <= int(drp.abundances.sum())
        assert len(r.denoised) >= 1
    # pooled mode can resolve ASVs shared across samples: the union of
    # sequences comes from one pooled inference
    seqs0 = set(res[0].denoised)
    seqs1 = set(res[1].denoised)
    assert seqs0 & seqs1  # shared ASVs exist in this dataset


def test_pool_pseudo(drps):
    err = tperr1()
    res = d2.dada(drps, err=err, pool="pseudo", verbose=False)
    res = list(res.values())
    assert len(res) == 2
    assert all(len(r.denoised) >= 1 for r in res)


def test_priors(drps):
    err = tperr1()
    base = d2.dada(drps[0], err=err, verbose=False)
    # a sequence given as prior is detected with relaxed threshold
    some_seq = list(base.denoised)[0]
    res = d2.dada(drps[0], err=err, priors=[some_seq], verbose=False)
    assert some_seq in res.denoised


def test_derep_fasta_and_nweval(extdata):
    d = d2.derep_fasta(str(extdata / "example_seqs.fa"))
    assert len(d.uniques) >= 5
    m, mm, ind = d2.nweval("ACGTACGTAA", "ACGTACGTAA")
    assert (m, mm, ind) == (10, 0, 0)
    assert d2.nwextract("CGTA", "ACGTACG") in ("CGTA",)
