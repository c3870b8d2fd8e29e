"""Counters, tracing, and selfConsist checkpoint/resume."""
import numpy as np
import pytest

import dada2_tpu as d2
from dada2_tpu.data import tperr1
from dada2_tpu.trace import COUNTERS


@pytest.fixture(scope="module")
def drp(extdata):
    return d2.derep_fastq(str(extdata / "sam1F.fastq.gz"))


def test_counters(drp):
    COUNTERS.reset()
    d2.dada(drp, err=tperr1(), verbose=False)
    assert COUNTERS.compares > 5
    assert COUNTERS.alignments > 1000
    assert COUNTERS.compare_seconds > 0
    assert "alignments" in COUNTERS.summary()


def test_checkpoint_resume(drp, tmp_path):
    ck = str(tmp_path / "selfconsist.npz")
    full = d2.dada(drp, err=None, selfConsist=True, verbose=False,
                   MAX_CONSIST=4)
    # interrupted run: stops after 2 rounds, wrote a checkpoint
    part = d2.dada(drp, err=None, selfConsist=True, verbose=False,
                   MAX_CONSIST=2, checkpoint=ck)
    import os
    assert os.path.exists(ck)
    # resumed run completes and matches the uninterrupted result
    res = d2.dada(drp, err=None, selfConsist=True, verbose=False,
                  MAX_CONSIST=4, checkpoint=ck)
    np.testing.assert_array_equal(res.err_out, full.err_out)


def test_profile_trace_smoke(tmp_path, drp):
    from dada2_tpu.trace import annotate, profile_trace
    with profile_trace(str(tmp_path / "trace")):
        with annotate("dada-sample"):
            d2.dada(drp, err=tperr1(), verbose=False)
    import os
    found = list(os.walk(str(tmp_path / "trace")))
    assert any(f for _, _, fs in found for f in fs)
