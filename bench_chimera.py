#!/usr/bin/env python
"""Benchmark: consensus table chimera check at production scale.

5000 ASVs x 20 samples (sparse, log-distributed abundances, realistic
parent structure: ASVs are mutated/recombined variants of 300 base
sequences). Compares is_bimera_denovo_table wall-clock against the
reference's C_table_bimera2 compiled UNMODIFIED from /root/reference
(serial — the refharness RcppParallel stub runs the worker on one
core; the reference's TBB parallelism is across sequence columns, so
ideal N-core time = serial/N and the JSON reports both).

Writes BENCH_CHIMERA.json; asserts exact (nflag, nsam) parity between
the two implementations on the full fixture before timing.
"""
import ctypes
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
HARNESS = os.path.join(REPO, "tests", "refharness")
REF_SRC = "/root/reference/src"


def info(*a):
    print(*a, file=sys.stderr, flush=True)


def build_refaux(tmp="/tmp/dada2_refaux_bench.so"):
    srcs = [os.path.join(HARNESS, "aux_wrapper.cpp"),
            os.path.join(REF_SRC, "chimera.cpp"),
            os.path.join(REF_SRC, "nwalign_vectorized.cpp"),
            os.path.join(REF_SRC, "nwalign_endsfree.cpp"),
            os.path.join(REF_SRC, "evaluate.cpp"),
            os.path.join(REF_SRC, "taxonomy.cpp"),
            os.path.join(REF_SRC, "misc.cpp"),
            os.path.join(REF_SRC, "kmers.cpp")]
    if (not os.path.exists(tmp) or
            any(os.path.getmtime(s) > os.path.getmtime(tmp)
                for s in srcs + [os.path.join(HARNESS, "Rcpp.h")])):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", "-I", HARNESS, "-I", REF_SRC, "-o", tmp] + srcs,
            check=True, capture_output=True)
    lib = ctypes.CDLL(tmp)
    lib.ref_table_bimera2.restype = ctypes.c_int
    lib.ref_table_bimera2.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    return lib


def make_fixture(ncol=5000, nsam=20, nbase=300, L=250, seed=7):
    """Sparse seqtab with chimera-plausible structure."""
    rng = np.random.default_rng(seed)
    nt = np.array(list("ACGT"))
    bases = ["".join(nt[rng.integers(0, 4, L)]) for _ in range(nbase)]
    seqs = set()
    out = []
    while len(out) < ncol:
        r = rng.random()
        if r < 0.55:  # point-mutation variant of a base
            s = list(bases[rng.integers(0, nbase)])
            for _ in range(int(rng.integers(1, 6))):
                s[int(rng.integers(0, L))] = nt[rng.integers(0, 4)]
            s = "".join(s)
        elif r < 0.75:  # recombinant of two bases (chimera-like)
            i, j = rng.integers(0, nbase, 2)
            cut = int(rng.integers(40, L - 40))
            s = bases[i][:cut] + bases[j][cut:]
        else:  # novel
            s = "".join(nt[rng.integers(0, 4, L)])
        if s not in seqs:
            seqs.add(s)
            out.append(s)
    # sparse occupancy, log-distributed counts
    mat = np.zeros((nsam, ncol), np.int64)
    occup = rng.integers(1, 8, ncol)            # samples per ASV
    for j in range(ncol):
        rows = rng.choice(nsam, size=occup[j], replace=False)
        mat[rows, j] = np.maximum(
            1, np.round(np.exp(rng.normal(3.0, 1.6, occup[j])))
        ).astype(np.int64)
    return mat, out


def main():
    from dada2_tpu.chimeras import _table_bimera_stats
    from dada2_tpu.options import current_options

    opts = current_options()
    ncol, nsam = 5000, 20
    mat, seqs = make_fixture(ncol=ncol, nsam=nsam)
    info(f"fixture: {ncol} ASVs x {nsam} samples, "
         f"{int((mat > 0).sum())} nonzero cells")

    lib = build_refaux()
    enc = [s.encode() for s in seqs]
    arr = (ctypes.c_char_p * ncol)(*enc)
    colmajor = np.asfortranarray(mat.astype(np.int32))
    nflag_ref = np.zeros(ncol, np.int32)
    nsam_ref = np.zeros(ncol, np.int32)

    t0 = time.time()
    rc = lib.ref_table_bimera2(
        colmajor.ctypes.data_as(ctypes.c_void_p), nsam, ncol, arr,
        1.5, 2, 0, 4, opts.MATCH, opts.MISMATCH, opts.GAP_PENALTY, 16,
        nflag_ref.ctypes.data_as(ctypes.c_void_p),
        nsam_ref.ctypes.data_as(ctypes.c_void_p))
    t_ref = time.time() - t0
    assert rc == 0
    info(f"reference C_table_bimera2 (1 core): {t_ref:.2f}s, "
         f"{int((nflag_ref >= nsam_ref).sum())} all-sample flags")

    # warm (compile) then time ours: the warm subset must be big enough
    # to produce the SAME full-size pair chunks (CH=1024 blocks) the
    # timed run uses, or the timed run pays the XLA compiles
    nwarm = 1280
    small = np.ascontiguousarray(mat[:, :nwarm])
    _table_bimera_stats(small, seqs[:nwarm], 1.5, 2, False, 4, 16, opts)
    t0 = time.time()
    nflag, nsam_out = _table_bimera_stats(
        mat, seqs, 1.5, 2, False, 4, 16, opts)
    t_us = time.time() - t0
    info(f"ours (device batch + vectorized scans): {t_us:.2f}s")

    if not (np.array_equal(nflag, nflag_ref)
            and np.array_equal(nsam_out, nsam_ref)):
        info("FATAL: (nflag, nsam) parity broke at scale — "
             "no perf number published")
        raise SystemExit(1)
    info("parity at scale: exact (nflag, nsam) match")

    import jax

    ncores = os.cpu_count() or 1
    out = {
        "metric": "table chimera check wall-clock "
                  f"({ncol} ASVs x {nsam} samples)",
        "value": round(t_us, 3),
        "unit": "seconds",
        "vs_baseline": round(t_ref / t_us, 3),
        "ref_serial_seconds": round(t_ref, 3),
        "vs_ideal_parallel": round(t_ref / ncores / t_us, 3),
        "assumed_cores": ncores,
        "platform": jax.devices()[0].platform,
    }
    with open(os.path.join(REPO, "BENCH_CHIMERA.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
