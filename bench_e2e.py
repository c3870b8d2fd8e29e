#!/usr/bin/env python
"""End-to-end benchmark: multi-sample dada() wall-clock, TPU chip vs the
REFERENCE ENGINE itself.

The denominator is not a clean-room stand-in: the reference package's
actual clustering engine (src/cluster.cpp, containers.cpp, pval.cpp and
its aligners) is compiled -O3 -march=native from /root/reference via the
tests/refharness bridge and driven through its own C API exactly as
run_dada drives it — the real single-core C++ engine on this machine.
(Its TBB layer is not rebuilt here; the reference number is one core,
the unit its RcppParallel scaling multiplies. Engine outputs are
asserted raw-for-raw identical before any timing is reported, see
tests/test_reference_parity.py for the full parity suite.)

The workload is the bundled MiSeq data as a multi-sample batch (the
learnErrors/dada production shape): each sample is dereplicated and
denoised with the tperr1 error matrix. Our side runs the production
dada() path — threaded per-sample engines over one TPU chip.

Prints one JSON line:
  {"metric": "dada e2e samples", "ref_core_seconds": ..,
   "tpu_chip_seconds": .., "vs_baseline": ..}
and writes BENCH_E2E.json.
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

REF_SRC = "/root/reference/src"
HARNESS = os.path.join(REPO, "tests", "refharness")
REPLICAS = 4  # each bundled sample appears this many times in the batch


def info(*a):
    print(*a, file=sys.stderr, flush=True)


if os.environ.get("DADA2_TPU_STACKDUMP"):
    import faulthandler

    faulthandler.dump_traceback_later(
        int(os.environ["DADA2_TPU_STACKDUMP"]), repeat=True,
        file=sys.stderr)


def build_refengine(tmp="/tmp/dada2_refengine_bench.so"):
    srcs = [os.path.join(HARNESS, "engine_wrapper.cpp")] + [
        os.path.join(REF_SRC, f) for f in
        ("cluster.cpp", "containers.cpp", "pval.cpp",
         "nwalign_vectorized.cpp", "nwalign_endsfree.cpp", "kmers.cpp")]
    if (not os.path.exists(tmp) or
            any(os.path.getmtime(s) > os.path.getmtime(tmp) for s in srcs)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", "-I", HARNESS, "-I", REF_SRC, "-o", tmp] + srcs,
            check=True, capture_output=True)
    lib = ctypes.CDLL(tmp)
    lib.run_ref_dada.restype = ctypes.c_int
    # No ppois hook: the reference engine runs its own native R-exact
    # Poisson tail (refharness/rmath_ppois.h) — faster for it than the
    # old ctypes scipy callback, and the same math our engine uses.
    return lib, None


def ref_run(lib, d, err, opts, max_clust=0):
    """One reference-engine clustering run; returns (seconds, nclust,
    cluster_of) for cross-checking."""
    seqs, ab, quals = d.sequences, d.abundances, d.quals
    n = len(seqs)
    code = {"A": 1, "C": 2, "G": 3, "T": 4}
    enc = [bytes(code[c] for c in s) for s in seqs]
    arr = (ctypes.c_char_p * n)(*enc)
    qflat = np.ascontiguousarray(np.nan_to_num(quals, nan=0.0))
    reads = np.ascontiguousarray(ab, dtype=np.int32)
    priors = np.zeros(n, np.uint8)
    errflat = np.ascontiguousarray(err)
    outs = [np.full(n, -1, np.int32), np.zeros(n), np.zeros(n, np.int32),
            np.zeros(n), np.zeros(n), np.full(n, -1, np.int32)]
    btypes = ctypes.create_string_buffer(n)
    bpvals = np.zeros(n)

    def P(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    t0 = time.time()
    nclust = lib.run_ref_dada(
        n, arr, P(qflat), qflat.shape[1], P(reads), P(priors), P(errflat),
        err.shape[1], opts.MATCH, opts.MISMATCH, opts.GAP_PENALTY,
        opts.GAP_PENALTY, 1, ctypes.c_double(opts.KDIST_CUTOFF),
        opts.BAND_SIZE, ctypes.c_double(opts.OMEGA_A),
        ctypes.c_double(opts.OMEGA_P), 0, max_clust,
        ctypes.c_double(opts.MIN_FOLD), opts.MIN_HAMMING,
        opts.MIN_ABUNDANCE, 1, 1, opts.SSE, 1, 1,
        P(outs[0]), P(outs[1]), P(outs[2]), P(outs[3]), P(outs[4]),
        P(outs[5]), btypes, P(bpvals))
    dt = time.time() - t0
    assert nclust > 0, "reference engine failed"
    return dt, int(nclust), outs[0]


def simulate_sample(rng, asv_seqs, asv_ab, asv_quals, err, nreads,
                    name):
    """Simulate a production-scale sample: draw reads from the real ASVs
    with substitution errors at the empirical tperr1 per-(transition,
    quality) rates, then dereplicate in-memory. This is the tutorial-
    scale workload shape (1e5+ reads, tens of thousands of uniques) that
    the bundled 1500-read fastqs are a miniature of."""
    from dada2_tpu.derep import Derep
    from dada2_tpu.encode import pack_sequences

    codes, lens = pack_sequences(asv_seqs)
    counts = rng.multinomial(nreads, asv_ab / asv_ab.sum())
    rows = []
    quals_of = []
    for a, m in enumerate(counts):
        if m == 0:
            continue
        L = int(lens[a])
        c = codes[a, :L].astype(np.int64)
        q = np.nan_to_num(asv_quals[a][:L], nan=35.0)
        q8 = np.floor(q + 0.5).astype(np.int64)
        selfp = err[5 * c, q8]                       # P(no substitution)
        reads = np.broadcast_to(c, (m, L)).copy()
        sub = rng.random((m, L)) >= selfp[None, :]
        if sub.any():
            ri, pi = np.nonzero(sub)
            base = c[pi]
            # target nt proportional to err[4*base+t, q], t != base
            probs = np.stack([err[4 * base + t, q8[pi]] for t in range(4)],
                             axis=1)
            probs[np.arange(len(pi)), base] = 0.0
            probs /= probs.sum(axis=1, keepdims=True)
            u = rng.random(len(pi))
            tgt = (np.cumsum(probs, axis=1) < u[:, None]).sum(axis=1)
            reads[ri, pi] = np.minimum(tgt, 3)
        # pad to common width for uniquing
        W = codes.shape[1]
        padded = np.full((m, W), 255, np.uint8)
        padded[:, :L] = reads
        rows.append(padded)
        quals_of.append(np.broadcast_to(
            np.pad(q8.astype(np.float64), (0, W - L),
                   constant_values=np.nan), (m, W)))
    allreads = np.concatenate(rows, axis=0)
    allquals = np.concatenate(quals_of, axis=0)
    uniq, first, inv, cnt = np.unique(
        allreads, axis=0, return_index=True, return_inverse=True,
        return_counts=True)
    order = np.argsort(-cnt, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    nt = {0: "A", 1: "C", 2: "G", 3: "T"}
    uniques = {}
    for k in order:
        s = "".join(nt[c] for c in uniq[k] if c != 255)
        uniques[s] = int(cnt[k])
    d = Derep(uniques=uniques, quals=allquals[first][order],
              map=rank[inv], name=name)
    return d


def run_pair(lib, dereps, err, opts, dada, label, ref_subset=None):
    """Time the reference engine (1 core, serial) and our dada() on the
    same batch; returns (ref_seconds, tpu_seconds, results)."""
    ref_names = list(dereps)[: ref_subset] if ref_subset else list(dereps)
    ref_nclust = {}
    t_ref = 0.0
    for name in ref_names:
        dt, nc, _ = ref_run(lib, dereps[name], err, opts)
        t_ref += dt
        ref_nclust[name] = nc
    if ref_subset:
        t_ref *= len(dereps) / len(ref_names)
    info(f"[{label}] reference engine (1 core): {t_ref:.2f}s total"
         f"{' (extrapolated from %d samples)' % len(ref_names) if ref_subset else ''}")

    res = dada(dict(dereps), err=err, verbose=False,
               multithread=8)  # warm/compile
    from dada2_tpu.trace import COUNTERS, PHASES

    PHASES.reset()
    COUNTERS.reset()
    t0 = time.time()
    res = dada(dict(dereps), err=err, verbose=False, multithread=8)
    t_tpu = time.time() - t0
    info(f"[{label}] dada() on one chip (threaded samples): {t_tpu:.2f}s")
    info(f"[{label}] phases (thread-summed): {PHASES.summary()}")
    info(f"[{label}] counters: {COUNTERS.summary()}")
    for name in ref_names:
        info(f"  {name}: ref {ref_nclust[name]} clusters, "
             f"ours {len(res[name].denoised)} ASVs")
    return t_ref, t_tpu, res, {"phases": PHASES.as_dict(),
                               "phase_bytes": PHASES.bytes_dict(),
                               "counters": COUNTERS.as_dict()}


def main():
    from dada2_tpu import dada, derep_fastq
    from dada2_tpu.data import tperr1
    from dada2_tpu.options import DEFAULT_OPTIONS

    if not os.path.isdir(REF_SRC):
        info("reference sources not mounted; nothing to compare against")
        return

    # Probe the backend in a subprocess before touching jax — a dead
    # tunnel hangs jax.devices() forever (see utils/bench_guard.py).
    from dada2_tpu.utils.bench_guard import probe_backend

    probe_err = probe_backend(log=info)
    if probe_err is not None:
        info(f"backend unavailable after retries: {probe_err}")
        print(json.dumps({
            "metric": "dada e2e wall-clock, tutorial-scale batch",
            "value": 0.0,
            "unit": "seconds/chip",
            "vs_baseline": 0.0,
            "error": probe_err,
        }))
        return

    import jax

    info(f"devices: {jax.devices()}")
    lib, _hook = build_refengine()
    opts = DEFAULT_OPTIONS.normalized()
    err = tperr1()
    err = np.hstack([err] + [err[:, -1:]] * 10)  # cover q<=50

    # ---- workload 1: the bundled samples as-is (tiny; latency-bound) --
    files = ["sam1F.fastq.gz", "sam2F.fastq.gz", "sam1R.fastq.gz",
             "sam2R.fastq.gz"]
    small = {}
    for rep in range(REPLICAS):
        for f in files:
            d = derep_fastq(os.path.join(REPO, "tests/extdata", f))
            d.name = f"{f}:{rep}"
            small[d.name] = d
    info(f"small workload: {len(small)} samples "
         f"({sum(len(d.uniques) for d in small.values())} uniques)")
    t_ref_s, t_tpu_s, _, brk_s = run_pair(lib, small, err, opts, dada,
                                          "small")

    # ---- workload 2: tutorial scale (simulated from the real ASVs) ----
    base = dada(derep_fastq(os.path.join(REPO, "tests/extdata",
                                         "sam1F.fastq.gz")),
                err=err, verbose=False)
    asv_seqs = base.sequence
    asv_ab = np.array([base.denoised[s] for s in asv_seqs], np.float64)
    asv_quals = base.quality
    rng = np.random.default_rng(42)
    NS, NREADS = 6, 120_000
    tut = {}
    for k in range(NS):
        d = simulate_sample(rng, asv_seqs, asv_ab, asv_quals, err,
                            NREADS, f"sim{k}")
        tut[d.name] = d
    info(f"tutorial workload: {NS} samples x {NREADS} reads, "
         f"{sum(len(d.uniques) for d in tut.values())} uniques total")
    t_ref_t, t_tpu_t, _, brk_t = run_pair(lib, tut, err, opts, dada,
                                          "tutorial", ref_subset=2)

    # ---- workload 3: learnErrors (the selfConsist loop) ---------------
    # Our side runs the full learn_errors driver. The reference side
    # replays the SAME per-round error-matrix sequence through its own
    # compiled engine (max_clust=1 on the initialization round, exactly
    # R/dada.R:296-342's protocol); its loess/trans assembly time is NOT
    # charged, so the reported ratio is a LOWER bound on the speedup.
    from dada2_tpu import learn_errors

    learn_errors([tut[k] for k in list(tut)[:2]], nbases=1e12,
                 multithread=8, verbose=False)  # warm/compile
    from dada2_tpu.trace import COUNTERS, PHASES

    PHASES.reset()
    COUNTERS.reset()
    t0 = time.time()
    learned = learn_errors(list(tut.values()), nbases=1e12,
                           multithread=8, verbose=False)
    t_tpu_l = time.time() - t0
    brk_l = {"phases": PHASES.as_dict(),
             "phase_bytes": PHASES.bytes_dict(),
             "counters": COUNTERS.as_dict()}
    info(f"[learn] phases (thread-summed): {PHASES.summary()}")
    info(f"[learn] counters: {COUNTERS.summary()}")
    err_hist = learned["err_in"]
    if isinstance(err_hist, np.ndarray):
        err_hist = [err_hist]
    info(f"[learn] our learn_errors: {t_tpu_l:.2f}s "
         f"({len(err_hist)} selfConsist rounds)")
    ref_names = list(tut)[:2]
    t_ref_l = 0.0
    ones = np.ones_like(err)
    for rnd, err_r in enumerate([ones] + list(err_hist)):
        if err_r.shape[1] < err.shape[1]:
            err_r = np.hstack(
                [err_r] + [err_r[:, -1:]] * (err.shape[1]
                                             - err_r.shape[1]))
        for name in ref_names:
            dt, _, _ = ref_run(lib, tut[name], np.ascontiguousarray(err_r),
                               opts, max_clust=1 if rnd == 0 else 0)
            t_ref_l += dt
    t_ref_l *= len(tut) / len(ref_names)
    info(f"[learn] reference engine core (1 core, extrapolated): "
         f"{t_ref_l:.2f}s")

    import jax as _jax

    out = {
        "metric": "dada e2e wall-clock, tutorial-scale batch "
                  f"({NS}x{NREADS} reads)",
        "value": round(t_tpu_t, 3),
        "unit": "seconds/chip",
        "vs_baseline": round(t_ref_t / t_tpu_t, 3),
        "ref_core_seconds": round(t_ref_t, 3),
        "platform": _jax.default_backend(),
        "small_batch": {
            "tpu_seconds": round(t_tpu_s, 3),
            "ref_core_seconds": round(t_ref_s, 3),
            "vs_baseline": round(t_ref_s / t_tpu_s, 3),
            "breakdown": brk_s,
        },
        "tutorial_breakdown": brk_t,
        "learn_errors": {
            "tpu_seconds": round(t_tpu_l, 3),
            "ref_core_seconds": round(t_ref_l, 3),
            "vs_baseline": round(t_ref_l / t_tpu_l, 3),
            "rounds": len(err_hist),
            "breakdown": brk_l,
        },
    }
    with open(os.path.join(REPO, "BENCH_E2E.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
