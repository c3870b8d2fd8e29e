#!/usr/bin/env python
"""Benchmark: multi-host weak-scaling efficiency of dada(selfConsist).

BASELINE.md's remaining distribution metric is >=80% scaling efficiency
at 2 hosts. Real second-host hardware does not exist on this rig, so
this measures the honest on-rig analog: WEAK scaling with fixed
per-process work and fixed per-process CPU (2 virtual devices +
2 worker threads each) — one standalone process running S samples vs
two gloo-coordinated jax processes each running S samples with the
production cross-host tally reduction every selfConsist round.

efficiency = t_solo / t_dist  (1.0 = the distributed coordination —
init, per-round two-limb allgathers, convergence lockstep — costs
nothing; >=0.8 is the BASELINE bar). Cross-host traffic per round is
one 16xQ tally, so on a real pod the DCN cost is microscopic; what
this measures is the runtime's coordination overhead.

Writes BENCH_MULTIHOST.json and prints the driver-style JSON line.
"""
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

NREADS = 30_000
S_PER_PROC = 2

_CHILD = r"""
import json, os, sys, time
import numpy as np

mode = sys.argv[1]            # "solo" | "dist"
pid = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]
nreads = int(sys.argv[5])
s_per = int(sys.argv[6])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)

mesh = None
if mode == "dist":
    from dada2_tpu.parallel.dist import init_distributed, pod_mesh
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
    mesh = pod_mesh()

import dada2_tpu as d2
from dada2_tpu.data import tperr1
import importlib
be2 = importlib.import_module("bench_e2e")

err0 = tperr1()
err0 = np.hstack([err0] + [err0[:, -1:]] * 10)
base = d2.dada(d2.derep_fastq(os.path.join(%(repo)r,
                              "tests/extdata/sam1F.fastq.gz")),
               err=err0, verbose=False)
asv = base.sequence
ab = np.array([base.denoised[s] for s in asv], np.float64)
rng = np.random.default_rng(100 + pid)
drps = [be2.simulate_sample(rng, asv, ab, base.quality, err0, nreads,
                            f"p{pid}s{k}") for k in range(s_per)]

kw = dict(err=None, selfConsist=True, MAX_CONSIST=2, multithread=2,
          verbose=False, mesh=mesh)
d2.dada(drps, **kw)          # warm: compile cache + code paths
t0 = time.time()
res = d2.dada(drps, **kw)
dt = time.time() - t0
err_out = list(res.values())[0].err_out
with open(os.path.join(outdir, f"t_{mode}_{pid}.json"), "w") as fh:
    json.dump({"seconds": dt, "err_sum": float(np.sum(err_out))}, fh)
print("OK", mode, pid, f"{dt:.2f}s")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def info(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import tempfile

    outdir = tempfile.mkdtemp(prefix="dada2_mh_bench_")
    script = os.path.join(outdir, "child.py")
    with open(script, "w") as fh:
        fh.write(_CHILD % {"repo": REPO})
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def run(args, cpus):
        # pin to disjoint cores: XLA's intra-op pool otherwise spans the
        # whole box and the two distributed processes would measure CPU
        # contention, not coordination
        return subprocess.Popen(["taskset", "-c", cpus, sys.executable,
                                 script] + args,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, env=env)

    # median of 3 interleaved draws: single runs on this 4-core host
    # swing by tens of percent (a lucky 1.04 was recorded in round 4);
    # interleaving solo/dist pairs keeps machine-state drift fair
    draws = []
    solos, dists = [], []
    for rep in range(3):
        # solo: one process, S samples, 2 devices + 2 threads, 2 cores
        p = run(["solo", "0", "0", outdir, str(NREADS),
                 str(S_PER_PROC)], "0,1")
        so, se = p.communicate(timeout=3000)
        if p.returncode != 0:
            info(se.decode()[-2000:])
            raise SystemExit(1)
        t_solo = json.load(open(os.path.join(outdir, "t_solo_0.json")))

        # distributed: two processes, S samples EACH (weak scaling)
        port = _free_port()
        procs = [run(["dist", str(pid), str(port), outdir, str(NREADS),
                      str(S_PER_PROC)], ("0,1", "2,3")[pid])
                 for pid in (0, 1)]
        outs = [q.communicate(timeout=3000) for q in procs]
        for q, (so, se) in zip(procs, outs):
            if q.returncode != 0:
                info(se.decode()[-2000:])
                raise SystemExit(1)
        t0 = json.load(open(os.path.join(outdir, "t_dist_0.json")))
        t1 = json.load(open(os.path.join(outdir, "t_dist_1.json")))
        # both hosts must have learned the identical error matrix
        assert t0["err_sum"] == t1["err_sum"], "cross-host err divergence"
        t_dist = max(t0["seconds"], t1["seconds"])
        info(f"draw {rep + 1}: solo {t_solo['seconds']:.2f}s, dist "
             f"{t0['seconds']:.2f}/{t1['seconds']:.2f}s -> "
             f"eff {t_solo['seconds'] / t_dist:.3f}")
        draws.append(t_solo["seconds"] / t_dist)
        solos.append(t_solo["seconds"])
        dists.append(t_dist)

    eff = float(np.median(draws))
    out = {
        "metric": "2-process weak-scaling efficiency, "
                  f"dada selfConsist ({S_PER_PROC}x{NREADS} reads/proc)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "vs_baseline": round(eff / 0.8, 3),  # 1.0 = the 80% bar
        "draws": [round(d, 3) for d in draws],
        "t_solo_seconds": [round(t, 2) for t in solos],
        "t_dist_seconds": [round(t, 2) for t in dists],
    }
    with open(os.path.join(REPO, "BENCH_MULTIHOST.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
