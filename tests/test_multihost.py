"""Multi-host (2-process) distribution: bit-identical results.

Launches two REAL jax processes (gloo-coordinated CPU backend, 4
virtual devices each = an 8-device hosts x chips pod). Contract: each
process passes ITS OWN samples (derep IO is never duplicated).

Covered modes, all asserted bit-identical to the meshless
single-process run over the union of samples:
- dada(selfConsist): per-round 16 x Q tally reduced globally, so the
  learned error matrices agree across hosts and with single-process.
- dada(pool=TRUE): distributed unique dedup — only dereplicated
  summaries travel (SURVEY.md §7 hard-part 7); every host builds the
  identical pooled derep, runs the deterministic pooled engine, and
  splits back its local samples.
- dada(pool='pseudo'): prior selection from allgathered per-sample ASV
  summaries between the two passes.

The reference has no multi-node layer at all (SURVEY.md §2.3/§5.8);
this is the BASELINE.md 2-host scaling path's correctness gate.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from dada2_tpu.parallel.dist import init_distributed, pod_mesh

init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import dada2_tpu as d2
from dada2_tpu.data import tperr1

def load(f):
    d = d2.derep_fastq(os.path.join(%(repo)r, "tests/extdata", f))
    top = dict(list(d.uniques.items())[:120])
    d.uniques = top
    d.quals = d.quals[:120]
    d.map = d.map[d.map < 120]
    return d

# each process loads ONLY its own sample
own_file = ("sam1F.fastq.gz", "sam2F.fastq.gz")[pid]
drp = load(own_file)
mesh = pod_mesh()
assert mesh.shape["samples"] == 2

out = {}

# --- selfConsist: global tally reduction ---
res = d2.dada([drp], err=None, selfConsist=True, MAX_CONSIST=2,
              multithread=False, verbose=False, mesh=mesh)
assert set(res) == {own_file}
np.save(os.path.join(outdir, f"err_{pid}.npy"),
        list(res.values())[0].err_out)
out["selfconsist"] = {n: {k: int(v) for k, v in r.denoised.items()}
                      for n, r in res.items()}

# --- pool=TRUE: distributed dedup + redundant pooled engine ---
err = tperr1()
resp = d2.dada([drp], err=err, pool=True, verbose=False,
               multithread=False, mesh=mesh)
assert set(resp) == {own_file}
out["pool"] = {n: {"denoised": {k: int(v) for k, v in
                                r.denoised.items()},
                   "map": [int(m) for m in r.map]}
               for n, r in resp.items()}

# --- pool='pseudo': allgathered prior selection ---
resq = d2.dada([drp], err=err, pool="pseudo", verbose=False,
               multithread=False, mesh=mesh)
out["pseudo"] = {n: {k: int(v) for k, v in r.denoised.items()}
                 for n, r in resq.items()}

with open(os.path.join(outdir, f"res_{pid}.json"), "w") as fh:
    json.dump(out, fh)
print("OK", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dada_invariance(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD % {"repo": REPO})
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]

    res0 = json.loads((tmp_path / "res_0.json").read_text())
    res1 = json.loads((tmp_path / "res_1.json").read_text())

    # --- single-process truth over the union of samples ---
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dada2_tpu as d2
    from dada2_tpu.data import tperr1

    drps = []
    for f in ("sam1F.fastq.gz", "sam2F.fastq.gz"):
        d = d2.derep_fastq(os.path.join(REPO, "tests/extdata", f))
        top = dict(list(d.uniques.items())[:120])
        d.uniques = top
        d.quals = d.quals[:120]
        d.map = d.map[d.map < 120]
        drps.append(d)

    # selfConsist: identical err across hosts AND vs single-process
    err0 = np.load(tmp_path / "err_0.npy")
    err1 = np.load(tmp_path / "err_1.npy")
    np.testing.assert_array_equal(err0, err1)
    base = d2.dada(drps, err=None, selfConsist=True, MAX_CONSIST=2,
                   multithread=False, verbose=False)
    np.testing.assert_array_equal(err0, list(base.values())[0].err_out)
    for name, r in base.items():
        got = {**res0["selfconsist"], **res1["selfconsist"]}[name]
        assert got == {k: int(v) for k, v in r.denoised.items()}, name

    # pool=TRUE: distributed dedup == single-host pooled split-back
    err = tperr1()
    basep = d2.dada(drps, err=err, pool=True, verbose=False,
                    multithread=False)
    for name, r in basep.items():
        got = {**res0["pool"], **res1["pool"]}[name]
        assert got["denoised"] == {k: int(v) for k, v in
                                   r.denoised.items()}, name
        np.testing.assert_array_equal(np.array(got["map"]), r.map)

    # pseudo: allgathered priors == single-host pseudo
    baseq = d2.dada(drps, err=err, pool="pseudo", verbose=False,
                    multithread=False)
    for name, r in baseq.items():
        got = {**res0["pseudo"], **res1["pseudo"]}[name]
        assert got == {k: int(v) for k, v in r.denoised.items()}, name
