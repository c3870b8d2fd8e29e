"""Multi-host (2-process) distribution: bit-identical error matrices.

Launches two REAL jax processes (gloo-coordinated CPU backend, 4
virtual devices each = an 8-device hosts x chips pod), runs the
production dada(selfConsist, mesh=pod_mesh()) with samples round-robin
across hosts and the 16 x Q tally reduced globally each round, and
asserts the learned error matrices and per-sample ASV tables are
bit-identical to the meshless single-process run.

The reference has no multi-node layer at all (SURVEY.md §2.3/§5.8);
this is the BASELINE.md 2-host scaling path's correctness gate.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

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

drps = []
for f in ("sam1F.fastq.gz", "sam2F.fastq.gz"):
    d = d2.derep_fastq(os.path.join(%(repo)r, "tests/extdata", f))
    top = dict(list(d.uniques.items())[:120])
    d.uniques = top
    d.quals = d.quals[:120]
    d.map = d.map[d.map < 120]
    drps.append(d)

mesh = pod_mesh()
assert mesh.shape["samples"] == 2
res = d2.dada(drps, err=None, selfConsist=True, MAX_CONSIST=2,
              multithread=False, verbose=False, mesh=mesh)
out = {}
for name, r in res.items():
    out[name] = {"denoised": {k: int(v) for k, v in r.denoised.items()}}
    np.save(os.path.join(outdir, f"err_{pid}.npy"), r.err_out)
    np.save(os.path.join(outdir, f"trans_{name}.npy"), r.trans)
with open(os.path.join(outdir, f"res_{pid}.json"), "w") as fh:
    json.dump(out, fh)
print("OK", pid, sorted(res.keys()))
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

    # identical err matrices on both hosts (the global psum + identical
    # loess makes the selfConsist loop deterministic across the pod)
    err0 = np.load(tmp_path / "err_0.npy")
    err1 = np.load(tmp_path / "err_1.npy")
    np.testing.assert_array_equal(err0, err1)

    # each host returned exactly its round-robin share
    res0 = json.loads((tmp_path / "res_0.json").read_text())
    res1 = json.loads((tmp_path / "res_1.json").read_text())
    assert len(res0) == 1 and len(res1) == 1
    assert set(res0) != set(res1)

    # bit-identical to the meshless single-process run
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dada2_tpu as d2

    drps = []
    for f in ("sam1F.fastq.gz", "sam2F.fastq.gz"):
        d = d2.derep_fastq(os.path.join(REPO, "tests/extdata", f))
        top = dict(list(d.uniques.items())[:120])
        d.uniques = top
        d.quals = d.quals[:120]
        d.map = d.map[d.map < 120]
        drps.append(d)
    base = d2.dada(drps, err=None, selfConsist=True, MAX_CONSIST=2,
                   multithread=False, verbose=False)
    base = {name: r for name, r in base.items()}
    np.testing.assert_array_equal(
        err0, list(base.values())[0].err_out)
    merged = {**res0, **res1}
    assert set(merged) == set(base)
    for name, r in base.items():
        got = merged[name]["denoised"]
        want = {k: int(v) for k, v in r.denoised.items()}
        assert got == want, name
        np.testing.assert_array_equal(
            np.load(tmp_path / f"trans_{name}.npy"), r.trans)
