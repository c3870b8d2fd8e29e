"""Multi-chip distribution: device meshes, sharded compare, collective
transition tallies.

The reference is single-node (threads + fork only; SURVEY.md §2.3). The
TPU-native design distributes along two axes:

* ``samples`` — data parallel over samples/fastq shards (replaces
  parallel::mclapply over files, reference: R/filter.R:461-477). Each
  sample's error-learning transition tally is computed locally and merged
  with a psum each selfConsist round (replaces accumulateTrans,
  reference: R/errorModels.R:462-471).
* ``pairs`` — data parallel over unique sequences within a compare sweep
  (replaces RcppParallel parallelFor over raws, reference:
  src/cluster.cpp:90-204). Each device aligns its shard of uniques against
  the (replicated) cluster center; lambda/hamming shards are
  all-gathered.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import nw_batch as nwb


def cpu_devices(n: int):
    """n CPU devices (virtual, via --xla_force_host_platform_device_count)."""
    devs = jax.devices("cpu")
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} cpu devices, have {len(devs)}; set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}")
    return devs[:n]


def make_mesh(n_devices: Optional[int] = None, samples: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(samples, pairs) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if len(devices) % samples:
        raise ValueError("samples axis must divide device count")
    return Mesh(devices.reshape(samples, len(devices) // samples),
                ("samples", "pairs"))


def trans_tally(tvec, quals, lens, reads, ncol: int):
    """16 x ncol transition-count tally of a batch of aligned uniques.

    Device equivalent of the per-sample tally that feeds the error model
    (reference: src/error.cpp:131-172), computed as a flat bincount so XLA
    lowers it to one segment-sum.
    """
    n, L = tvec.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < lens[:, None]
    t = jnp.where(valid, tvec, 0).astype(jnp.int32)
    q = jnp.where(valid, quals, 0).astype(jnp.int32)
    flat = t * ncol + jnp.clip(q, 0, ncol - 1)
    w = jnp.where(valid, reads[:, None], 0).astype(jnp.int32)
    counts = jnp.zeros(16 * ncol, jnp.int32).at[flat.reshape(-1)].add(
        w.reshape(-1))
    return counts.reshape(16, ncol)


def build_compare_and_tally(mesh: Mesh, nd: int, W: int, ncol: int, *,
                            match: int, mismatch: int, gap_p: int,
                            band: int):
    """One jitted multi-chip "training step": sharded compare + psum tally.

    Per (samples, pairs) shard: align the local unique shard against the
    sample's center with the wavefront kernel, derive transition vectors,
    tally 16 x Q transition counts weighted by abundance, and psum over
    both mesh axes — the collective that replaces accumulateTrans
    (reference: R/errorModels.R:462-471) each selfConsist round. Also
    returns per-unique log-lambda under the current error matrix
    (all-gathered over pairs), the quantity the partition engine consumes.
    """

    def local_step(center_seq, center_len, seqs, lens, quals, reads, logerr):
        _, _, _, ham, tvec, _ = nwb._nw_batch_jit(
            jnp.broadcast_to(center_seq[None, :],
                             (seqs.shape[0], center_seq.shape[0])),
            jnp.broadcast_to(center_len[None], (seqs.shape[0],)),
            seqs, lens, nd=nd, W=W, match=match, mismatch=mismatch,
            gap_p=gap_p, end_gap_p=0, band=band)
        counts = trans_tally(tvec, quals, lens, reads, ncol)
        pos = jnp.arange(tvec.shape[1], dtype=jnp.int32)[None, :]
        valid = pos < lens[:, None]
        t = jnp.where(valid, tvec, 0).astype(jnp.int32)
        q = jnp.clip(jnp.where(valid, quals, 0).astype(jnp.int32), 0,
                     ncol - 1)
        loglam = jnp.sum(jnp.where(valid, logerr[t, q], 0.0), axis=1)
        return ham, loglam, counts

    def step(center_seq, center_len, seqs, lens, quals, reads, logerr):
        # local shards keep a samples dim (size >= 1 — the mesh samples
        # axis need not fully shard the global samples dim); vmap over it
        ham, loglam, counts = jax.vmap(
            lambda cs, cl, sq, ln, qu, rd: local_step(cs, cl, sq, ln,
                                                      qu, rd, logerr)
        )(center_seq, center_len, seqs, lens, quals, reads)
        counts = jax.lax.psum(counts.sum(axis=0), ("samples", "pairs"))
        return ham, loglam, counts

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("samples", None), P("samples"),
                  P("samples", "pairs", None), P("samples", "pairs"),
                  P("samples", "pairs", None), P("samples", "pairs"),
                  P()),
        out_specs=(P("samples", "pairs"), P("samples", "pairs"), P()),
        check_vma=False)
    return jax.jit(sharded)


def dryrun_multichip(n_devices: int) -> None:
    """Compile + execute one full sharded step on tiny shapes.

    Exercised by the driver with N virtual CPU devices to validate the
    multi-chip sharding without a pod.
    """
    devs = cpu_devices(n_devices)
    samples_axis = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(devices=devs, samples=samples_axis)
    S = samples_axis
    npairs = 2 * (n_devices // samples_axis)  # 2 uniques per pair-shard
    L = 32
    ncol = 41
    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 4, (S, npairs, L)).astype(np.int8)
    lens = np.full((S, npairs), L, np.int32)
    quals = rng.integers(20, 40, (S, npairs, L)).astype(np.int32)
    reads = rng.integers(1, 50, (S, npairs)).astype(np.int32)
    center_seq = seqs[:, 0, :]
    center_len = lens[:, 0]
    logerr = np.log(np.full((16, ncol), 1e-3))
    logerr[[0, 5, 10, 15], :] = 0.0

    nd, W = nwb.batch_geometry(np.full(npairs, L), np.full(npairs, L), 16)
    stepf = build_compare_and_tally(mesh, nd, W, ncol, match=5, mismatch=-4,
                                    gap_p=-8, band=16)

    sh = lambda *spec: NamedSharding(mesh, P(*spec))
    args = (
        jax.device_put(center_seq, sh("samples", None)),
        jax.device_put(center_len, sh("samples")),
        jax.device_put(seqs, sh("samples", "pairs", None)),
        jax.device_put(lens, sh("samples", "pairs")),
        jax.device_put(quals, sh("samples", "pairs", None)),
        jax.device_put(reads, sh("samples", "pairs")),
        jax.device_put(logerr, sh()),
    )
    ham, loglam, counts = stepf(*args)
    ham = np.asarray(ham)
    counts = np.asarray(counts)
    assert ham.shape == (S, npairs)
    assert counts.shape == (16, ncol)
    # centers align to themselves with zero substitutions, and every
    # consumed base lands in the tally exactly once
    assert (ham[:, 0] == 0).all()
    total = int((reads * lens).sum())
    assert int(counts.sum()) == total, (int(counts.sum()), total)


def accumulate_trans_mesh(mesh: Mesh, tallies):
    """Sum per-sample 16 x Q transition tallies with a psum over the
    mesh's ``samples`` axis — the production replacement for the host
    accumulateTrans reduction (reference: R/errorModels.R:462-471) when
    samples are sharded across devices.

    tallies: list of [16, Qi] integer arrays (ragged Q allowed, as in the
    reference). Returns the summed [16, Qmax] int64 host array,
    bit-identical to errors.accumulate_trans.
    """
    ncol = max(t.shape[1] for t in tallies)
    S = len(tallies)
    nshard = mesh.shape.get("samples", 1)
    Sp = ((S + nshard - 1) // nshard) * nshard
    stack = np.zeros((Sp, 16, ncol), np.int64)
    for k, t in enumerate(tallies):
        stack[k, :, : t.shape[1]] = t

    # Without jax x64, int64 operands silently truncate to int32 on
    # device, so the counts travel as two base-2^20 int32 limbs — exact
    # for per-sample counts < 2^51 and shard counts < 2^11.
    lo = (stack & ((1 << 20) - 1)).astype(np.int32)
    hi = (stack >> 20).astype(np.int32)
    if (stack.sum(axis=0) >> 50).any() or Sp >= (1 << 11):
        raise OverflowError("transition tallies exceed the two-limb "
                            "collective's exact range")

    def _sum(lo_l, hi_l):
        return (jax.lax.psum(jnp.sum(lo_l, axis=0), "samples"),
                jax.lax.psum(jnp.sum(hi_l, axis=0), "samples"))

    lo_s, hi_s = jax.jit(jax.shard_map(
        _sum, mesh=mesh, in_specs=(P("samples"), P("samples")),
        out_specs=(P(), P()), check_vma=False))(lo, hi)
    return (np.asarray(lo_s).astype(np.int64)
            + (np.asarray(hi_s).astype(np.int64) << 20))


def sample_devices(mesh: Optional[Mesh]):
    """Round-robin device assignment for per-sample engines (the
    samples-axis data parallelism: each sample's backend computes on its
    own device). On a multi-host mesh only THIS process's addressable
    devices are returned — each host drives its own samples."""
    if mesh is None:
        return None
    devs = list(mesh.devices.reshape(-1))
    me = jax.process_index()
    local = [d for d in devs if d.process_index == me]
    return local or None


# ---------------------------------------------------------------------------
# multi-host (hosts x chips) distribution
# ---------------------------------------------------------------------------

def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None, **kw) -> None:
    """Initialize jax's multi-process runtime (idempotent).

    On TPU pods with a supported launcher every argument is
    auto-detected; on manual launches pass
    coordinator_address="host:port", num_processes, process_id. Must be
    called before first jax use on every process. The reference has no
    multi-node story at all (SURVEY.md §2.3/§5.8); this is the
    hosts-axis the TPU build adds."""
    # idempotence check must NOT touch the backend (jax.process_count()
    # would initialize XLA and make initialize() fail)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs = dict(kw)
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def mesh_processes(mesh: Mesh):
    """Sorted process indices participating in a mesh."""
    return sorted({d.process_index for d in mesh.devices.reshape(-1)})


def pod_mesh(samples: Optional[int] = None) -> Mesh:
    """Global (samples, pairs) mesh over every device in the pod,
    host-major: the samples axis spans processes (slow DCN hops carry
    only the 16 x Q psum once per selfConsist round), the pairs axis
    stays within each host's chips (ICI carries the per-sweep
    collectives). Defaults to samples = process count."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if samples is None:
        samples = max(1, jax.process_count())
    return make_mesh(devices=devs, samples=samples)


def _allgather_blobs(blob: bytes):
    """Exchange one variable-length byte blob per process; returns the
    list of every process's blob in process order. Sizes are agreed
    first, then the padded uint8 buffers travel in one allgather (bytes
    are bit-exact transport for packed float64/int64 payloads, immune
    to the x64-off truncation device dtypes suffer)."""
    from jax.experimental import multihost_utils

    arr = np.frombuffer(blob, np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(arr)], np.int64)))
    mx = int(sizes.max())
    padded = np.zeros(mx, np.uint8)
    padded[: len(arr)] = arr
    all_ = np.asarray(multihost_utils.process_allgather(padded))
    return [all_[p, : int(sizes[p, 0])].tobytes()
            for p in range(all_.shape[0])]


def _pack_sample_summaries(items) -> bytes:
    """Serialize (global_index, name, sequences, abundances, quals)
    tuples; quals travel as exact float64 bytes."""
    import io
    import pickle

    out = io.BytesIO()
    payload = []
    for gidx, name, seqs, ab, quals in items:
        payload.append((int(gidx), name, list(seqs),
                        np.asarray(ab, np.int64).tobytes(),
                        None if quals is None else
                        (quals.shape, np.asarray(quals, np.float64)
                         .tobytes())))
    pickle.dump(payload, out, protocol=4)
    return out.getvalue()


def _unpack_sample_summaries(blob: bytes):
    import pickle

    out = []
    for gidx, name, seqs, ab_b, quals_t in pickle.loads(blob):
        ab = np.frombuffer(ab_b, np.int64)
        quals = None
        if quals_t is not None:
            shape, qb = quals_t
            quals = np.frombuffer(qb, np.float64).reshape(shape)
        out.append((gidx, name, seqs, ab, quals))
    return out


def gather_sample_summaries(local_items):
    """Allgather per-sample unique summaries (sequences + abundances +
    average quals) across every process, returned sorted by global
    sample index — the distributed dedup exchange for pool=TRUE
    (SURVEY.md §7 hard-part 7; reads never leave their host, only the
    dereplicated uniques travel).

    local_items: iterable of (global_index, name, sequences,
    abundances, quals)."""
    blobs = _allgather_blobs(_pack_sample_summaries(local_items))
    merged = []
    for b in blobs:
        merged.extend(_unpack_sample_summaries(b))
    merged.sort(key=lambda t: t[0])
    return merged


def accumulate_trans_global(local_tallies, mesh: Mesh):
    """Exact global accumulateTrans across the mesh's processes: sum
    this host's tallies in int64 on the host, allgather across
    processes as two int32 limbs (device transport truncates int64 with
    x64 off), recombine and sum. Bit-identical to running
    errors.accumulate_trans over all hosts' tallies in one place.

    reference: R/errorModels.R:462-471 is the single-node semantics.
    """
    from jax.experimental import multihost_utils

    from ..errors import accumulate_trans

    local = (accumulate_trans(local_tallies) if local_tallies
             else np.zeros((16, 1), np.int64))
    # processes may hold different Q widths (ragged, as in the
    # reference): agree on the global width first
    ncol = np.asarray([local.shape[1]], np.int32)
    ncols = np.asarray(multihost_utils.process_allgather(ncol))
    Q = int(ncols.max())
    padded = np.zeros((16, Q), np.int64)
    padded[:, : local.shape[1]] = local
    if (padded >> 50).any():
        raise OverflowError("transition tally exceeds the two-limb "
                            "collective's exact range")
    lo = (padded & ((1 << 20) - 1)).astype(np.int32)
    hi = (padded >> 20).astype(np.int32)
    lo_all = np.asarray(multihost_utils.process_allgather(lo))
    hi_all = np.asarray(multihost_utils.process_allgather(hi))
    return (lo_all.astype(np.int64).sum(axis=0)
            + (hi_all.astype(np.int64).sum(axis=0) << 20))
