"""TPU compare backend: device-batched screens + alignment + traceback.

Implements the CompareBackend interface with the batched JAX kernels in
ops/nw_batch.py. One compare() call replaces the reference's TBB-parallel
sweep over raws (reference: src/cluster.cpp:90-204): the k-mer and
ordered-k-mer screens run as dense device ops over all uniques, the
surviving candidates are compacted and swept through the banded wavefront
NW kernel in one batch, and the exact float64 lambda product runs on the
host from the device-computed per-position transition vectors (sequential
in position order, bit-identical to the reference's compute_lambda_ts,
src/pval.cpp:144-197).

Static-shape discipline: per-call batch sizes are padded to power-of-two
buckets and the band-window/diagonal-count geometry is rounded up (extra
cells are masked out in-kernel), so the whole clustering run reuses a
small, cached set of compiled programs.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..encode import GAP_GLYPH, KMER_SIZE
from ..options import DadaOptions
from .engine import CompareBackend
from .raws import RawSet
from ..ops.subs import Sub
from ..ops import nw_batch as nwb


def _bucket(n: int, lo: int = 16) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.jit
def _screen_kernel(kmers, kords, lens, center):
    """k-mer min-sum + positionwise ordered-k-mer matches vs one center.

    reference: src/kmers.cpp:58-93 (kmer_dist_SSEi_8) and :121-150
    (kord_dist_SSEi). Exact integer counts (the reference's 8-bit
    saturating path falls back to 16-bit on overflow, so exact == its
    result, src/nwalign_endsfree.cpp:23-26).
    """
    kvc = kmers[center]
    minsum = jnp.minimum(kvc[None, :], kmers).sum(axis=-1)
    minklen = jnp.minimum(lens, lens[center]) - (KMER_SIZE - 1)
    pos = jnp.arange(kords.shape[1], dtype=jnp.int32)[None, :]
    kmatch = jnp.sum(((kords == kords[center][None, :]) &
                      (pos < minklen[:, None])).astype(jnp.int32), axis=-1)
    return minsum, kmatch


@partial(jax.jit, static_argnames=("nd", "W", "match", "mismatch", "gap_p",
                                   "end_gap_p", "band"))
def _align_center_jit(s1, len1, s2b, len2b, *, nd, W, match, mismatch,
                      gap_p, end_gap_p, band):
    """nw_batch specialization: one center vs a batch of candidates."""
    len1 = len1.astype(jnp.int32)
    len2b = len2b.astype(jnp.int32)
    if band < 0:
        lband = jnp.broadcast_to(len1, len2b.shape)
        rband = len2b
    else:
        lband = band + jnp.maximum(0, len1 - len2b)
        rband = band + jnp.maximum(0, len2b - len1)

    fill = jax.vmap(
        lambda b, lb, lbd, rbd: nwb._fill_kernel(
            s1, len1, b, lb, lbd, rbd, nd, W, match, mismatch, gap_p,
            end_gap_p))
    ptrs = fill(s2b, len2b, lband, rband)

    nsteps = s1.shape[0] + s2b.shape[1]
    tb = jax.vmap(
        lambda p, b, lb, rbd: nwb._traceback_kernel(
            p, s1, len1, b, lb, rbd, nsteps, W))
    kinds, p0, p1, fi, fj = tb(ptrs, s2b, len2b, rband)

    def derive(kinds, p0, p1, b, lb):
        diag = kinds == nwb.PTR_DIAG
        nt0 = s1[jnp.clip(p0, 0, s1.shape[0] - 1)].astype(jnp.int32)
        nt1 = b[jnp.clip(p1, 0, b.shape[0] - 1)].astype(jnp.int32)
        ham = jnp.sum((diag & (nt0 != nt1)).astype(jnp.int32))
        bl = b.astype(jnp.int32)
        tvec = jnp.where(jnp.arange(b.shape[0]) < lb, 5 * bl, 16)
        idx = jnp.where(diag, p1, b.shape[0])
        tvec = tvec.at[idx].set(jnp.where(diag, 4 * nt0 + nt1, 0),
                                mode="drop")
        return ham, tvec.astype(jnp.int8)

    ham, tvec = jax.vmap(derive)(kinds, p0, p1, s2b, len2b)
    ok = (fi == 0) & (fj == 0)
    return kinds, p0, p1, ham, tvec, ok


class TpuBackend(CompareBackend):
    """Device-batched compare backend (the TPU fast path)."""

    def __init__(self, rawset: RawSet, use_quals: bool = True):
        self.rs = rawset
        self.use_quals = use_quals
        self.d_seqs = jnp.asarray(rawset.seqs, jnp.int8)
        self.d_lens = jnp.asarray(rawset.lens, jnp.int32)
        self.d_kmers = jnp.asarray(rawset.kmers, jnp.int32)
        self.d_kords = jnp.asarray(rawset.kords, jnp.int32)
        self.lens = np.asarray(rawset.lens, np.int64)
        self.maxlen = rawset.max_len

    # ---- screens -------------------------------------------------------

    def _screens(self, center: int):
        minsum, kmatch = _screen_kernel(self.d_kmers, self.d_kords,
                                        self.d_lens, jnp.int32(center))
        return np.asarray(minsum, np.int64), np.asarray(kmatch, np.int64)

    # ---- batched alignment --------------------------------------------

    def _align_batch(self, center: int, idx: np.ndarray, opts: DadaOptions):
        """Banded NW of candidates idx vs center. Returns device outputs
        (kinds, p0, p1, ham, tvec, ok) with rows matching idx order."""
        nb = _bucket(len(idx))
        # pad with copies of a real row so padded rows share its geometry
        pad = np.full(nb - len(idx), idx[0], np.int64)
        full = np.concatenate([idx, pad])
        l1 = int(self.lens[center])
        nd, W = nwb.batch_geometry(np.full(len(idx), l1),
                                   self.lens[idx], opts.BAND_SIZE)
        nd = _round_up(max(nd, 2), 64)
        W = _round_up(W, 16)
        s2b = jnp.take(self.d_seqs, jnp.asarray(full), axis=0)
        l2b = jnp.take(self.d_lens, jnp.asarray(full), axis=0)
        out = _align_center_jit(
            self.d_seqs[center], self.d_lens[center], s2b, l2b,
            nd=nd, W=W, match=opts.MATCH, mismatch=opts.MISMATCH,
            gap_p=opts.GAP_PENALTY, end_gap_p=0, band=opts.BAND_SIZE)
        return out

    # ---- lambda (host, exact float64) ---------------------------------

    def _lambdas(self, idx: np.ndarray, tvec: np.ndarray,
                 err: np.ndarray) -> np.ndarray:
        """Sequential-order float64 product of err factors per candidate.

        reference: src/pval.cpp:144-197 (compute_lambda_ts).
        """
        rs = self.rs
        L = tvec.shape[1]
        lens = self.lens[idx]
        posmask = np.arange(L)[None, :] < lens[:, None]
        t = np.where(posmask, tvec, 0).astype(np.int64)
        if self.use_quals and rs.quals is not None:
            q = rs.quals[idx, :L].astype(np.int64)
        else:
            q = np.zeros_like(t)
        factors = err[t, np.where(posmask, q, 0)]
        factors[~posmask] = 1.0
        return np.multiply.reduce(factors, axis=1)

    # ---- gapless pairs (no DP needed) ---------------------------------

    def _gapless_tvec_ham(self, center: int, idx: np.ndarray):
        """tvec/ham for pad-to-length alignments.

        reference: src/nwalign_endsfree.cpp:539-555 (nwalign_gapless).
        """
        rs = self.rs
        l1 = int(self.lens[center])
        lens = self.lens[idx]
        L = self.maxlen
        s0 = rs.seqs[center].astype(np.int64)
        s1 = rs.seqs[idx].astype(np.int64)
        both = np.arange(L)[None, :] < np.minimum(lens, l1)[:, None]
        valid = np.arange(L)[None, :] < lens[:, None]
        tvec = np.where(valid, 5 * s1, 16)
        sub = both & (s0[None, :] != s1)
        tvec[sub] = (4 * s0[None, :] + s1)[sub]
        ham = sub.sum(axis=1).astype(np.int64)
        return tvec.astype(np.int8), ham

    # ---- CompareBackend interface -------------------------------------

    def compare(self, center: int, skip: np.ndarray, opts: DadaOptions,
                err: np.ndarray, use_kmers: bool, kdist_cutoff: float):
        rs = self.rs
        n = rs.n
        lam = np.zeros(n)
        ham = np.full(n, -1, dtype=np.int64)
        cand = ~np.asarray(skip, bool)
        l1 = int(self.lens[center])

        gapless = np.zeros(n, dtype=bool)
        if use_kmers:
            minsum, kmatch = self._screens(center)
            denom = np.minimum(self.lens, l1) - (KMER_SIZE - 1.0)
            kdist = 1.0 - minsum / denom
            cand &= ~(kdist > kdist_cutoff)  # "shrouded"
            if opts.GAPLESS:
                gapless = kmatch == minsum
                if opts.SSE < 1:
                    # scalar kord_dist disables the screen on length
                    # mismatch (reference: src/kmers.cpp:102-116)
                    gapless &= self.lens == l1
        if opts.BAND_SIZE == 0:
            gapless[:] = True

        gl_idx = np.nonzero(cand & gapless)[0]
        al_idx = np.nonzero(cand & ~gapless)[0]

        if len(gl_idx):
            tvec, h = self._gapless_tvec_ham(center, gl_idx)
            lam[gl_idx] = self._lambdas(gl_idx, tvec, err)
            ham[gl_idx] = h
        if len(al_idx):
            _, _, _, h, tvec, ok = self._align_batch(center, al_idx, opts)
            h = np.asarray(h, np.int64)[: len(al_idx)]
            tvec = np.asarray(tvec)[: len(al_idx)]
            okh = np.asarray(ok)[: len(al_idx)]
            if not okh.all():
                raise RuntimeError("N-W Align out of range.")
            lam[al_idx] = self._lambdas(al_idx, tvec, err)
            ham[al_idx] = h
        return lam, ham

    # ---- Sub construction (finalize path) ------------------------------

    def _steps_to_sub(self, kinds: np.ndarray, p0: np.ndarray,
                      p1: np.ndarray, center: int, j: int) -> Sub:
        rs = self.rs
        live = kinds != nwb.PTR_NONE
        k = kinds[live][::-1]
        q0 = p0[live][::-1]
        q1 = p1[live][::-1]
        len0 = int(self.lens[center])
        map_ = np.full(len0, GAP_GLYPH, dtype=np.int32)
        diag = k == nwb.PTR_DIAG
        map_[q0[diag]] = q1[diag]
        nt0 = rs.seqs[center, q0[diag]]
        nt1 = rs.seqs[j, q1[diag]]
        mism = nt0 != nt1
        return Sub(nsubs=int(mism.sum()), len0=len0, map=map_,
                   pos=q0[diag][mism].astype(np.int32),
                   nt0=nt0[mism], nt1=nt1[mism])

    def _gapless_sub(self, center: int, j: int) -> Sub:
        rs = self.rs
        len0 = int(self.lens[center])
        len1 = int(self.lens[j])
        m = min(len0, len1)
        map_ = np.full(len0, GAP_GLYPH, dtype=np.int32)
        map_[:m] = np.arange(m, dtype=np.int32)
        s0 = rs.seqs[center, :m]
        s1 = rs.seqs[j, :m]
        mism = s0 != s1
        return Sub(nsubs=int(mism.sum()), len0=len0, map=map_,
                   pos=np.nonzero(mism)[0].astype(np.int32),
                   nt0=s0[mism], nt1=s1[mism])

    def _subs_batch(self, center: int, members: np.ndarray,
                    opts: DadaOptions, use_kmers: bool,
                    kdist_cutoff: float) -> List[Optional[Sub]]:
        n = len(members)
        out: List[Optional[Sub]] = [None] * n
        keep = np.ones(n, dtype=bool)
        gapless = np.zeros(n, dtype=bool)
        l1 = int(self.lens[center])
        if use_kmers:
            minsum, kmatch = self._screens(center)
            minsum, kmatch = minsum[members], kmatch[members]
            denom = np.minimum(self.lens[members], l1) - (KMER_SIZE - 1.0)
            kdist = 1.0 - minsum / denom
            keep = ~(kdist > kdist_cutoff)
            if opts.GAPLESS:
                gapless = kmatch == minsum
                if opts.SSE < 1:
                    gapless &= self.lens[members] == l1
        if opts.BAND_SIZE == 0:
            gapless[:] = True
        for k in np.nonzero(keep & gapless)[0]:
            out[k] = self._gapless_sub(center, int(members[k]))
        al = np.nonzero(keep & ~gapless)[0]
        if len(al):
            idx = members[al]
            kinds, p0, p1, _, _, ok = self._align_batch(center, idx, opts)
            kinds = np.asarray(kinds)[: len(al)]
            p0 = np.asarray(p0)[: len(al)]
            p1 = np.asarray(p1)[: len(al)]
            if not np.asarray(ok)[: len(al)].all():
                raise RuntimeError("N-W Align out of range.")
            for r, k in enumerate(al):
                out[k] = self._steps_to_sub(kinds[r], p0[r], p1[r],
                                            center, int(idx[r]))
        return out

    def subs_pair(self, i0: int, i1: int, opts: DadaOptions,
                  use_kmers: bool, kdist_cutoff: float) -> Optional[Sub]:
        return self._subs_batch(i0, np.array([i1], np.int64), opts,
                                use_kmers, kdist_cutoff)[0]

    def subs_to_center(self, center: int, members: np.ndarray,
                       opts: DadaOptions) -> List[Optional[Sub]]:
        # use_kmers=False: no screens (reference: src/Rmain.cpp:209)
        return self._subs_batch(center, np.asarray(members, np.int64),
                                opts, False, 1.0)
