"""Chimera (bimera) identification and removal.

reference: src/chimera.cpp (C_is_bimera :18-58, BimeraTableParallel :60-174,
get_ham_endsfree :196-224, get_lr :228-269) and R/chimeras.R (isBimera :43,
isBimeraDenovo :105, isBimeraDenovoTable :220, removeBimeraDenovo :294,
isShiftDenovo :380).

The pairwise alignments (query vs candidate parents, ends-free vectorized NW
with band = maxShift) run batched on device; the left/right overlap
credit scans (get_lr) and the ends-free hamming are computed as VECTORIZED
run-length scans over the whole [npairs, L] alignment-code batch —
argmax/cummax formulations of the reference's pointer walks, reproducing
their quirks exactly (position-based shift crediting with the asymmetric
right-side bound, the one-off double-credit of the first post-mismatch
match, the AND-carried end-gap trimming). The scalar pointer walks live
in tests/test_chimeras.py as oracles and the vectorized scans are fuzzed
against them there.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

from .encode import pack_sequences
from .options import current_options
from .ops.nw_batch import PTR_LEFT, PTR_NONE, PTR_UP, nw_batch
from .ops.nw_ref import GAP

_PAD = 255  # padding code outside each pair's alignment length


def _alignment_code_mats(pairs_chunk, mat, lens, maxShift, match,
                         mismatch, gap_p):
    """Gapped-alignment code matrices for (query, parent) index pairs.

    One device nw_batch + one vectorized host reconstruction (the
    batched equivalent of ops/nw_batch.steps_to_alignment). Returns
    (A, B, m): [P, Lmax] uint8 with GAP=254 and _PAD beyond each
    pair's alignment length m[p].

    reference: nwalign_vectorized2 calls in src/chimera.cpp:27,122."""
    qi = np.fromiter((p[0] for p in pairs_chunk), np.int64,
                     len(pairs_chunk))
    pi = np.fromiter((p[1] for p in pairs_chunk), np.int64,
                     len(pairs_chunk))
    kinds, p0, p1, _, _, ok = nw_batch(
        mat[qi], lens[qi], mat[pi], lens[pi], match=match,
        mismatch=mismatch, gap_p=gap_p, end_gap_p=0, band=maxShift)
    kinds, p0, p1 = np.asarray(kinds), np.asarray(p0), np.asarray(p1)
    if not np.asarray(ok).all():
        raise RuntimeError("N-W Align out of range.")
    live = kinds != PTR_NONE            # contiguous step prefix, reversed
    m = live.sum(axis=1)
    Lmax = int(m.max()) if len(m) else 0
    P = len(pairs_chunk)
    rows = np.arange(P)[:, None]
    J = m[:, None] - 1 - np.arange(Lmax)[None, :]   # un-reverse steps
    valid = J >= 0
    Jc = np.clip(J, 0, kinds.shape[1] - 1)
    kg = kinds[rows, Jc]
    s1g = mat[qi[:, None], np.clip(p0[rows, Jc], 0, mat.shape[1] - 1)]
    s2g = mat[pi[:, None], np.clip(p1[rows, Jc], 0, mat.shape[1] - 1)]
    A = np.where(kg != PTR_LEFT, s1g, GAP).astype(np.uint8)
    B = np.where(kg != PTR_UP, s2g, GAP).astype(np.uint8)
    A[~valid] = _PAD
    B[~valid] = _PAD
    return A, B, m.astype(np.int64)


def _first_false(mask: np.ndarray, start: np.ndarray) -> np.ndarray:
    """Per row: smallest index >= start[p] where mask[p] is False, or
    L if none (rows whose start is past the last False get L)."""
    L = mask.shape[1]
    W = ~mask & (np.arange(L)[None, :] >= start[:, None])
    hit = W.any(axis=1)
    return np.where(hit, W.argmax(axis=1), L)


def _lr_one_side(A, B, m, allow_one_off, shift_bound):
    """One directional credit scan (reference: get_lr one direction,
    src/chimera.cpp:228-269): skip query end-gaps, credit parent
    overhang while idx < shift_bound, credit the match run, then the
    one-off extension past a single mismatch."""
    idx = np.arange(A.shape[1])[None, :]
    inlen = idx < m[:, None]
    q0 = _first_false((A == GAP) & inlen, np.zeros(len(m), np.int64))
    s = _first_false((B == GAP) & (idx < shift_bound), q0)
    eq = (A == B) & inlen
    e = _first_false(eq, s)
    credit = e - q0
    credit_oo = credit
    if allow_one_off:
        t = e + 1
        tc = np.clip(t, 0, A.shape[1] - 1)
        bonus = (t < m) & (A[np.arange(len(m)), tc] != GAP)
        f = _first_false(eq, np.minimum(t, A.shape[1]))
        credit_oo = credit + bonus + np.maximum(f - t, 0)
    return credit, credit_oo


def _reverse_rows(X: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Reverse each row's first m[p] entries; pad stays at the end."""
    L = X.shape[1]
    J = m[:, None] - 1 - np.arange(L)[None, :]
    out = X[np.arange(X.shape[0])[:, None], np.clip(J, 0, L - 1)]
    out[J < 0] = _PAD
    return out


def _lr_ham_batch(A, B, m, allow_one_off, max_shift):
    """Vectorized get_lr + get_ham_endsfree over the whole batch.

    reference: src/chimera.cpp:228-269 (get_lr; note the asymmetric
    bounds — left overhang creditable at idx < max_shift, right at
    reverse-idx < max_shift-1, from `pos > len0 - max_shift`) and
    :196-224 (get_ham_endsfree with AND-carried end trimming).
    Returns (left, right, left_oo, right_oo, ham) int64 [P]."""
    left, left_oo = _lr_one_side(A, B, m, allow_one_off, max_shift)
    Ar = _reverse_rows(A, m)
    Br = _reverse_rows(B, m)
    right, right_oo = _lr_one_side(Ar, Br, m, allow_one_off,
                                   max_shift - 1)
    # ends-free hamming: trim max(leading gap runs), max(trailing runs)
    zero = np.zeros(len(m), np.int64)
    idx = np.arange(A.shape[1])[None, :]
    start = np.maximum(_first_false(A == GAP, zero),
                       _first_false(B == GAP, zero))
    rtrim = np.maximum(_first_false(Ar == GAP, zero),
                       _first_false(Br == GAP, zero))
    end = m - rtrim  # exclusive
    ham = ((A != B) & (idx >= start[:, None])
           & (idx < end[:, None])).sum(axis=1)
    return (left.astype(np.int64), right.astype(np.int64),
            left_oo.astype(np.int64), right_oo.astype(np.int64),
            ham.astype(np.int64))


_CHUNK_PAIRS = 65536


def _jnp_first_false(mask, start, L):
    """Per row: smallest index >= start[p] with mask False, else L."""
    import jax.numpy as jnp

    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    W = ~mask & (idx >= start[:, None])
    return jnp.where(W.any(axis=1), jnp.argmax(W, axis=1).astype(jnp.int32),
                     jnp.int32(L))


def _jnp_lr_one_side(A, B, m, allow_one_off, shift_bound):
    import jax.numpy as jnp

    L = A.shape[1]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    inlen = idx < m[:, None]
    zero = jnp.zeros_like(m)
    q0 = _jnp_first_false((A == GAP) & inlen, zero, L)
    s = _jnp_first_false((B == GAP) & (idx < shift_bound), q0, L)
    eq = (A == B) & inlen
    e = _jnp_first_false(eq, s, L)
    credit = e - q0
    if not allow_one_off:
        return credit, credit
    t = e + 1
    tc = jnp.clip(t, 0, L - 1)
    bonus = ((t < m) & (jnp.take_along_axis(A, tc[:, None], axis=1)[:, 0]
                        != GAP)).astype(jnp.int32)
    f = _jnp_first_false(eq, jnp.minimum(t, L), L)
    return credit, credit + bonus + jnp.maximum(f - t, 0)


def _lr_stats_device(kinds, p0, p1, sq, sp, allow_one_off, max_shift):
    """Device twin of (_alignment_code_mats + _lr_ham_batch): compute
    the five lr/ham statistics straight from the traceback steps, so
    only [P, 5] ints ever leave the device. The steps arrive REVERSED
    (end-first), which IS the right-side scan order — the left side is
    recovered with one un-reversing gather."""
    import jax.numpy as jnp

    P, L = kinds.shape
    live = kinds != PTR_NONE
    m = live.sum(axis=1).astype(jnp.int32)
    # reversed-order (right-side) code rows, straight from the steps
    s1g = jnp.take_along_axis(
        sq.astype(jnp.int32), jnp.clip(p0, 0, sq.shape[1] - 1), axis=1)
    s2g = jnp.take_along_axis(
        sp.astype(jnp.int32), jnp.clip(p1, 0, sp.shape[1] - 1), axis=1)
    Ar = jnp.where(live, jnp.where(kinds != PTR_LEFT, s1g, GAP), _PAD)
    Br = jnp.where(live, jnp.where(kinds != PTR_UP, s2g, GAP), _PAD)
    # forward-order rows via the un-reversing gather
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    J = m[:, None] - 1 - idx
    Jc = jnp.clip(J, 0, L - 1)
    A = jnp.where(J >= 0, jnp.take_along_axis(Ar, Jc, axis=1), _PAD)
    B = jnp.where(J >= 0, jnp.take_along_axis(Br, Jc, axis=1), _PAD)

    left, left_oo = _jnp_lr_one_side(A, B, m, allow_one_off, max_shift)
    right, right_oo = _jnp_lr_one_side(Ar, Br, m, allow_one_off,
                                       max_shift - 1)
    zero = jnp.zeros_like(m)
    start = jnp.maximum(_jnp_first_false(A == GAP, zero, L),
                        _jnp_first_false(B == GAP, zero, L))
    rtrim = jnp.maximum(_jnp_first_false(Ar == GAP, zero, L),
                        _jnp_first_false(Br == GAP, zero, L))
    end = m - rtrim
    ham = ((A != B) & (idx >= start[:, None])
           & (idx < end[:, None])).sum(axis=1).astype(jnp.int32)
    return jnp.stack([left, right, left_oo, right_oo, ham], axis=1)


def _eval_stats_device(kinds, p0, p1, sq, sp):
    """Device twin of eval_pair over a traceback-step batch:
    (match, mismatch, indel) with leading/trailing end-gap runs trimmed
    exactly like the scalar walk (reference: C_eval_pair,
    src/evaluate.cpp:73-113 — the counted range is [max of the two
    leading gap-run ends, last position of the longer trailing run's
    first non-gap], both inclusive). Steps arrive reversed (end-first),
    so the trailing trim reads straight off Ar/Br and the forward rows
    come from one un-reversing gather. Only [P, 3] ints leave the
    device."""
    import jax.numpy as jnp

    P, L = kinds.shape
    live = kinds != PTR_NONE
    m = live.sum(axis=1).astype(jnp.int32)
    s1g = jnp.take_along_axis(
        sq.astype(jnp.int32), jnp.clip(p0, 0, sq.shape[1] - 1), axis=1)
    s2g = jnp.take_along_axis(
        sp.astype(jnp.int32), jnp.clip(p1, 0, sp.shape[1] - 1), axis=1)
    Ar = jnp.where(live, jnp.where(kinds != PTR_LEFT, s1g, GAP), _PAD)
    Br = jnp.where(live, jnp.where(kinds != PTR_UP, s2g, GAP), _PAD)
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    J = m[:, None] - 1 - idx
    Jc = jnp.clip(J, 0, L - 1)
    A = jnp.where(J >= 0, jnp.take_along_axis(Ar, Jc, axis=1), _PAD)
    B = jnp.where(J >= 0, jnp.take_along_axis(Br, Jc, axis=1), _PAD)
    zero = jnp.zeros_like(m)
    start = jnp.maximum(_jnp_first_false(A == GAP, zero, L),
                        _jnp_first_false(B == GAP, zero, L))
    rtrim = jnp.maximum(_jnp_first_false(Ar == GAP, zero, L),
                        _jnp_first_false(Br == GAP, zero, L))
    sel = (idx >= start[:, None]) & (idx < (m - rtrim)[:, None])
    gap = (A == GAP) | (B == GAP)
    indel = (gap & sel).sum(axis=1)
    match = ((A == B) & sel).sum(axis=1)
    mismatch = (sel & ~gap & (A != B)).sum(axis=1)
    return jnp.stack([match, mismatch, indel], axis=1).astype(jnp.int32)


_lr_stats_device_jit = None
_eval_stats_device_jit = None


def _get_lr_stats_jit():
    global _lr_stats_device_jit
    if _lr_stats_device_jit is None:
        import jax

        _lr_stats_device_jit = jax.jit(
            _lr_stats_device, static_argnames=("allow_one_off",
                                               "max_shift"))
    return _lr_stats_device_jit


def _get_eval_stats_jit():
    global _eval_stats_device_jit
    if _eval_stats_device_jit is None:
        import jax

        _eval_stats_device_jit = jax.jit(_eval_stats_device)
    return _eval_stats_device_jit


def _batch_lr_stats(pairs, seqs, maxShift, match, mismatch, gap_p,
                    allow_one_off):
    """lr/ham statistics for arbitrary (query, parent) index pairs:
    device-aligned AND device-scanned in chunks — alignments never
    materialize on the host; each chunk fetches [P, 5] ints.

    Returns (left, right, left_oo, right_oo, ham) int64 [len(pairs)]."""
    P = len(pairs)
    outs = [np.zeros(P, np.int64) for _ in range(5)]
    if P == 0:
        return tuple(outs)
    # Pallas route (TPU, or interpret mode under DADA2_TPU_PALLAS=1):
    # one wavefront-kernel sweep per distinct query — the XLA nw_batch
    # scan's per-pair dynamic windows serialize on real TPU hardware
    # (~500 pairs/s measured vs the kernel's millions)
    if P >= 256 or os.environ.get("DADA2_TPU_PALLAS") == "1":
        be, bopts = _chimera_backend(seqs, match, mismatch, gap_p,
                                     maxShift)
        if be is not None:
            out = _batch_lr_stats_pallas(be, bopts, pairs, maxShift,
                                         allow_one_off)
            if out is not None:
                return out
    mat, lens = pack_sequences(seqs)
    fn = _get_lr_stats_jit()
    for lo in range(0, P, _CHUNK_PAIRS):
        chunk = pairs[lo: lo + _CHUNK_PAIRS]
        # pad the chunk to a power of two (repeat pair 0) to bound
        # compile diversity across chunked calls
        nb = 1 << (len(chunk) - 1).bit_length()
        qi = np.fromiter((p[0] for p in chunk), np.int64, len(chunk))
        pi = np.fromiter((p[1] for p in chunk), np.int64, len(chunk))
        qi = np.concatenate([qi, np.full(nb - len(chunk), qi[0])])
        pi = np.concatenate([pi, np.full(nb - len(chunk), pi[0])])
        kinds, p0, p1, _, _, ok = nw_batch(
            mat[qi], lens[qi], mat[pi], lens[pi], match=match,
            mismatch=mismatch, gap_p=gap_p, end_gap_p=0, band=maxShift)
        if not np.asarray(ok).all():
            raise RuntimeError("N-W Align out of range.")
        stats = np.asarray(fn(kinds, p0, p1, mat[qi], mat[pi],
                              allow_one_off, maxShift))[: len(chunk)]
        for k, o in enumerate(outs):
            o[lo: lo + len(chunk)] = stats[:, k]
    return tuple(outs)


def _lr_accum_trace(buf, mapq, seqs, lens, center, pidx, start, *, CNT,
                    mL, allow_one_off, max_shift):
    """Device lr/ham stats for one query's parent group, straight from
    the wavefront kernel's merged map rows (backend_tpu._align_ent).

    A map row gives, for every 1-based center (query) position i:
    ``(qual << 17) | (member_pos << 3) | (nt1 + 2)`` for a diagonal
    step, ``1`` for a query-char-vs-member-gap column, 0 past the end.
    The full gapped alignment is reconstructed from it: the column of
    center position i is (i-1) + members-consumed-before-i (j_i - 1 at
    diagonal steps, else the running max of consumed j), member
    insertions fill the remaining columns in order, and
    m = len1 + len2 - ndiag. The reconstruction feeds the SAME
    vectorized get_lr/ham scans as the nw_batch route, so the two
    routes are interchangeable (fuzzed in tests/test_chimeras.py).

    Writes stats [CNT, 5] into buf at ``start`` (buffer donated across
    the per-query loop; padded tail rows are overwritten by later
    groups)."""
    import jax
    import jax.numpy as jnp

    rows = jax.lax.dynamic_slice(pidx, (start,), (CNT,))
    L1 = mapq.shape[1] - 1
    code = jnp.take(mapq, rows, axis=0)[:, 1:].astype(jnp.int32)
    len1 = lens[center].astype(jnp.int32)
    ipos = jnp.arange(1, L1 + 1, dtype=jnp.int32)[None, :]
    on = (code != 0) & (ipos <= len1)
    low = code & 7
    cons = on & (low >= 2)
    gapc = on & (low == 1)
    j1 = jnp.where(cons, (code >> 3) & 0x3FFF, 0)
    jmax = jax.lax.cummax(j1, axis=1)
    jmax_excl = jnp.concatenate(
        [jnp.zeros((CNT, 1), jnp.int32), jmax[:, :-1]], axis=1)
    jbefore = jnp.where(cons, j1 - 1, jmax_excl)
    ndiag_excl = jnp.concatenate(
        [jnp.zeros((CNT, 1), jnp.int32),
         jnp.cumsum(cons.astype(jnp.int32), axis=1)[:, :-1]], axis=1)
    # column of center position i = (center cols before) + (insertion
    # cols before) = (i-1) + (members consumed before i) - (members
    # consumed AT earlier center columns)
    col = jnp.where(on, (ipos - 1) + jbefore - ndiag_excl, mL)
    l2 = jnp.take(lens, rows).astype(jnp.int32)
    ndiag = cons.sum(axis=1).astype(jnp.int32)
    m = len1 + l2 - ndiag

    # Column CLASS codes replace the A/B code matrices — the map row
    # already carries the member char (nt1) at diagonal steps, so the
    # only per-column facts the scans use are derivable without any
    # B-side gather: 0 = member-insertion column (query gap),
    # 1 = query-vs-gap column (member gap), 2 = substitution,
    # 3 = match, 4 = past the alignment. ONE scatter builds it
    # (default 0 inside m, 4 beyond).
    W = seqs.shape[1]
    csq = jnp.take(seqs, center, axis=0).astype(jnp.int32)
    csq = jnp.pad(csq, (0, max(L1 - W, 0)))[:L1]
    nt1 = low - 2
    cls_i = jnp.where(gapc, 1,
                      jnp.where(nt1 == csq[None, :], 3, 2))
    cidx = jnp.arange(mL, dtype=jnp.int32)[None, :]
    inm = cidx < m[:, None]
    r2 = jnp.arange(CNT, dtype=jnp.int32)[:, None]
    C0 = jnp.where(inm, jnp.int8(0), jnp.int8(4))
    C = C0.at[r2, col].set(cls_i.astype(jnp.int8), mode="drop")
    J = m[:, None] - 1 - cidx
    Jc = jnp.clip(J, 0, mL - 1)
    Cr = jnp.where(J >= 0, jnp.take_along_axis(C, Jc, axis=1),
                   jnp.int8(4))

    def one_side(Cs, shift_bound):
        idx = cidx
        inlen = idx < m[:, None]
        zero = jnp.zeros_like(m)
        q0 = _jnp_first_false((Cs == 0) & inlen, zero, mL)
        s = _jnp_first_false((Cs == 1) & (idx < shift_bound), q0, mL)
        eq = (Cs == 3) & inlen
        e = _jnp_first_false(eq, s, mL)
        credit = e - q0
        if not allow_one_off:
            return credit, credit
        t = e + 1
        tc = jnp.clip(t, 0, mL - 1)
        bonus = ((t < m) & (jnp.take_along_axis(
            Cs, tc[:, None], axis=1)[:, 0] != 0)).astype(jnp.int32)
        f = _jnp_first_false(eq, jnp.minimum(t, mL), mL)
        return credit, credit + bonus + jnp.maximum(f - t, 0)

    left, left_oo = one_side(C, max_shift)
    right, right_oo = one_side(Cr, max_shift - 1)
    zero = jnp.zeros_like(m)
    startc = jnp.maximum(_jnp_first_false(C == 0, zero, mL),
                         _jnp_first_false(C == 1, zero, mL))
    rtrim = jnp.maximum(_jnp_first_false(Cr == 0, zero, mL),
                        _jnp_first_false(Cr == 1, zero, mL))
    end = m - rtrim
    ham = ((C != 3) & (cidx >= startc[:, None])
           & (cidx < end[:, None])).sum(axis=1).astype(jnp.int32)
    stats = jnp.stack([left, right, left_oo, right_oo, ham],
                      axis=1).astype(jnp.int32)
    return jax.lax.dynamic_update_slice(buf, stats,
                                        (start, jnp.int32(0)))


def _lr_accum_pairs_trace(cls_rows, *, allow_one_off, max_shift):
    """lr/ham stats for arbitrary pairs straight from the kernel's
    per-step alignment-column CLASS emission (emit_kinds="cls": 0 =
    inactive diagonal, 1 = s2-insertion/A-gap, 2 = A-char-vs-B-gap,
    3 = substitution, 4 = match, in forward diagonal order).

    The column-space scans (_lr_one_side/_lr_ham_batch) run here in
    DIAGONAL space with inactive steps transparent — a step's column
    index is the running count of active steps before it, so every
    column-bound predicate maps to a masked cumsum and the whole thing
    is elementwise + argmax, with NO column scatter (a [CNT, mL]
    scatter serializes on the TPU scalar core and dominated the first
    implementation). Returns stats [CNT, 5] int32."""
    import jax.numpy as jnp

    CNT, D = cls_rows.shape
    cls_f = cls_rows.astype(jnp.int32)
    a_f = cls_f != 0
    m = a_f.sum(axis=1).astype(jnp.int32)

    def colof(cv, d_idx):
        # column index of the active step at diagonal d_idx (clamped
        # gather); d_idx == D (not found) maps to column m
        got = jnp.take_along_axis(
            cv, jnp.clip(d_idx, 0, D - 1)[:, None], axis=1)[:, 0]
        return jnp.where(d_idx >= D, m, got)

    def one_side(cls_, shift_bound):
        act = cls_ != 0
        cv = jnp.cumsum(act.astype(jnp.int32), axis=1) - 1
        zero = jnp.zeros_like(m)
        # leading A-gap (class 1) run, inactive steps transparent
        q0_d = _jnp_first_false(~act | (cls_ == 1), zero, D)
        q0 = colof(cv, q0_d)
        # B-gap (class 2) overhang while column < shift_bound
        s_d = _jnp_first_false(~act | ((cls_ == 2)
                                       & (cv < shift_bound)), q0_d, D)
        # match run
        eqmask = ~act | (cls_ == 4)
        e_d = _jnp_first_false(eqmask, s_d, D)
        e = colof(cv, e_d)
        credit = e - q0
        if not allow_one_off:
            return credit, credit
        # one-off: the single column after the run must exist and not
        # be an A-gap, then the match run continues
        n_d = _jnp_first_false(~act, e_d + 1, D)
        ncls = jnp.take_along_axis(
            cls_, jnp.clip(n_d, 0, D - 1)[:, None], axis=1)[:, 0]
        bonus = ((n_d < D) & (ncls != 1)).astype(jnp.int32)
        f_d = _jnp_first_false(eqmask, n_d, D)
        f = jnp.where(n_d >= D, e + 1, colof(cv, f_d))
        return credit, credit + bonus + jnp.maximum(f - (e + 1), 0)

    cls_r = jnp.flip(cls_f, axis=1)
    left, left_oo = one_side(cls_f, max_shift)
    right, right_oo = one_side(cls_r, max_shift - 1)

    # ends-free hamming: trim the max of the two leading gap runs on
    # each side, count non-match columns in between
    cv_f = jnp.cumsum(a_f.astype(jnp.int32), axis=1) - 1
    a_r = cls_r != 0
    cv_r = jnp.cumsum(a_r.astype(jnp.int32), axis=1) - 1
    zero = jnp.zeros_like(m)
    startc = jnp.maximum(
        colof(cv_f, _jnp_first_false(~a_f | (cls_f == 1), zero, D)),
        colof(cv_f, _jnp_first_false(~a_f | (cls_f == 2), zero, D)))
    rtrim = jnp.maximum(
        colof(cv_r, _jnp_first_false(~a_r | (cls_r == 1), zero, D)),
        colof(cv_r, _jnp_first_false(~a_r | (cls_r == 2), zero, D)))
    end = m - rtrim
    ham = (a_f & (cls_f != 4) & (cv_f >= startc[:, None])
           & (cv_f < end[:, None])).sum(axis=1).astype(jnp.int32)
    return jnp.stack([left, right, left_oo, right_oo, ham],
                     axis=1).astype(jnp.int32)


_lr_accum_pairs_jit = None


def _get_lr_accum_pairs_jit():
    global _lr_accum_pairs_jit
    if _lr_accum_pairs_jit is None:
        import jax
        from functools import partial

        _lr_accum_pairs_jit = partial(
            jax.jit, static_argnames=("allow_one_off",
                                      "max_shift"))(_lr_accum_pairs_trace)
    return _lr_accum_pairs_jit


_pairs_params_jit = None


def _get_pairs_params_jit():
    global _pairs_params_jit
    if _pairs_params_jit is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        def _pairs_params(pblk, scal_c, lens, *, band):
            """[CH, 8, LANES] per-lane kernel params (l2, lb, rb rows)
            built on device from the resident lengths."""
            l2 = jnp.take(lens, pblk, axis=0).astype(jnp.int32)
            len1 = scal_c[:, 0][:, None]
            lb = band + jnp.maximum(0, len1 - l2)
            rb = band + jnp.maximum(0, l2 - len1)
            z = jnp.zeros_like(l2)
            return jnp.stack([l2, lb, rb, z, z, z, z, z], axis=1)

        _pairs_params_jit = partial(
            jax.jit, static_argnames=("band",))(_pairs_params)
    return _pairs_params_jit


_pack_s1_jit = None


def _get_pack_s1_jit():
    global _pack_s1_jit
    if _pack_s1_jit is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        def _pack_s1_blocks(seqs, qblk, *, L1R):
            """[nb, L1R, LANES] per-lane query tiles (row i+1 = char i;
            the pairs-mode s1 operand)."""
            s = jnp.take(jnp.maximum(seqs.astype(jnp.int32), 0), qblk,
                         axis=0)                   # [nb, LANES, W]
            s = jnp.swapaxes(s, 1, 2)              # [nb, W, LANES]
            nb = qblk.shape[0]
            W = min(s.shape[1], L1R - 1)
            out = jnp.zeros((nb, L1R, s.shape[2]), jnp.int32)
            return out.at[:, 1: 1 + W, :].set(s[:, :W, :])

        _pack_s1_jit = partial(jax.jit,
                               static_argnames=("L1R",))(_pack_s1_blocks)
    return _pack_s1_jit


def _pairs_lr_stats(be, opts, qi, pi, maxShift, allow_one_off):
    """lr/ham stats for arbitrary pairs via ONE pairs-mode wavefront
    sweep: pairs grouped by query length (len1 is the only block-
    uniform quantity the kernel needs), 128 pairs per block, per-block
    query tiles, all blocks in one pallas call and one device accum —
    ONE fetch for the whole pair set. Returns the five stat arrays or
    None when some query length has no kernel geometry (callers fall
    back to the per-query sweep route)."""
    import jax.numpy as jnp
    from .core.backend_tpu import _fetch
    from .ops import nw_pallas as nwp

    P = len(qi)
    pb = be._pb
    lens = be.lens
    band = int(opts.BAND_SIZE)
    LANES = nwp.LANES
    l1s = lens[qi]
    order = np.argsort(l1s, kind="stable")
    qs, ps = qi[order], pi[order]
    l1o = l1s[order]
    bounds = np.nonzero(np.diff(l1o))[0] + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    ends = np.concatenate([bounds, [P]]).astype(np.int64)
    NDPg, L1Rg = pb.geometry()
    # vectorized block assembly (a python per-block loop cost minutes
    # at table scale): pair t of group g lands in block
    # base[g] + t//LANES, lane t%LANES; padding lanes repeat lane 0
    gsizes = ends - starts
    gblocks = -(-gsizes // LANES)
    gbase = np.concatenate([[0], np.cumsum(gblocks)[:-1]])
    nb = int(gblocks.sum())
    gid = np.repeat(np.arange(len(starts)), gsizes)
    t_in = np.arange(P) - starts[gid]
    blk = gbase[gid] + t_in // LANES
    lane = t_in % LANES
    pos_of_sorted = blk * LANES + lane
    qblk = np.zeros((nb, LANES), np.int32)
    pblk = np.zeros((nb, LANES), np.int32)
    filled = np.zeros((nb, LANES), bool)
    qblk[blk, lane] = qs
    pblk[blk, lane] = ps
    filled[blk, lane] = True
    padm = ~filled
    qblk[padm] = np.broadcast_to(qblk[:, :1], qblk.shape)[padm]
    pblk[padm] = np.broadcast_to(pblk[:, :1], pblk.shape)[padm]
    l2b = lens[pblk]
    len1b = l1o[np.repeat(starts, gblocks)].astype(np.int64)
    scal_h = np.stack([
        len1b, l2b.max(axis=1),
        band + np.maximum(0, l2b.max(axis=1) - len1b),
        l2b.min(axis=1)], axis=1).astype(np.int32)
    # WP from per-GROUP length extremes (superset of any block's
    # window); block_window is O(len) per call, so per-group only
    WPmax = 8
    for g, s in enumerate(starts):
        len1 = int(l1o[s])
        if be._pallas_ok(len1, opts) is None:
            return None
        gl2 = lens[ps[starts[g]: ends[g]]]
        WPmax = max(WPmax, nwp.block_window(
            len1, np.array([int(gl2.min()), int(gl2.max())]), band))
    WP = ((WPmax + 31) // 32) * 32
    if WP > 128:
        return None
    # per-group _pallas_ok checked each group's own window; the single
    # call runs every block at the GLOBAL max WP, so re-check the VMEM
    # slab at that width (long-read mixes can pass per-group but blow
    # the combined slab — fall back to the per-query route instead of
    # failing the kernel compile)
    lanes = pb.lanes * pb.halves
    fixed = 4 * (NDPg + 2 * L1Rg + 2 * pb.L2R + 8) * lanes
    if ((NDPg + 3) // 4) * WP * lanes + fixed > be.VMEM_SLAB_CAP:
        return None
    from .core.backend_tpu import _pack_s2_dev

    # fixed-size device chunks: a table-scale pair set (millions) blows
    # HBM in one call; CH blocks = CH*LANES pairs per sweep, one
    # compiled program for every chunk (the tail pads with its block 0).
    # Stats travel as u16 (all values < 2^16), and only the columns the
    # caller reads; chunk k+1 is dispatched BEFORE chunk k's fetch so
    # the device never idles on the host.
    CH = min(1024, 1 << (nb - 1).bit_length())
    ncols = 6 if allow_one_off else 4
    buf_all = np.empty((nb * LANES, ncols), np.uint16)
    dbg = os.environ.get("DADA2_TPU_DEBUG_CHIM")
    import time as _time

    def dispatch(c0):
        c1 = min(c0 + CH, nb)
        sl = slice(c0, c1)
        padn = CH - (c1 - c0)
        qc, pc, sc = qblk[sl], pblk[sl], scal_h[sl]
        if padn:
            qc = np.concatenate([qc, np.repeat(qc[:1], padn, 0)])
            pc = np.concatenate([pc, np.repeat(pc[:1], padn, 0)])
            sc = np.concatenate([sc, np.repeat(sc[:1], padn, 0)])
        d_q, d_p = be._put(qc), be._put(pc)
        d_sc = be._put(sc)
        params_d = _get_pairs_params_jit()(d_p, d_sc, be.d_lens,
                                           band=band)
        d_l2max = d_sc[:, 1]
        s2q = _pack_s2_dev(be.d_seqs, None, be.d_lens, d_p, d_l2max,
                           L2R=pb.L2R, with_quals=False)
        s1b = _get_pack_s1_jit()(be.d_seqs, d_q, L1R=L1Rg)
        cls_b, _sub_b, _mapq_b, end_b = nwp._pallas_call(
            d_sc, params_d, s1b, s2q, L1R=L1Rg, L2R=pb.L2R, NDP=NDPg,
            WP=WP, match=int(opts.MATCH), mismatch=int(opts.MISMATCH),
            gap_p=int(opts.GAP_PENALTY), end_gap_p=0,
            interpret=be._interpret, emit_kinds="cls",
            halves=pb.halves, s1_per_block=True)
        cls_rows = jnp.swapaxes(cls_b, 1, 2).reshape(-1, NDPg)
        end_rows = jnp.swapaxes(end_b, 1, 2).reshape(-1, 8)
        stats_d = _get_lr_accum_pairs_jit()(
            cls_rows, allow_one_off=allow_one_off, max_shift=maxShift)
        okc = (end_rows[:, 0] | end_rows[:, 1]).astype(jnp.uint16)
        if allow_one_off:
            cols = [stats_d[:, 0], stats_d[:, 1], stats_d[:, 2],
                    stats_d[:, 3], stats_d[:, 4], okc]
        else:
            # left_oo/right_oo degenerate to left/right without one-off
            cols = [stats_d[:, 0], stats_d[:, 1], stats_d[:, 4], okc]
        return c1, jnp.stack([c.astype(jnp.uint16) for c in cols],
                             axis=1)

    pending = None
    for c0 in range(0, nb, CH):
        nxt = dispatch(c0)
        if pending is not None:
            p0, (p1, d) = pending
            t0 = _time.time()
            buf_all[p0 * LANES: p1 * LANES] = _fetch(d)[
                : (p1 - p0) * LANES]
            if dbg:
                import sys as _sys
                print(f"[chim] chunk@{p0}: sync "
                      f"{_time.time() - t0:.3f}s", file=_sys.stderr,
                      flush=True)
        pending = (c0, nxt)
    p0, (p1, d) = pending
    buf_all[p0 * LANES: p1 * LANES] = _fetch(d)[: (p1 - p0) * LANES]
    ok_col = ncols - 1
    if buf_all[pos_of_sorted, ok_col].any():
        raise RuntimeError("N-W Align out of range.")
    st = buf_all[pos_of_sorted].astype(np.int64)
    stats = np.empty((P, ncols), np.int64)
    stats[order] = st
    if allow_one_off:
        return (stats[:, 0], stats[:, 1], stats[:, 2], stats[:, 3],
                stats[:, 4])
    # without one-off the oo credits degenerate to the plain credits
    # (one_side returns (credit, credit))
    return (stats[:, 0], stats[:, 1], stats[:, 0], stats[:, 1],
            stats[:, 2])


_lr_accum_jit = None


def _get_lr_accum_jit():
    global _lr_accum_jit
    if _lr_accum_jit is None:
        import jax
        from functools import partial

        _lr_accum_jit = partial(
            jax.jit, static_argnames=("CNT", "mL", "allow_one_off",
                                      "max_shift"),
            donate_argnums=(0,))(_lr_accum_trace)
    return _lr_accum_jit


def _chimera_backend(seqs, match, mismatch, gap_p, maxShift):
    """A quals-free TpuBackend over the sequence set, or None when the
    wavefront-kernel route is off (CPU default / geometry misfit) —
    callers then use the XLA nw_batch route."""
    import numpy as np

    from .core.backend_tpu import TpuBackend
    from .core.raws import make_rawset
    from .options import DEFAULT_OPTIONS

    opts = DEFAULT_OPTIONS.replace(
        MATCH=match, MISMATCH=mismatch, GAP_PENALTY=gap_p,
        BAND_SIZE=maxShift)
    rs = make_rawset(seqs, np.ones(len(seqs), np.int64), None, None)
    be = TpuBackend(rs, use_quals=False)
    if not be.use_pallas:
        return None, None
    return be, opts


def _batch_lr_stats_pallas(be, opts, pairs, maxShift, allow_one_off):
    """lr/ham statistics through the Pallas wavefront kernel: ONE
    kernel sweep per distinct query (reference: the per-column parent
    alignments of src/chimera.cpp:120-146), stats computed on device
    from the merged map rows, one final fetch. Returns the same five
    arrays as the nw_batch route, in input pair order, or None if some
    query has no kernel geometry."""
    import jax.numpy as jnp

    P = len(pairs)
    qi = np.fromiter((p[0] for p in pairs), np.int64, P)
    pi = np.fromiter((p[1] for p in pairs), np.int64, P)
    # pairs-mode sweep: every pair its own kernel lane, one call + one
    # fetch for the whole set (the per-query fallback below sweeps ALL
    # n rows per distinct query — n/len(parents) times more chip work)
    out = _pairs_lr_stats(be, opts, qi, pi, maxShift, allow_one_off)
    if out is not None:
        return out
    order = np.argsort(qi, kind="stable")
    qs, ps = qi[order], pi[order]
    # group boundaries per query
    bounds = np.nonzero(np.diff(qs))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [P]])
    cmax = int((ends - starts).max())
    # slack must cover the largest padded group: dynamic_slice CLAMPS
    # out-of-range starts instead of erroring, which would silently
    # read/write the wrong rows for tail groups
    CNT_CAP = max(16, 1 << (cmax - 1).bit_length())
    for q in qs[starts]:
        if be._pallas_ok(int(be.lens[q]), opts) is None:
            return None
    pid_pad = np.concatenate([ps, np.zeros(CNT_CAP, np.int64)])
    d_pi = be._put(pid_pad.astype(np.int32))
    # m = len1 + insertions; a banded path inserts at most band +
    # length-difference members, so this bound is exact-safe
    spread = int(be.lens.max() - be.lens.min())
    mL = min(2 * be.maxlen, be.maxlen + maxShift + spread + 2)
    mL = ((mL + 127) // 128) * 128
    buf = jnp.zeros((len(pid_pad), 5), jnp.int32)
    fn = _get_lr_accum_jit()
    for s, e in zip(starts, ends):
        q = int(qs[s])
        cnt = int(e - s)
        # pow2 buckets: each distinct CNT is a compiled program, but
        # the padding is real accum compute — 2x steps waste at most
        # half, and group sizes cluster so few programs materialize
        CNT = min(CNT_CAP, max(16, 1 << (cnt - 1).bit_length()))
        geom = be._pallas_ok(int(be.lens[q]), opts)
        ent = be._align_ent(q, opts, geom)
        buf = fn(buf, ent[0], be.d_seqs, be.d_lens,
                 be._center_dev(q), d_pi, s, CNT=CNT, mL=mL,
                 allow_one_off=allow_one_off, max_shift=maxShift)
    stats_sorted = np.asarray(buf)[:P]
    stats = np.empty_like(stats_sorted)
    stats[order] = stats_sorted
    return tuple(stats[:, k].astype(np.int64) for k in range(5))


_CHUNK_PAIRS_UNBANDED = 4096  # full-width scalar DP: smaller chunks


def _batch_eval_stats(pairs, seqs, match, mismatch, gap_p):
    """eval_pair statistics for arbitrary (query, parent) index pairs:
    device-aligned (unbanded ends-free scalar NW, the R nwalign
    band=-1 configuration) and device-evaluated in chunks; each chunk
    fetches [P, 3] ints. Returns (match, mismatch, indel) int64."""
    from .ops.nw_batch import nw_batch

    P = len(pairs)
    outs = [np.zeros(P, np.int64) for _ in range(3)]
    if P == 0:
        return tuple(outs)
    mat, lens = pack_sequences(seqs)
    fn = _get_eval_stats_jit()
    for lo in range(0, P, _CHUNK_PAIRS_UNBANDED):
        chunk = pairs[lo: lo + _CHUNK_PAIRS_UNBANDED]
        nb = 1 << (len(chunk) - 1).bit_length()
        qi = np.fromiter((p[0] for p in chunk), np.int64, len(chunk))
        pi = np.fromiter((p[1] for p in chunk), np.int64, len(chunk))
        qi = np.concatenate([qi, np.full(nb - len(chunk), qi[0])])
        pi = np.concatenate([pi, np.full(nb - len(chunk), pi[0])])
        kinds, p0, p1, _, _, ok = nw_batch(
            mat[qi], lens[qi], mat[pi], lens[pi], match=match,
            mismatch=mismatch, gap_p=gap_p, end_gap_p=0, band=-1,
            mode="scalar")
        if not np.asarray(ok).all():
            raise RuntimeError("N-W Align out of range.")
        stats = np.asarray(fn(kinds, p0, p1, mat[qi],
                              mat[pi]))[: len(chunk)]
        for k, o in enumerate(outs):
            o[lo: lo + len(chunk)] = stats[:, k]
    return tuple(outs)


def _vote_from_stats(left, right, left_oo, right_oo, ham, sqlen: int,
                     allowOneOff: bool,
                     minOneOffParentDistance: int) -> bool:
    """Bimera decision from a query's parent lr stats
    (reference: C_is_bimera body, src/chimera.cpp:18-58; the running
    maxima with early return are order-free, so plain maxima)."""
    keep = left + right < sqlen   # toss id/shift/internal-indel parents
    if not keep.any():
        return False
    if left[keep].max() + right[keep].max() >= sqlen:
        return True
    if allowOneOff:
        ok = keep & (ham >= minOneOffParentDistance)
        if ok.any() and (
                left[ok].max() + right_oo[ok].max() >= sqlen
                or left_oo[ok].max() + right[ok].max() >= sqlen):
            return True
    return False


def is_bimera(sq: str, parents: List[str], allowOneOff: bool = False,
              minOneOffParentDistance: int = 4, maxShift: int = 16,
              **opt_overrides) -> bool:
    """True if sq is consistent with being a two-parent chimera.

    reference: C_is_bimera (src/chimera.cpp:18-58), isBimera
    (R/chimeras.R:43-47)."""
    opts = current_options().replace(**opt_overrides)
    seqs = [sq] + list(parents)
    pairs = [(0, 1 + k) for k in range(len(parents))]
    left, right, left_oo, right_oo, ham = _batch_lr_stats(
        pairs, seqs, maxShift, opts.MATCH, opts.MISMATCH,
        opts.GAP_PENALTY, allowOneOff)
    return _vote_from_stats(left, right, left_oo, right_oo, ham,
                            len(sq), allowOneOff,
                            minOneOffParentDistance)


def is_bimera_denovo(unqs, minFoldParentOverAbundance: float = 2,
                     minParentAbundance: int = 8, allowOneOff: bool = False,
                     minOneOffParentDistance: int = 4, maxShift: int = 16,
                     multithread=False, verbose: bool = False) -> pd.Series:
    """Flag bimeras among pooled unique sequences.

    reference: isBimeraDenovo (R/chimeras.R:105-154)."""
    from .seqtab import get_sequences, get_uniques

    from .options import current_options

    opts = current_options()
    unqs_int = get_uniques(unqs)
    seqs = list(unqs_int.keys())
    abunds = np.array(list(unqs_int.values()))
    # all (query, parent) alignments in one chunked device batch
    par_slices = []
    all_pairs = []
    for i, abund in enumerate(abunds):
        sel = (abunds > minFoldParentOverAbundance * abund) & \
            (abunds > minParentAbundance)
        idx = np.nonzero(sel)[0]
        if len(idx) < 2:
            idx = idx[:0]
        lo = len(all_pairs)
        all_pairs.extend((i, int(k)) for k in idx)
        par_slices.append(slice(lo, len(all_pairs)))
    left, right, left_oo, right_oo, ham = _batch_lr_stats(
        all_pairs, seqs, maxShift, opts.MATCH, opts.MISMATCH,
        opts.GAP_PENALTY, allowOneOff)
    bims = np.zeros(len(seqs), dtype=bool)
    for i, sl in enumerate(par_slices):
        if sl.stop == sl.start:
            continue
        bims[i] = _vote_from_stats(
            left[sl], right[sl], left_oo[sl], right_oo[sl], ham[sl],
            len(seqs[i]), allowOneOff, minOneOffParentDistance)
    flagged = {s for s, b in zip(seqs, bims) if b}
    seqs_input = get_sequences(unqs)
    out = pd.Series([s in flagged for s in seqs_input], index=seqs_input)
    if verbose:
        print(f"Identified {int(out.sum())} bimeras out of {len(out)} "
              f"input sequences.")
    return out


def is_bimera_denovo_table(seqtab: pd.DataFrame,
                           minSampleFraction: float = 0.9,
                           ignoreNNegatives: int = 1,
                           minFoldParentOverAbundance: float = 1.5,
                           minParentAbundance: int = 2,
                           allowOneOff: bool = False,
                           minOneOffParentDistance: int = 4,
                           maxShift: int = 16, multithread=False,
                           verbose: bool = False, **opt_overrides
                           ) -> pd.Series:
    """Consensus bimera detection across samples.

    reference: isBimeraDenovoTable (R/chimeras.R:220-248) and
    C_table_bimera2 (src/chimera.cpp:60-192)."""
    opts = current_options().replace(**opt_overrides)
    sqs = list(seqtab.columns)
    if len(set(sqs)) != len(sqs):
        raise ValueError("Duplicate sequences detected in input.")
    mat = seqtab.values.astype(np.int64)
    nflag, nsam = _table_bimera_stats(
        mat, sqs, minFoldParentOverAbundance, minParentAbundance,
        allowOneOff, minOneOffParentDistance, maxShift, opts)

    is_bim = (nflag >= nsam) | ((nflag > 0) &
                                (nflag >= (nsam - ignoreNNegatives) *
                                 minSampleFraction))
    out = pd.Series(is_bim, index=sqs)
    if verbose:
        print(f"Identified {int(out.sum())} bimeras out of {len(out)} "
              f"input sequences.")
    return out


def _table_bimera_stats(mat: np.ndarray, sqs: List[str],
                        minFoldParentOverAbundance: float,
                        minParentAbundance: int, allowOneOff: bool,
                        minOneOffParentDistance: int, maxShift: int,
                        opts) -> tuple:
    """(nflag, nsam) per sequence column: in how many samples the
    sequence is present, and in how many it is flagged as a bimera of
    sample-local parents (reference: C_table_bimera2,
    src/chimera.cpp:60-192)."""
    nsam_tot, ncol = mat.shape
    nflag = np.zeros(ncol, dtype=np.int64)
    nsam = np.zeros(ncol, dtype=np.int64)
    ge_abund = mat >= minParentAbundance

    # Union parent matrix U[j, k] = some sample has j present and k
    # qualifying as j's parent there (reference lazily aligns each
    # per-column parent once — the same union, src/chimera.cpp:120-146).
    # Accumulated per SAMPLE in column chunks: the old per-column
    # [nsam, ncol] mask was built TWICE per column — O(ncol^2 * nsam)
    # numpy twice over; this is the same work done once, cache-friendly.
    U = np.zeros((ncol, ncol), dtype=bool)
    CHUNK_J = max(1, (64 << 20) // (8 * ncol))
    for s in range(nsam_tot):
        row = mat[s]
        parentable = np.nonzero(ge_abund[s] & (row > 0))[0]
        if not len(parentable):
            continue
        pv = row[parentable].astype(np.float64)
        for j0 in range(0, ncol, CHUNK_J):
            j1 = min(j0 + CHUNK_J, ncol)
            thr = minFoldParentOverAbundance * row[j0:j1, None]
            cond = pv[None, :] > thr          # [jchunk, |parentable|]
            cond[row[j0:j1] == 0, :] = False
            U[j0:j1, parentable] |= cond
    np.fill_diagonal(U, False)

    # all (query, union-parent) alignments across all columns, batched
    # in chunks
    unions = []
    all_pairs = []
    offsets = []
    for j in range(ncol):
        offsets.append(len(all_pairs))
        if not (mat[:, j] > 0).any():
            unions.append(np.zeros(0, np.int64))
            continue
        union = np.nonzero(U[j])[0]
        unions.append(union)
        all_pairs.extend((j, int(k)) for k in union)
    l_all, r_all, lo_all, ro_all, ham_all = _batch_lr_stats(
        all_pairs, sqs, maxShift, opts.MATCH, opts.MISMATCH,
        opts.GAP_PENALTY, allowOneOff)

    for j in range(ncol):
        present = np.nonzero(mat[:, j] > 0)[0]
        nsam[j] = len(present)
        if nsam[j] == 0:
            continue
        union = unions[j]
        if not len(union):
            continue
        sqlen = len(sqs[j])
        sl = slice(offsets[j], offsets[j] + len(union))
        keep = l_all[sl] + r_all[sl] < sqlen  # toss id/shift parents
        lefts = np.where(keep, l_all[sl], 0)
        rights = np.where(keep, r_all[sl], 0)
        # per-sample parent mask restricted to the union columns (tiny:
        # [ns, |union|] instead of the old [ns, ncol])
        mu = mat[np.ix_(present, union)]
        pm = ((mu > minFoldParentOverAbundance
               * mat[present, j][:, None])
              & ge_abund[np.ix_(present, union)])
        max_left = np.where(pm, lefts[None, :], 0).max(axis=1)
        max_right = np.where(pm, rights[None, :], 0).max(axis=1)
        flag = max_left + max_right >= sqlen
        if allowOneOff:
            lefts_oo = np.where(keep, lo_all[sl], 0)
            rights_oo = np.where(keep, ro_all[sl], 0)
            allowed = ham_all[sl] >= minOneOffParentDistance
            pa = pm & allowed[None, :]
            oo_l = np.where(pa, lefts[None, :], 0).max(axis=1)
            oo_r = np.where(pa, rights[None, :], 0).max(axis=1)
            oo_lo = np.where(pa, lefts_oo[None, :], 0).max(axis=1)
            oo_ro = np.where(pa, rights_oo[None, :], 0).max(axis=1)
            flag |= (oo_l + oo_ro >= sqlen) | (oo_lo + oo_r >= sqlen)
        nflag[j] = int(flag.sum())
    return nflag, nsam


def remove_bimera_denovo(unqs, method: str = "consensus",
                         verbose: bool = False, **kwargs):
    """Remove chimeric sequences (reference: removeBimeraDenovo,
    R/chimeras.R:294-346)."""
    from .dada import DadaResult
    from .derep import Derep

    if isinstance(unqs, pd.DataFrame) and "sequence" not in unqs.columns:
        # sequence table: samples x sequences
        if method == "pooled":
            from .seqtab import get_uniques
            pooled = {s: int(a) for s, a in
                      zip(unqs.columns, unqs.values.sum(axis=0))}
            bim = is_bimera_denovo(pooled, verbose=verbose, **kwargs)
        elif method == "consensus":
            bim = is_bimera_denovo_table(unqs, verbose=verbose, **kwargs)
        elif method == "per-sample":
            out = unqs.copy()
            for i in range(out.shape[0]):
                row = {s: int(a) for s, a in
                       zip(out.columns, out.iloc[i]) if a > 0}
                if not row:
                    continue
                bim_i = is_bimera_denovo(row, verbose=verbose, **kwargs)
                for s, b in bim_i.items():
                    if b:
                        out.iloc[i, out.columns.get_loc(s)] = 0
            keep = out.values.sum(axis=0) > 0
            return out.loc[:, keep]
        else:
            raise ValueError("Valid values for method: 'pooled', "
                             "'consensus', or 'per-sample'")
        return unqs.loc[:, ~bim.values]
    if isinstance(unqs, DadaResult):
        bim = is_bimera_denovo(unqs, verbose=verbose, **kwargs)
        return {s: a for (s, a), b in zip(unqs.denoised.items(), bim)
                if not b}
    if isinstance(unqs, Derep):
        bim = is_bimera_denovo(unqs, verbose=verbose, **kwargs)
        return {s: a for (s, a), b in zip(unqs.uniques.items(), bim)
                if not b}
    if isinstance(unqs, pd.DataFrame):  # clustering df
        bim = is_bimera_denovo(unqs, verbose=verbose, **kwargs)
        return unqs.loc[~bim.values]
    if isinstance(unqs, dict):
        bim = is_bimera_denovo(unqs, verbose=verbose, **kwargs)
        return {s: a for (s, a), b in zip(unqs.items(), bim) if not b}
    raise TypeError("Unrecognized format: requires uniques dict, "
                    "DadaResult, Derep, clustering DataFrame or sequence "
                    "table.")


def is_shift_denovo(unqs, minOverlap: int = 20, flagSubseqs: bool = False,
                    verbose: bool = False) -> pd.Series:
    """Flag sequences identical to a more abundant sequence up to a shift.

    reference: isShiftDenovo (R/chimeras.R:380-421). The reference runs
    a scalar nwalign + C_eval_pair per (sequence, parent) pair; here
    every pair rides one chunked device batch (_batch_eval_stats) — the
    per-pair scalar walk remains the test oracle
    (tests/test_chimeras.py)."""
    from .options import current_options
    from .seqtab import get_sequences, get_uniques

    opts = current_options()
    unqs_int = get_uniques(unqs)
    seqs = list(unqs_int.keys())
    abunds = np.array(list(unqs_int.values()))
    n = len(seqs)
    slen = np.array([len(s) for s in seqs], np.int64)

    all_pairs = []
    for i in range(n):
        pars = np.nonzero(abunds > abunds[i])[0]
        if not len(pars):
            if verbose:
                print("No possible parents.")
            continue
        all_pairs.extend((i, int(k)) for k in pars)
    match, mism, ind = _batch_eval_stats(all_pairs, seqs, opts.MATCH,
                                         opts.MISMATCH, opts.GAP_PENALTY)
    shifts = np.zeros(n, dtype=bool)
    if all_pairs:
        qi = np.fromiter((p[0] for p in all_pairs), np.int64,
                         len(all_pairs))
        pi = np.fromiter((p[1] for p in all_pairs), np.int64,
                         len(all_pairs))
        ok = (((match < slen[qi]) | flagSubseqs)
              & ((match < slen[pi]) | flagSubseqs)
              & (match >= minOverlap) & (mism == 0) & (ind == 0))
        shifts[qi[ok]] = True
    flagged = {s for s, b in zip(seqs, shifts) if b}
    seqs_input = get_sequences(unqs)
    return pd.Series([s in flagged for s in seqs_input], index=seqs_input)
