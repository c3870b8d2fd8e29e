"""Batched banded ends-free Needleman-Wunsch on TPU (JAX/XLA).

TPU-native reimplementation of the reference's hot alignment kernel
(reference: src/nwalign_vectorized.cpp:71-318, nwalign_vectorized2). Instead
of one anti-diagonal int16 DP per call on a CPU core, a whole batch of pairs
is swept in lockstep: a `lax.scan` walks the anti-diagonals, carrying the two
previous band-window diagonals per pair, and `vmap` batches pairs so every
step is a dense [n, W] vector op on the VPU. Pointers stream to HBM; a second
batched scan performs the traceback and emits, per pair, the per-position
transition vector and substitution count that the lambda computation needs.

Semantics are exactly those of the oracle (ops/nw_ref.py, mode="vec"),
including tie precedence (up >= left > diag), per-pair band widening on the
long side by the length difference, and the ends-free last-row/last-col
recalculation that activates one anti-diagonal late (reference:
src/nwalign_vectorized.cpp:186-215).

Geometry: cell (i, j), i indexes s1 (0..len1), j indexes s2. Anti-diagonal
d = i + j. In-band: i - j <= lband and j - i <= rband where
lband = band + max(0, len1 - len2), rband = band + max(0, len2 - len1)
(band < 0 disables banding). On diagonal d the in-band rows are
lo(d) = max(0, d - len2, ceil((d - rband)/2)) .. hi(d) = min(len1, d,
floor((d + lband)/2)); each diagonal is stored as a window of W rows
starting at lo(d).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2**29)
PTR_NONE, PTR_DIAG, PTR_LEFT, PTR_UP = 0, 1, 2, 3


def batch_geometry(len1: np.ndarray, len2: np.ndarray, band: int):
    """Static (max_diags, W) for a batch of pairs; host-side, exact."""
    len1 = np.asarray(len1, dtype=np.int64)
    len2 = np.asarray(len2, dtype=np.int64)
    if band < 0:
        lband, rband = len1, len2
    else:
        lband = band + np.maximum(0, len1 - len2)
        rband = band + np.maximum(0, len2 - len1)
    # max window width: floor((d+lband)/2) - ceil((d-rband)/2) + 1 maximized
    # over d, also bounded by the rectangle
    w = (lband + rband) // 2 + 2
    w = np.minimum(w, np.minimum(len1, len2) + 1)
    nd = int((len1 + len2).max()) + 1
    return nd, int(w.max())


def _lo(d, len2, rband):
    return jnp.maximum(0, jnp.maximum(d - len2, (d - rband + 1) // 2))


def _hi(d, len1, lband):
    return jnp.minimum(jnp.minimum(len1, d), (d + lband) // 2)


def _fill_kernel(s1, len1, s2, len2, lband, rband, nd, W,
                 match, mismatch, gap_p, end_gap_p, mode="vec",
                 homo1=None, homo2=None, homo_gap_p=0, banded=False):
    """DP fill for one pair; returns ptr [nd, W] int8. vmapped over pairs.

    mode="vec": the hot-path aligner semantics (reference:
    src/nwalign_vectorized.cpp) — tie precedence up >= left > diag,
    ends-free last-row/col recalculation one diagonal late.
    mode="scalar": the classic aligner used by nwalign/mergePairs and
    the non-vectorized engine configs (reference:
    src/nwalign_endsfree.cpp:76-216 when end_gap_p != gap_p, :403-537
    when equal) — free gaps along the last row/col, tie precedence
    up >= diag and up >= left, then left >= diag. With banded=True the
    out-of-band boundary reads the reference's magic -9999 fill
    (src/nwalign_endsfree.cpp:113-119). homo1/homo2 ([L] bool masks of
    positions inside homopolymer runs >= 3) switch gap_p to homo_gap_p
    per position, the 454/PacBio variant
    (src/nwalign_endsfree.cpp:220-396).
    """
    endsfree = end_gap_p > gap_p
    scalar_endsfree = end_gap_p != gap_p
    use_homo = homo1 is not None
    # the one-diagonal-late recalc skip applies only when the band clips
    # that side (reference: src/nwalign_vectorized.cpp:186-215)
    j_first = jnp.where(lband < len1, len1 - lband, 0)
    i_first = jnp.where(rband < len2, len2 - rband, 0)
    r = jnp.arange(W, dtype=jnp.int32)

    # scalar banded mode: adjacent out-of-band neighbors read -9999, the
    # reference's band-boundary fill value
    OOB = -9999 if (mode == "scalar" and banded) else NEG
    prev1 = jnp.full(W, OOB, jnp.int32).at[0].set(0)  # diag 0: cell (0,0)
    prev2 = jnp.full(W, OOB, jnp.int32)

    def step(carry, d):
        prev1, prev2, lo1, lo2 = carry
        lod = _lo(d, len2, rband)
        hid = _hi(d, len1, lband)
        i = lod + r
        j = d - i
        valid = r <= (hid - lod)

        p1pad = jnp.concatenate([jnp.full(2, OOB, jnp.int32), prev1,
                                 jnp.full(2, OOB, jnp.int32)])
        p2pad = jnp.concatenate([jnp.full(2, OOB, jnp.int32), prev2,
                                 jnp.full(2, OOB, jnp.int32)])
        Uraw = jax.lax.dynamic_slice(p1pad, (lod - lo1 - 1 + 2,), (W,))
        Lraw = jax.lax.dynamic_slice(p1pad, (lod - lo1 + 2,), (W,))
        Dp = jax.lax.dynamic_slice(p2pad, (lod - lo2 - 1 + 2,), (W,))
        c1 = s1[jnp.clip(i - 1, 0, s1.shape[0] - 1)]
        c2 = s2[jnp.clip(j - 1, 0, s2.shape[0] - 1)]
        D = Dp + jnp.where(c1 == c2, match, mismatch)

        if mode == "scalar":
            # free end gaps along last row/col; precedence up >= diag and
            # up >= left, then left >= diag
            # (reference: src/nwalign_endsfree.cpp:120-156)
            if use_homo:
                h1 = homo1[jnp.clip(i - 1, 0, homo1.shape[0] - 1)]
                h2 = homo2[jnp.clip(j - 1, 0, homo2.shape[0] - 1)]
                ugap_in = jnp.where(h1, homo_gap_p, gap_p)
                lgap_in = jnp.where(h2, homo_gap_p, gap_p)
            else:
                ugap_in = lgap_in = gap_p
            Ugap = jnp.where(scalar_endsfree & (j == len2), 0, ugap_in)
            Lgap = jnp.where(scalar_endsfree & (i == len1), 0, lgap_in)
            U = Uraw + Ugap
            L = Lraw + Lgap
            upw = (U >= D) & (U >= L)
            leftw = ~upw & (L >= D)
            entry = jnp.where(upw, U, jnp.where(leftw, L, D))
            ptr = jnp.where(upw, PTR_UP,
                            jnp.where(leftw, PTR_LEFT,
                                      PTR_DIAG)).astype(jnp.int32)
            bval = 0 if scalar_endsfree else gap_p
            entry = jnp.where(j == 0, i * bval, entry)
            ptr = jnp.where(j == 0, PTR_UP, ptr)
            entry = jnp.where(i == 0, j * bval, entry)
            ptr = jnp.where(i == 0, PTR_LEFT, ptr)
            entry = jnp.where(valid, entry, OOB)
            ptr = jnp.where(valid, ptr, PTR_NONE)
            return (entry, prev1, lod, lo1), ptr.astype(jnp.int8)

        U = Uraw + gap_p
        L = Lraw + gap_p

        # tie precedence: U >= L, diag only on strict improvement
        # (reference: src/nwalign_vectorized.cpp:8-32)
        entry = jnp.where(U >= L, U, L)
        ptr = jnp.where(U >= L, PTR_UP, PTR_LEFT).astype(jnp.int32)
        dwin = D > entry
        entry = jnp.where(dwin, D, entry)
        ptr = jnp.where(dwin, PTR_DIAG, ptr)

        # boundary rows/cols (reference: src/nwalign_vectorized.cpp:116-140)
        entry = jnp.where(j == 0, i * end_gap_p, entry)
        ptr = jnp.where(j == 0, PTR_UP, ptr)
        entry = jnp.where(i == 0, j * end_gap_p, entry)
        ptr = jnp.where(i == 0, PTR_LEFT, ptr)

        if endsfree:
            # last-row free left-gap (activates one diagonal late)
            lastrow = (i == len1) & (j > j_first) & (j > 0) & (i > 0)
            candr = p1pad[len1 - lo1 + 2] + end_gap_p
            rgt = lastrow & (candr > entry)
            rtie = lastrow & (candr == entry) & (ptr == PTR_DIAG)
            entry = jnp.where(rgt, candr, entry)
            ptr = jnp.where(rgt | rtie, PTR_LEFT, ptr)
            # last-col free up-gap, applied after the row rule
            lastcol = (j == len2) & (i > i_first) & (i > 0) & (j > 0)
            candc = U - gap_p + end_gap_p
            cgt = lastcol & (candc > entry)
            ctie = lastcol & (candc == entry) & (ptr != PTR_UP)
            entry = jnp.where(cgt, candc, entry)
            ptr = jnp.where(cgt | ctie, PTR_UP, ptr)

        entry = jnp.where(valid, entry, NEG)
        ptr = jnp.where(valid, ptr, PTR_NONE)
        return (entry, prev1, lod, lo1), ptr.astype(jnp.int8)

    ds = jnp.arange(1, nd, dtype=jnp.int32)
    (last, _, _, _), ptrs = jax.lax.scan(
        step, (prev1, prev2, jnp.int32(0), jnp.int32(0)), ds)
    ptr0 = jnp.zeros((1, W), jnp.int8)
    return jnp.concatenate([ptr0, ptrs], axis=0)


def _traceback_kernel(ptrs, s1, len1, s2, len2, rband, nsteps, W):
    """Walk pointers from (len1, len2); emit per-step (kind, p0, p1).

    Steps are in reverse alignment order; kind 0 = finished. vmapped.
    """
    flat = ptrs.reshape(-1)

    def step(carry, _):
        i, j = carry
        done = (i == 0) & (j == 0)
        d = i + j
        rr = i - _lo(d, len2, rband)
        ptr = flat[d * W + rr].astype(jnp.int32)
        ptr = jnp.where(done, PTR_NONE, ptr)
        takes1 = (ptr == PTR_DIAG) | (ptr == PTR_UP)
        takes2 = (ptr == PTR_DIAG) | (ptr == PTR_LEFT)
        ni = i - takes1.astype(jnp.int32)
        nj = j - takes2.astype(jnp.int32)
        return (ni, nj), (ptr.astype(jnp.int8), ni.astype(jnp.int32),
                          nj.astype(jnp.int32))

    (fi, fj), (kinds, p0, p1) = jax.lax.scan(
        step, (len1, len2), None, length=nsteps)
    # fi == fj == 0 iff traceback completed (checked host-side)
    return kinds, p0, p1, fi, fj


@partial(jax.jit, static_argnames=("nd", "W", "match", "mismatch", "gap_p",
                                   "end_gap_p", "band", "mode",
                                   "homo_gap_p"))
def _nw_batch_jit(s1b, len1b, s2b, len2b, homo1b=None, homo2b=None, *,
                  nd, W, match, mismatch, gap_p, end_gap_p, band,
                  mode="vec", homo_gap_p=0):
    len1b = len1b.astype(jnp.int32)
    len2b = len2b.astype(jnp.int32)
    if band < 0:
        lband, rband = len1b, len2b
    else:
        lband = band + jnp.maximum(0, len1b - len2b)
        rband = band + jnp.maximum(0, len2b - len1b)
    banded = band >= 0

    if homo1b is not None:
        fill = jax.vmap(
            lambda a, la, b, lb, lbd, rbd, h1, h2: _fill_kernel(
                a, la, b, lb, lbd, rbd, nd, W, match, mismatch, gap_p,
                end_gap_p, mode, h1, h2, homo_gap_p, banded))
        ptrs = fill(s1b, len1b, s2b, len2b, lband, rband, homo1b, homo2b)
    else:
        fill = jax.vmap(
            lambda a, la, b, lb, lbd, rbd: _fill_kernel(
                a, la, b, lb, lbd, rbd, nd, W, match, mismatch, gap_p,
                end_gap_p, mode, None, None, homo_gap_p, banded))
        ptrs = fill(s1b, len1b, s2b, len2b, lband, rband)

    nsteps = s1b.shape[1] + s2b.shape[1]
    tb = jax.vmap(
        lambda p, a, la, b, lb, rbd: _traceback_kernel(
            p, a, la, b, lb, rbd, nsteps, W))
    kinds, p0, p1, fi, fj = tb(ptrs, s1b, len1b, s2b, len2b, rband)

    # Derived per-pair outputs: hamming count and the transition vector
    # (lambda inputs; reference: src/pval.cpp:144-197 uses the Sub to patch
    # self-transitions at substitution positions — identical to tvec below).
    def derive(kinds, p0, p1, a, b, lb):
        diag = kinds == PTR_DIAG
        nt0 = a[jnp.clip(p0, 0, a.shape[0] - 1)].astype(jnp.int32)
        nt1 = b[jnp.clip(p1, 0, b.shape[0] - 1)].astype(jnp.int32)
        ham = jnp.sum((diag & (nt0 != nt1)).astype(jnp.int32))
        bl = b.astype(jnp.int32)
        tvec = jnp.where(jnp.arange(b.shape[0]) < lb, 5 * bl, 16)
        idx = jnp.where(diag, p1, b.shape[0])  # dropped when out of range
        tvec = tvec.at[idx].set(jnp.where(diag, 4 * nt0 + nt1, 0),
                                mode="drop")
        return ham, tvec.astype(jnp.int8)

    ham, tvec = jax.vmap(derive)(kinds, p0, p1, s1b, s2b, len2b)
    ok = (fi == 0) & (fj == 0)
    return kinds, p0, p1, ham, tvec, ok


def homo_mask_batch(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """[n, L] bool: positions inside a homopolymer run of length >= 3,
    batched (reference: src/nwalign_endsfree.cpp:227-255)."""
    codes = np.asarray(codes)
    n, L = codes.shape
    if L < 3:
        return np.zeros((n, L), bool)
    pos = np.arange(L)[None, :]
    real = pos < np.asarray(lens)[:, None]
    eq = np.zeros((n, L), bool)
    eq[:, 1:] = (codes[:, 1:] == codes[:, :-1]) & real[:, 1:]
    # position is in a run >= 3 iff some window of 2 consecutive eq-links
    # covers it: eq[i] & eq[i+1] marks i-1..i+1
    tri = np.zeros((n, L), bool)
    tri[:, 1:] = eq[:, 1:] & np.roll(eq, -1, axis=1)[:, 1:]
    out = tri | np.roll(tri, 1, axis=1) | np.roll(tri, -1, axis=1)
    out[:, 0] = tri[:, 0] | (tri[:, 1] if L > 1 else False)
    return out & real


def nw_batch(s1b, len1b, s2b, len2b, *, match, mismatch, gap_p,
             end_gap_p=0, band=-1, mode="vec", homo_gap_p=None,
             homo1b=None, homo2b=None):
    """Align pairs (s1b[k], s2b[k]) with the vectorized-NW semantics.

    s1b: [n, L1] uint8/int codes; len1b: [n]; likewise s2b/len2b.
    Returns device arrays (kinds, p0, p1, ham, tvec, ok):
      kinds [n, L1+L2] int8 — traceback step types, reverse alignment order
        (1=diag, 2=gap in s1, 3=gap in s2, 0=finished);
      p0/p1 [n, L1+L2] int32 — 0-based positions consumed at each step;
      ham [n] int32 — substitution counts;
      tvec [n, L2] int8 — 16-way transition index per s2 position (self
        transitions except at substitutions; 16 = padding);
      ok [n] bool — traceback reached the origin (always true in-band).

    mode="scalar" uses the classic aligner's recurrences (banded or not);
    homo_gap_p (with mode="scalar", ends-free) enables the homopolymer
    gap variant — homo1b/homo2b masks are computed here if not given.
    """
    nd, W = batch_geometry(np.asarray(len1b), np.asarray(len2b), band)
    use_homo = (mode == "scalar" and homo_gap_p is not None
                and homo_gap_p != gap_p and end_gap_p != gap_p)
    h1 = h2 = None
    if use_homo:
        if homo1b is None:
            homo1b = homo_mask_batch(s1b, len1b)
        if homo2b is None:
            homo2b = homo_mask_batch(s2b, len2b)
        h1 = jnp.asarray(homo1b, bool)
        h2 = jnp.asarray(homo2b, bool)
    return _nw_batch_jit(
        jnp.asarray(s1b, jnp.int8), jnp.asarray(len1b, jnp.int32),
        jnp.asarray(s2b, jnp.int8), jnp.asarray(len2b, jnp.int32),
        h1, h2,
        nd=nd, W=W, match=int(match), mismatch=int(mismatch),
        gap_p=int(gap_p), end_gap_p=int(end_gap_p), band=int(band),
        mode=mode, homo_gap_p=int(homo_gap_p) if use_homo else 0)


def steps_to_alignment(kinds: np.ndarray, p0: np.ndarray, p1: np.ndarray,
                       s1: np.ndarray, s2: np.ndarray):
    """Reconstruct the gapped alignment (host-side) from traceback steps.

    Returns (al0, al1) uint8 arrays with 254 = gap, matching ops/nw_ref.
    """
    from .nw_ref import GAP

    live = kinds != PTR_NONE
    kinds, p0, p1 = kinds[live][::-1], p0[live][::-1], p1[live][::-1]
    al0 = np.where(kinds != PTR_LEFT, s1[np.clip(p0, 0, len(s1) - 1)], GAP)
    al1 = np.where(kinds != PTR_UP, s2[np.clip(p1, 0, len(s2) - 1)], GAP)
    return al0.astype(np.uint8), al1.astype(np.uint8)
