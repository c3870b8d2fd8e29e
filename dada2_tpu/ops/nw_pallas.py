"""Pallas TPU wavefront kernel for banded ends-free Needleman-Wunsch.

The production aligner. Replaces the XLA scan implementation (nw_batch.py)
for the hot path: one kernel instance sweeps a block of 128 pairs (pairs on
lanes, band window on sublanes) through the full DP *and* the traceback with
everything resident in VMEM — the pointer slab never touches HBM. The XLA
version pays a dispatch + HBM round-trip per anti-diagonal; here an
anti-diagonal costs a handful of VPU ops on [W, 128] tiles.

Per-lane geometry: every lane (pair) carries its own len2/lband/rband; the
window origin o(d) = max(0, d - len2max, ceil((d - rbmax)/2)) is a block
scalar that lower-bounds every lane's in-band rows, and per-lane validity is
enforced with elementwise band masks. Two layout tricks make all memory
access uniform (no per-lane gathers, which Mosaic only supports within one
vreg):

* score windows move by o(d) - o(d-1) in {0, 1} per diagonal, so neighbor
  reads are static sublane rolls selected by the scalar shift;
* candidate chars are stored REVERSED and RIGHT-ALIGNED at row C = len2max
  (s2rr[C - j, lane] = s2[j-1]); the char wanted at window row r on
  diagonal d is s2[d - o(d) - r - 1], i.e. storage row C - d + o(d) + r —
  a contiguous sublane slice with a lane-independent offset.

Geometry is runtime (scalar prefetch per block), so one compiled program
(per padded tile-size bucket) serves every cluster center and length mix.

Semantics are identical to ops/nw_ref.py mode="vec" (reference:
src/nwalign_vectorized.cpp:71-318): tie precedence up >= left > diag,
band widened on the long side, ends-free last-row/col recalculation
activating one diagonal late. The companion XLA post-pass
(derive_from_kinds) turns the emitted per-diagonal step kinds into
positions/hamming/transition-vectors via suffix-cumsums.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**29)
LANES = 128


def _make_kernel(L1R, L2R, NDP, WP, match, mismatch, gap_p, end_gap_p,
                 emit_kinds):
    endsfree = end_gap_p > gap_p

    def kernel(scal_ref, par_ref, s1_ref, s2q_ref, *rest):
        if emit_kinds:
            (kinds_ref, sub_ref, mapq_ref, end_ref, slab_ref, p1_ref,
             p2_ref, acc_ref) = rest
        else:
            (sub_ref, mapq_ref, end_ref, slab_ref, p1_ref, p2_ref,
             acc_ref) = rest
            kinds_ref = None
        b = pl.program_id(0)
        len1 = scal_ref[b, 0]
        len2max = scal_ref[b, 1]
        rbmax = scal_ref[b, 2]
        nd = len1 + len2max
        C = len2max  # right-alignment row of the reversed candidates

        riota = jax.lax.broadcasted_iota(jnp.int32, (WP, LANES), 0)
        len2_l = jnp.broadcast_to(par_ref[pl.ds(0, 1), :], (WP, LANES))
        lb_l = jnp.broadcast_to(par_ref[pl.ds(1, 1), :], (WP, LANES))
        rb_l = jnp.broadcast_to(par_ref[pl.ds(2, 1), :], (WP, LANES))

        if emit_kinds:
            kinds_ref[...] = jnp.zeros((NDP, LANES), jnp.int32)
        # substitution overrides in s2q storage layout (row l2max-1-p for
        # query position p): 0 = none, 1+nt0 at mismatched diagonals
        sub_ref[...] = jnp.zeros((L2R, LANES), jnp.int32)
        # center-coordinate merged alignment record: row i holds, for the
        # step consuming center position i,
        #   diag: (qual << 17) | (j << 3) | (nt1 + 2)
        #   up (gap): 1;  unconsumed: 0
        # — one tile carries the map AND the (nt, qual) tally payload
        # (reference: al2subs src/nwalign_endsfree.cpp:570-639 for the
        # map; src/error.cpp:131-258 for the tallies)
        mapq_ref[...] = jnp.zeros((L1R, LANES), jnp.int32)
        end_ref[...] = jnp.zeros((8, LANES), jnp.int32)
        acc_ref[...] = jnp.zeros((WP, LANES), jnp.int32)

        def o(d):
            # uniform window origin: lower bound of every lane's band rows
            return jnp.maximum(0, jnp.maximum(d - len2max,
                                              (d - rbmax + 1) // 2))

        # ---------------- fill ----------------
        # p1_ref holds diagonal d-1, p2_ref d-2 (window-relative rows). The
        # origin moves by 0 or 1 per diagonal, so neighbor reads are static
        # sublane rolls selected by the scalar shift.
        p1_ref[...] = jnp.full((WP, LANES), NEG, jnp.int32)
        p1_ref[pl.ds(0, 1), :] = jnp.zeros((1, LANES), jnp.int32)  # (0,0)
        p2_ref[...] = jnp.full((WP, LANES), NEG, jnp.int32)

        def _shift_up(x):
            # row r <- row r+1; vacated last row = NEG (out-of-window)
            y = pltpu.roll(x, WP - 1, 0)
            return jnp.where(riota == WP - 1, NEG, y)

        def _shift_dn(x):
            # row r <- row r-1; vacated first row = NEG
            y = pltpu.roll(x, 1, 0)
            return jnp.where(riota == 0, NEG, y)

        def fill_body(d, _):
            od = o(d)
            o1 = o(d - 1)
            o2 = o(d - 2)
            s1w = od - o1          # 0 or 1
            s2w = od - o2 - 1      # -1, 0 or 1
            p1win = p1_ref[...]
            p2win = p2_ref[...]
            Lv = jnp.where(s1w == 0, p1win, _shift_up(p1win)) + gap_p
            U = jnp.where(s1w == 0, _shift_dn(p1win), p1win) + gap_p
            Dp = jnp.where(s2w == 0, p2win,
                           jnp.where(s2w == 1, _shift_up(p2win),
                                     _shift_dn(p2win)))
            c1 = s1_ref[pl.ds(od, WP), :]           # s1[i-1], i = od + r
            c2 = s2q_ref[pl.ds(C - d + od, WP), :] & 3  # s2[j-1], j = d-i
            D = Dp + jnp.where(c1 == c2, match, mismatch)

            # tie precedence: up >= left > diag
            # (reference: src/nwalign_vectorized.cpp:8-32)
            entry = jnp.where(U >= Lv, U, Lv)
            ptr = jnp.where(U >= Lv, 3, 2)
            dwin = D > entry
            entry = jnp.where(dwin, D, entry)
            ptr = jnp.where(dwin, 1, ptr)

            i_t = od + riota
            j_t = d - i_t
            entry = jnp.where(j_t == 0, i_t * end_gap_p, entry)
            ptr = jnp.where(j_t == 0, 3, ptr)
            entry = jnp.where(i_t == 0, j_t * end_gap_p, entry)
            ptr = jnp.where(i_t == 0, 2, ptr)

            if endsfree:
                # one-diagonal-late skip only when the band clips that
                # side (reference: src/nwalign_vectorized.cpp:186-215)
                j_first = jnp.where(lb_l < len1, len1 - lb_l, 0)
                i_first = jnp.where(rb_l < len2_l, len2_l - rb_l, 0)
                lastrow = ((i_t == len1) & (j_t > j_first) & (i_t > 0)
                           & (j_t > 0))
                # score(len1, j-1) on diag d-1 sits at window row len1-o1
                candr = jnp.sum(
                    jnp.where(riota == len1 - o1, p1win, 0), axis=0,
                    keepdims=True) + end_gap_p
                candr = jnp.broadcast_to(candr, (WP, LANES))
                rgt = lastrow & (candr > entry)
                rtie = lastrow & (candr == entry) & (ptr == 1)
                entry = jnp.where(rgt, candr, entry)
                ptr = jnp.where(rgt | rtie, 2, ptr)
                lastcol = ((j_t == len2_l) & (i_t > i_first) & (i_t > 0)
                           & (j_t > 0))
                candc = U - gap_p + end_gap_p
                cgt = lastcol & (candc > entry)
                ctie = lastcol & (candc == entry) & (ptr != 3)
                entry = jnp.where(cgt, candc, entry)
                ptr = jnp.where(cgt | ctie, 3, ptr)

            valid = ((i_t - j_t <= lb_l) & (j_t - i_t <= rb_l)
                     & (i_t <= len1) & (j_t >= 0) & (j_t <= len2_l))
            entry = jnp.where(valid, entry, NEG)
            ptr = jnp.where(valid, ptr, 0)
            # 2-bit pointer packing: 4 diagonals per slab byte, flushed
            # every 4th diagonal (quarters slab VMEM; PacBio-length
            # amplicons fit on-chip)
            acc = acc_ref[...] | (ptr << (2 * (d & 3)))

            @pl.when((d & 3) == 3)
            def _flush():
                slab_ref[pl.ds(d >> 2, 1)] = acc.astype(jnp.int8).reshape(
                    1, WP, LANES)
                acc_ref[...] = jnp.zeros((WP, LANES), jnp.int32)

            @pl.when((d & 3) != 3)
            def _keep():
                acc_ref[...] = acc

            p2_ref[...] = p1win
            p1_ref[...] = entry
            return 0

        jax.lax.fori_loop(1, nd + 1, fill_body, 0)

        @pl.when((nd & 3) != 3)
        def _final_flush():
            slab_ref[pl.ds(nd >> 2, 1)] = acc_ref[...].astype(
                jnp.int8).reshape(1, WP, LANES)

        # ---------------- traceback ----------------
        l2row = par_ref[pl.ds(0, 1), :]  # [1, LANES]

        def tb_body(k, carry):
            i_t, j_t = carry  # [1, LANES]
            d = nd - k
            od = o(d)
            packed = slab_ref[pl.ds(d >> 2, 1)].reshape(WP, LANES).astype(
                jnp.int32)
            ptr_tile = (packed >> (2 * (d & 3))) & 3
            r_b = jnp.broadcast_to(i_t - od, (WP, LANES))
            onehot = riota == r_b
            ptr_lane = jnp.sum(jnp.where(onehot, ptr_tile, 0),
                               axis=0, keepdims=True)
            active = ((i_t + j_t) == d) & ((i_t > 0) | (j_t > 0))
            kind = jnp.where(active, ptr_lane, 0)
            if emit_kinds:
                kinds_ref[pl.ds(d, 1)] = kind
            # chars consumed by this step, via the same one-hot row select
            # (window rows r hold s1[od+r-1] / s2[d-od-r-1], as in fill)
            c1w = s1_ref[pl.ds(od, WP), :]
            sqw = s2q_ref[pl.ds(C - d + od, WP), :]
            c1l = jnp.sum(jnp.where(onehot, c1w, 0), axis=0, keepdims=True)
            sql = jnp.sum(jnp.where(onehot, sqw, 0), axis=0, keepdims=True)
            c2l = sql & 3
            q2l = sql >> 2
            diag = kind == 1
            consume1 = diag | (kind == 3)
            # mismatched diagonal -> substitution override 1+nt0 at the
            # query position's storage row (window row == r_b)
            issub = diag & (c1l != c2l)
            subw = sub_ref[pl.ds(C - d + od, WP), :]
            sub_ref[pl.ds(C - d + od, WP), :] = jnp.where(
                onehot & jnp.broadcast_to(issub, (WP, LANES)),
                jnp.broadcast_to(c1l + 1, (WP, LANES)), subw)
            # merged map/(nt,qual) record at center row i_t
            mqv = jnp.where(diag, (q2l << 17) | (j_t << 3) | (c2l + 2), 1)
            mapqw = mapq_ref[pl.ds(od, WP), :]
            mapq_ref[pl.ds(od, WP), :] = jnp.where(
                onehot & jnp.broadcast_to(consume1, (WP, LANES)),
                jnp.broadcast_to(mqv, (WP, LANES)), mapqw)
            takes1 = consume1.astype(jnp.int32)
            takes2 = ((kind == 1) | (kind == 2)).astype(jnp.int32)
            return (i_t - takes1, j_t - takes2)

        i0 = jnp.full((1, LANES), 1, jnp.int32) * len1
        j0 = l2row.astype(jnp.int32)
        i_f, j_f = jax.lax.fori_loop(0, nd, tb_body, (i0, j0))
        end_ref[pl.ds(0, 1), :] = i_f
        end_ref[pl.ds(1, 1), :] = j_f

    return kernel


@partial(jax.jit, static_argnames=("L1R", "L2R", "NDP", "WP", "match",
                                   "mismatch", "gap_p", "end_gap_p",
                                   "interpret", "emit_kinds"))
def _pallas_call(scal, params, s1t, s2q, *, L1R, L2R, NDP, WP,
                 match, mismatch, gap_p, end_gap_p, interpret=False,
                 emit_kinds=False):
    """Returns ([kinds [nb, NDP, LANES] if emit_kinds,]
    sub [nb, L2R, LANES], mapq [nb, L1R, LANES], end [nb, 8, LANES]);
    sub/mapq/end are emitted by the in-kernel traceback so no XLA
    gather/scatter post-pass is needed (TPU scatters serialize; the
    kernel's one-hot window writes do not). s2q packs each candidate
    position as (qual << 2) | nt_code in the reversed right-aligned
    storage layout. Keeping the traceback's dynamic VMEM accesses to a
    minimum matters: Mosaic compile time grows superlinearly with them."""
    nblocks = s2q.shape[0]
    kernel = _make_kernel(L1R, L2R, NDP, WP, match, mismatch, gap_p,
                          end_gap_p, emit_kinds)
    out_specs = [
        pl.BlockSpec((None, L2R, LANES), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((None, L1R, LANES), lambda b, *_: (b, 0, 0)),
        pl.BlockSpec((None, 8, LANES), lambda b, *_: (b, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nblocks, L2R, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nblocks, L1R, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nblocks, 8, LANES), jnp.int32),
    ]
    if emit_kinds:
        out_specs.insert(
            0, pl.BlockSpec((None, NDP, LANES), lambda b, *_: (b, 0, 0)))
        out_shape.insert(
            0, jax.ShapeDtypeStruct((nblocks, NDP, LANES), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((None, 8, LANES), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((L1R, LANES), lambda b, *_: (0, 0)),
            pl.BlockSpec((None, L2R, LANES), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM(((NDP + 3) // 4, WP, LANES), jnp.int8),
                        pltpu.VMEM((WP, LANES), jnp.int32),
                        pltpu.VMEM((WP, LANES), jnp.int32),
                        pltpu.VMEM((WP, LANES), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, params, s1t, s2q)


@partial(jax.jit, static_argnames=("nd",))
def derive_from_kinds(kinds, s1pad, len1b, s2pad, len2b, *, nd):
    """XLA post-pass: positions, hamming and transition vectors from the
    diagonal-indexed step kinds.

    At diagonal d the pair is at (i, j) with i+j = d; after the step its
    position is len - (suffix count of consumed steps), so one reversed
    cumsum per axis reconstructs p0/p1 without any sequential walk.
    """
    kinds = kinds[:, :nd]

    def one(kind, s1, l1, s2, l2):
        takes1 = ((kind == 1) | (kind == 3)).astype(jnp.int32)
        takes2 = ((kind == 1) | (kind == 2)).astype(jnp.int32)
        cum1 = jnp.cumsum(takes1[::-1])[::-1]
        cum2 = jnp.cumsum(takes2[::-1])[::-1]
        p0 = l1 - cum1
        p1 = l2 - cum2
        diag = kind == 1
        nt0 = s1[jnp.clip(p0, 0, s1.shape[0] - 1)].astype(jnp.int32)
        nt1 = s2[jnp.clip(p1, 0, s2.shape[0] - 1)].astype(jnp.int32)
        ham = jnp.sum((diag & (nt0 != nt1)).astype(jnp.int32))
        sl = s2.astype(jnp.int32)
        tvec = jnp.where(jnp.arange(s2.shape[0]) < l2, 5 * sl, 16)
        idx = jnp.where(diag, p1, s2.shape[0])
        tvec = tvec.at[idx].set(jnp.where(diag, 4 * nt0 + nt1, 0),
                                mode="drop")
        # traceback completed iff consumed counts cover both sequences
        ok = (cum1[0] == l1) & (cum2[0] == l2) if nd > 0 else (l1 + l2 == 0)
        return p0, p1, ham, tvec.astype(jnp.int8), ok

    return jax.vmap(one)(kinds, s1pad, len1b, s2pad, len2b)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def block_window(len1: int, len2: np.ndarray, band: int) -> int:
    """Exact max window width (rows) needed for a block of candidate
    lengths vs one center, under the uniform origin o(d)."""
    len2 = np.asarray(len2, np.int64)
    if band < 0:
        lb = np.full(len2.shape, len1)
        rb = len2.copy()
    else:
        lb = band + np.maximum(0, len1 - len2)
        rb = band + np.maximum(0, len2 - len1)
    l2m, rbm = int(len2.max()), int(rb.max())
    d = np.arange(len1 + l2m + 1)
    o = np.maximum(0, np.maximum(d - l2m, -(-(d - rbm) // 2)))
    hi = np.minimum(np.minimum(len1, d[:, None]),
                    (d[:, None] + lb[None, :]) // 2)
    return int((hi.max(axis=1) - o + 1).max())


def assemble_blocks(s2b: np.ndarray, len2b: np.ndarray, order=None):
    """Sort candidates by length and chunk into 128-lane blocks.

    Returns (block_index_lists [nblocks, LANES], per-lane original row ->
    (block, lane) inverse map)."""
    len2b = np.asarray(len2b, np.int64)
    n = len(len2b)
    if order is None:
        order = np.argsort(len2b, kind="stable")
    blocks = []
    for k in range(0, n, LANES):
        chunk = order[k: k + LANES]
        pad = np.full(LANES - len(chunk), chunk[0], np.int64)
        blocks.append(np.concatenate([chunk, pad]))
    return np.stack(blocks) if blocks else np.zeros((0, LANES), np.int64)


def pack_s2_blocks(s2b: np.ndarray, len2b: np.ndarray,
                   block_idx: np.ndarray, L2R: int):
    """Reversed right-aligned candidate char blocks [nblocks, L2R, LANES]
    plus the per-lane parameter rows (len2 only; bands are center-
    dependent and belong to the per-call scalar/params assembly)."""
    nblocks = block_idx.shape[0]
    if nblocks == 0:
        return np.zeros((0, L2R, LANES), np.int32)
    lens_all = np.asarray(len2b, np.int64)
    out = np.zeros((nblocks, L2R, LANES), np.int32)
    t_idx = np.arange(L2R, dtype=np.int64)[:, None]
    # storage row C - jj holds s2[jj-1], C = len2max(block): within one
    # block that is a plain reversal of the first l2max chars (contiguous
    # strided copy — an element scatter here costs ~10x more on slow-
    # page-fault hosts), masked where the reversal reaches past a lane's
    # own length
    for bi in range(nblocks):
        rows = block_idx[bi]
        lb = lens_all[rows]
        l2m = int(lb.max())
        seg = s2b[rows][:, l2m - 1::-1].T.astype(np.int32)  # [l2m, LANES]
        out[bi, :l2m] = np.where(t_idx[:l2m] >= (l2m - lb)[None, :],
                                 seg, 0)
    return out


def nw_pallas_grouped(s1: np.ndarray, len1: int, s2b, len2b, *, match,
                      mismatch, gap_p, end_gap_p=0, band=16,
                      interpret=False):
    """Align one center against candidates (any length mix) with the
    wavefront kernel. Results are returned in the ORIGINAL row order.

    Returns (kinds [n, nd], p0, p1, ham [n], tvec [n, L2], ok [n]) in the
    traceback-order convention shared with ops/nw_batch.nw_batch.
    """
    s2b = np.asarray(s2b)
    len2b = np.asarray(len2b, np.int64)
    n, L2 = s2b.shape
    block_idx = assemble_blocks(s2b, len2b)
    nblocks = block_idx.shape[0]

    W = max(block_window(len1, len2b[block_idx[bi]], band)
            for bi in range(nblocks))
    WP = _round_up(max(W, 8), 32)
    NDP = _round_up(len1 + int(len2b.max()) + 1, 8)
    L1R = _round_up(len1 + 1 + WP, 8)
    L2R = _round_up(int(len2b.max()) + WP, 8)

    s2r = pack_s2_blocks(s2b, len2b, block_idx, L2R)
    scal = np.zeros((nblocks, 4), np.int32)
    params = np.zeros((nblocks, 8, LANES), np.int32)
    for bi in range(nblocks):
        l2 = len2b[block_idx[bi]]
        if band < 0:
            lb = np.full(LANES, len1)
            rb = l2
        else:
            lb = band + np.maximum(0, len1 - l2)
            rb = band + np.maximum(0, l2 - len1)
        scal[bi] = (len1, int(l2.max()), int(rb.max()), 0)
        params[bi, 0] = l2
        params[bi, 1] = lb
        params[bi, 2] = rb
    s1t = np.zeros((L1R, LANES), np.int32)
    s1t[1: 1 + len1, :] = np.asarray(s1[:len1], np.int32)[:, None]

    kinds_blocks = _pallas_call(
        jnp.asarray(scal), jnp.asarray(params), jnp.asarray(s1t),
        jnp.asarray(s2r), L1R=L1R, L2R=L2R, NDP=NDP, WP=WP,
        match=int(match), mismatch=int(mismatch), gap_p=int(gap_p),
        end_gap_p=int(end_gap_p), interpret=interpret,
        emit_kinds=True)[0]

    # un-block: rows for the first occurrence of each original index
    flat_idx = block_idx.reshape(-1)
    inv = np.full(n, -1, np.int64)
    for r, j in enumerate(flat_idx):
        if inv[j] < 0:
            inv[j] = r
    kb = jnp.swapaxes(kinds_blocks, 1, 2).reshape(nblocks * LANES, -1)
    kinds = jnp.take(kb, jnp.asarray(inv), axis=0)

    p0, p1, ham, tvec, ok = derive_from_kinds(
        kinds, jnp.broadcast_to(jnp.asarray(s1[:len1], jnp.int8)[None, :],
                                (n, len1)),
        jnp.full(n, len1, jnp.int32), jnp.asarray(s2b, jnp.int8),
        jnp.asarray(len2b, jnp.int32), nd=NDP)
    # kinds rows are diagonal-ascending = forward alignment order; flip to
    # the traceback-reverse convention shared with ops/nw_batch.py
    return (np.asarray(kinds)[:, ::-1], np.asarray(p0)[:, ::-1],
            np.asarray(p1)[:, ::-1], np.asarray(ham), np.asarray(tvec),
            np.asarray(ok))
