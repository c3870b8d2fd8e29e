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
* interior diagonals (no border cell, no ends-free cell in the window —
  the vast majority) run a trimmed body with the band mask folded into
  two per-lane row bounds;
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
                 emit_kinds, halves=1, s1_per_block=False):
    """Kernel over H = halves independent 128-lane blocks per grid step.

    The wavefront loop is LATENCY-bound, not ALU-bound: one diagonal
    step costs ~240ns regardless of body size (scalar-core bookkeeping,
    VMEM dependency chains), so interleaving H blocks' diagonals in one
    loop runs H blocks in roughly the time of one. Each half keeps its
    own refs/scratch at 128 lanes — Mosaic's unaligned dynamic-sublane
    loads only lower for single-vreg-wide memrefs."""
    endsfree = end_gap_p > gap_p
    H = halves
    NOUT = 4 if emit_kinds else 3

    def kernel(*refs):
        scal_ref = refs[0]
        par = refs[1:1 + H]
        if s1_per_block:
            # pairs mode: each half's block carries its OWN 128 query
            # sequences as per-lane s1 columns (the DP core and
            # traceback already read s1 per (row, lane); only len1 must
            # be block-uniform, which the pairs builder groups by)
            s1s = refs[1 + H: 1 + 2 * H]
            s2q = refs[1 + 2 * H: 1 + 3 * H]
            outs = refs[1 + 3 * H: 1 + 3 * H + NOUT * H]
            scratch = refs[1 + 3 * H + NOUT * H:]
        else:
            s1_shared = refs[1 + H]
            s2q = refs[2 + H: 2 + 2 * H]
            outs = refs[2 + 2 * H: 2 + 2 * H + NOUT * H]
            scratch = refs[2 + 2 * H + NOUT * H:]
        b = pl.program_id(0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (WP, LANES), 0)

        def make_half(h):
            """Per-half closures; all state lives in the half's own
            refs/scratch, only the diagonal index d is shared."""
            st = {}
            row = H * b + h
            s1_ref = s1s[h] if s1_per_block else s1_shared
            len1 = scal_ref[row, 0]
            len2max = scal_ref[row, 1]
            rbmax = scal_ref[row, 2]
            len2min = scal_ref[row, 3]
            nd = len1 + len2max
            C = len2max  # right-alignment row of the reversed candidates
            par_ref = par[h]
            s2q_ref = s2q[h]
            if emit_kinds:
                kinds_ref, sub_ref, mapq_ref, end_ref = outs[
                    NOUT * h: NOUT * (h + 1)]
            else:
                sub_ref, mapq_ref, end_ref = outs[NOUT * h: NOUT * (h + 1)]
                kinds_ref = None
            slab_ref, p1_ref, p2_ref, acc_ref = scratch[4 * h: 4 * h + 4]

            l2_row = par_ref[pl.ds(0, 1), :]                # [1, LANES]
            lb_row = par_ref[pl.ds(1, 1), :]
            rb_row = par_ref[pl.ds(2, 1), :]
            len2_l = jnp.broadcast_to(l2_row, (WP, LANES))
            lb_l = jnp.broadcast_to(lb_row, (WP, LANES))
            rb_l = jnp.broadcast_to(rb_row, (WP, LANES))

            if emit_kinds:
                kinds_ref[...] = jnp.zeros((NDP, LANES), jnp.int32)
            # substitution overrides in s2q storage layout (row
            # l2max-1-p for query position p): 0 = none, 1+nt0 at
            # mismatched diagonals
            sub_ref[...] = jnp.zeros((L2R, LANES), jnp.int32)
            # center-coordinate merged alignment record: row i holds,
            # for the step consuming center position i,
            #   diag: (qual << 17) | (j << 3) | (nt1 + 2)
            #   up (gap): 1;  unconsumed: 0
            # — one tile carries the map AND the (nt, qual) tally payload
            # (reference: al2subs src/nwalign_endsfree.cpp:570-639 for
            # the map; src/error.cpp:131-258 for the tallies)
            mapq_ref[...] = jnp.zeros((L1R, LANES), jnp.int32)
            end_ref[...] = jnp.zeros((8, LANES), jnp.int32)
            acc_ref[...] = jnp.zeros((WP, LANES), jnp.int32)

            def o(d):
                # uniform window origin: lower bound of every lane's
                # band rows
                return jnp.maximum(0, jnp.maximum(d - len2max,
                                                  (d - rbmax + 1) // 2))

            # p1_ref holds diagonal d-1, p2_ref d-2 (window-relative
            # rows). The origin moves by 0 or 1 per diagonal, so
            # neighbor reads are static sublane rolls selected by the
            # scalar shift.
            p1_ref[...] = jnp.full((WP, LANES), NEG, jnp.int32)
            p1_ref[pl.ds(0, 1), :] = jnp.zeros((1, LANES),
                                               jnp.int32)  # (0,0)
            p2_ref[...] = jnp.full((WP, LANES), NEG, jnp.int32)

            def _shift_up(x):
                # row r <- row r+1; vacated last row = NEG
                y = pltpu.roll(x, WP - 1, 0)
                return jnp.where(riota == WP - 1, NEG, y)

            def _shift_dn(x):
                # row r <- row r-1; vacated first row = NEG
                y = pltpu.roll(x, 1, 0)
                return jnp.where(riota == 0, NEG, y)

            def _core(d, p1win, p2win):
                """One DP step from the previous two diagonals (register
                tiles); returns (od, U, entry, ptr) before band/border
                masking."""
                od = o(d)
                s1w = od - o(d - 1)          # 0 or 1
                s2w = od - o(d - 2) - 1      # -1, 0 or 1
                Lv = jnp.where(s1w == 0, p1win,
                               _shift_up(p1win)) + gap_p     # (i, j-1)
                U = jnp.where(s1w == 0, _shift_dn(p1win),
                              p1win) + gap_p                 # (i-1, j)
                Dp = jnp.where(s2w == 0, p2win,
                               jnp.where(s2w == 1, _shift_up(p2win),
                                         _shift_dn(p2win)))  # (i-1, j-1)
                c1 = s1_ref[pl.ds(od, WP), :]   # s1[i-1], i = od + r
                c2 = s2q_ref[pl.ds(C - d + od, WP), :] & 3  # s2[j-1]
                D = Dp + jnp.where(c1 == c2, match, mismatch)
                # tie precedence: up >= left > diag
                # (reference: src/nwalign_vectorized.cpp:8-32)
                entry = jnp.where(U >= Lv, U, Lv)
                ptr = jnp.where(U >= Lv, 3, 2)
                dwin = D > entry
                entry = jnp.where(dwin, D, entry)
                ptr = jnp.where(dwin, 1, ptr)
                return od, U, entry, ptr

            def _neighbors(d):
                p1win = p1_ref[...]
                od, U, entry, ptr = _core(d, p1win, p2_ref[...])
                return od, p1win, U, entry, ptr

            def _mid_mask(d, od):
                # the five band conditions folded into per-lane row
                # bounds: i <= (d+lb)//2, i <= len1, i <= d (j>=0),
                # i >= ceil((d-rb)/2), i >= d-len2
                rhi = jnp.minimum((d + lb_row) >> 1,
                                  jnp.minimum(len1, d)) - od
                rlo = jnp.maximum((d - rb_row + 1) >> 1,
                                  d - l2_row) - od
                return ((riota >= jnp.broadcast_to(rlo, (WP, LANES)))
                        & (riota <= jnp.broadcast_to(rhi, (WP, LANES))))

            def _commit(d, p1win, entry, ptr, valid):
                entry = jnp.where(valid, entry, NEG)
                ptr = jnp.where(valid, ptr, 0)
                # 2-bit pointer packing: 4 diagonals per slab byte,
                # flushed every 4th diagonal (quarters slab VMEM;
                # PacBio-length amplicons fit on-chip)
                acc = acc_ref[...] | (ptr << (2 * (d & 3)))

                @pl.when((d & 3) == 3)
                def _flush():
                    slab_ref[pl.ds(d >> 2, 1)] = acc.astype(
                        jnp.int8).reshape(1, WP, LANES)
                    acc_ref[...] = jnp.zeros((WP, LANES), jnp.int32)

                @pl.when((d & 3) != 3)
                def _keep():
                    acc_ref[...] = acc

                p2_ref[...] = p1win
                p1_ref[...] = entry

            def fill_step(d):
                od, p1win, U, entry, ptr = _neighbors(d)
                o1 = o(d - 1)

                i_t = od + riota
                j_t = d - i_t
                entry = jnp.where(j_t == 0, i_t * end_gap_p, entry)
                ptr = jnp.where(j_t == 0, 3, ptr)
                entry = jnp.where(i_t == 0, j_t * end_gap_p, entry)
                ptr = jnp.where(i_t == 0, 2, ptr)

                if endsfree:
                    # one-diagonal-late skip only when the band clips
                    # that side (reference:
                    # src/nwalign_vectorized.cpp:186-215)
                    j_first = jnp.where(lb_l < len1, len1 - lb_l, 0)
                    i_first = jnp.where(rb_l < len2_l, len2_l - rb_l, 0)
                    lastrow = ((i_t == len1) & (j_t > j_first)
                               & (i_t > 0) & (j_t > 0))
                    # score(len1, j-1) on diag d-1 is window row len1-o1
                    candr = jnp.sum(
                        jnp.where(riota == len1 - o1, p1win, 0), axis=0,
                        keepdims=True) + end_gap_p
                    candr = jnp.broadcast_to(candr, (WP, LANES))
                    rgt = lastrow & (candr > entry)
                    rtie = lastrow & (candr == entry) & (ptr == 1)
                    entry = jnp.where(rgt, candr, entry)
                    ptr = jnp.where(rgt | rtie, 2, ptr)
                    lastcol = ((j_t == len2_l) & (i_t > i_first)
                               & (i_t > 0) & (j_t > 0))
                    candc = U - gap_p + end_gap_p
                    cgt = lastcol & (candc > entry)
                    ctie = lastcol & (candc == entry) & (ptr != 3)
                    entry = jnp.where(cgt, candc, entry)
                    ptr = jnp.where(cgt | ctie, 3, ptr)

                valid = ((i_t - j_t <= lb_l) & (j_t - i_t <= rb_l)
                         & (i_t <= len1) & (j_t >= 0) & (j_t <= len2_l))
                _commit(d, p1win, entry, ptr, valid)

            def mid_step(d):
                # interior diagonals: the window provably contains no
                # i==0 / j==0 border cell and no i==len1 / j==len2
                # ends-free cell, so only the DP core and the band mask
                # remain
                od, p1win, _U, entry, ptr = _neighbors(d)
                _commit(d, p1win, entry, ptr, _mid_mask(d, od))

            def mid_chunk(m, e1, e2):
                # four interior diagonals [4m, 4m+3] per loop iteration:
                # the wavefront loop pays ~110ns of fixed per-iteration
                # overhead, so chunking amortizes it 4x; the previous
                # two diagonals flow through the carry REGISTERS (no
                # p1/p2/acc scratch traffic), the slab byte's four
                # 2-bit phases are static shifts, and the packed byte
                # is written exactly once
                accv = jnp.zeros((WP, LANES), jnp.int32)
                for t in range(4):
                    d = 4 * m + t
                    od, _U, entry, ptr = _core(d, e1, e2)
                    valid = _mid_mask(d, od)
                    entry = jnp.where(valid, entry, NEG)
                    ptr = jnp.where(valid, ptr, 0)
                    accv = accv | (ptr << (2 * t))
                    e2 = e1
                    e1 = entry
                slab_ref[pl.ds(m, 1)] = accv.astype(jnp.int8).reshape(
                    1, WP, LANES)
                return e1, e2

            def load_regs():
                return p1_ref[...], p2_ref[...]

            def store_regs(regs):
                p1_ref[...] = regs[0]
                p2_ref[...] = regs[1]

            def final_flush(nd_c):
                # flush a trailing partial acc byte (diagonals past this
                # half's nd carry ptr 0, so sharing nd_c is exact)
                @pl.when((nd_c & 3) != 3)
                def _f():
                    slab_ref[pl.ds(nd_c >> 2, 1)] = acc_ref[...].astype(
                        jnp.int8).reshape(1, WP, LANES)

            def tb_step(k, carry):
                i_t, j_t = carry  # [1, LANES] each
                d = nd - k
                dcl = jnp.maximum(d, 0)     # past-the-end steps idle
                od = o(dcl)
                packed = slab_ref[pl.ds(dcl >> 2, 1)].reshape(
                    WP, LANES).astype(jnp.int32)
                ptr_tile = (packed >> (2 * (dcl & 3))) & 3
                r_b = jnp.broadcast_to(i_t - od, (WP, LANES))
                onehot = riota == r_b
                ptr_lane = jnp.sum(jnp.where(onehot, ptr_tile, 0),
                                   axis=0, keepdims=True)
                active = ((i_t + j_t) == d) & ((i_t > 0) | (j_t > 0))
                kind = jnp.where(active, ptr_lane, 0)
                # chars consumed by this step, via the same one-hot row
                # select (window rows r hold s1[od+r-1] / s2[d-od-r-1])
                c1w = s1_ref[pl.ds(od, WP), :]
                sqw = s2q_ref[pl.ds(C - dcl + od, WP), :]
                c1l = jnp.sum(jnp.where(onehot, c1w, 0), axis=0,
                              keepdims=True)
                sql = jnp.sum(jnp.where(onehot, sqw, 0), axis=0,
                              keepdims=True)
                c2l = sql & 3
                q2l = sql >> 2
                diag = kind == 1
                consume1 = diag | (kind == 3)
                # mismatched diagonal -> substitution override 1+nt0 at
                # the query position's storage row (window row == r_b)
                issub = diag & (c1l != c2l)
                if emit_kinds == "cls":
                    # alignment-column CLASS per step, in forward
                    # diagonal order: 1 = s2-insertion (s1 gap),
                    # 2 = s1-char-vs-s2-gap, 3 = substitution,
                    # 4 = match, 0 = inactive — the chimera scans run
                    # straight over this, no column scatter needed
                    clsv = jnp.where(kind == 2, 1,
                                     jnp.where(kind == 3, 2,
                                               jnp.where(issub, 3, 4)))
                    kinds_ref[pl.ds(dcl, 1)] = jnp.where(active, clsv,
                                                         0)
                elif emit_kinds:
                    kinds_ref[pl.ds(dcl, 1)] = kind
                subw = sub_ref[pl.ds(C - dcl + od, WP), :]
                sub_ref[pl.ds(C - dcl + od, WP), :] = jnp.where(
                    onehot & jnp.broadcast_to(issub, (WP, LANES)),
                    jnp.broadcast_to(c1l + 1, (WP, LANES)), subw)
                # merged map/(nt,qual) record at center row i_t
                mqv = jnp.where(diag,
                                (q2l << 17) | (j_t << 3) | (c2l + 2), 1)
                mapqw = mapq_ref[pl.ds(od, WP), :]
                mapq_ref[pl.ds(od, WP), :] = jnp.where(
                    onehot & jnp.broadcast_to(consume1, (WP, LANES)),
                    jnp.broadcast_to(mqv, (WP, LANES)), mapqw)
                takes1 = consume1.astype(jnp.int32)
                takes2 = ((kind == 1) | (kind == 2)).astype(jnp.int32)
                return (i_t - takes1, j_t - takes2)

            def tb_finish(carry):
                i_f, j_f = carry
                end_ref[pl.ds(0, 1), :] = i_f
                end_ref[pl.ds(1, 1), :] = j_f

            # phase bounds: borders can reach the window only while
            # d <= max(2*WP, rbmax) + 2. Ends-free cells need their row
            # in the window: lastrow (i==len1 at row len1-od) requires
            # od >= len1-WP+1, i.e. d > min(nd-WP, 2*(len1-WP)+rbmax);
            # lastcol (j==len2 at row d-od-len2) requires d-od >=
            # len2min, i.e. d > 2*len2min-rbmax-2. Degenerate geometries
            # (tiny lengths) run the full body throughout.
            no_mid = (len2max <= WP) | (len1 < 2 * WP)
            dA = jnp.minimum(nd, jnp.maximum(2 * WP + 2, rbmax + 2))
            dB = jnp.minimum(nd - WP,
                             jnp.minimum(2 * (len1 - WP) + rbmax,
                                         2 * len2min - rbmax - 2))
            dB = jnp.clip(dB - 2, dA + 1, nd + 1)
            st["fill"], st["mid"] = fill_step, mid_step
            st["mid_chunk"] = mid_chunk
            st["load_regs"], st["store_regs"] = load_regs, store_regs
            st["final_flush"], st["tb"] = final_flush, tb_step
            st["tb_finish"] = tb_finish
            st["nd"] = nd
            st["dA"] = jnp.where(no_mid, nd, dA)
            st["dB"] = jnp.where(no_mid, nd + 1, dB)
            st["i0"] = jnp.full((1, LANES), 1, jnp.int32) * len1
            st["j0"] = l2_row.astype(jnp.int32)
            return st

        hs = [make_half(h) for h in range(H)]

        # ---------------- fill ----------------
        # shared phase bounds: the full body is exact for every half
        # everywhere (and all diagonals past a half's own nd mask to
        # ptr 0), so union the border/ends ranges across halves.
        nd_c = hs[0]["nd"]
        dA_c = hs[0]["dA"]
        dB_c = hs[0]["dB"]
        for st in hs[1:]:
            nd_c = jnp.maximum(nd_c, st["nd"])
            dA_c = jnp.maximum(dA_c, st["dA"])
            dB_c = jnp.minimum(dB_c, st["dB"])
        dB_c = jnp.maximum(dB_c, dA_c + 1)

        def _run(step_name):
            def body(d, _):
                for st in hs:
                    st[step_name](d)
                return 0
            return body

        jax.lax.fori_loop(1, dA_c + 1, _run("fill"), 0)
        # bulk of the middle runs 4 diagonals per iteration, aligned to
        # the slab byte's 4-diagonal phases; single-step loops cover
        # the unaligned remainders at both ends
        m0 = (dA_c + 4) >> 2                 # first chunk: 4*m0 > dA_c
        m1 = jnp.maximum(dB_c >> 2, m0)      # last chunk end < dB_c
        jax.lax.fori_loop(dA_c + 1, jnp.minimum(4 * m0, dB_c),
                          _run("mid"), 0)

        def chunk_body(m, carry):
            return tuple(st["mid_chunk"](m, *c)
                         for st, c in zip(hs, carry))

        regs = jax.lax.fori_loop(
            m0, m1, chunk_body, tuple(st["load_regs"]() for st in hs))
        for st, c in zip(hs, regs):
            st["store_regs"](c)
        jax.lax.fori_loop(jnp.maximum(4 * m1, dA_c + 1), dB_c,
                          _run("mid"), 0)
        jax.lax.fori_loop(dB_c, nd_c + 1, _run("fill"), 0)
        for st in hs:
            st["final_flush"](nd_c)

        # ---------------- traceback ----------------
        def tb_body(k, carry):
            return tuple(st["tb"](k, c) for st, c in zip(hs, carry))

        carry0 = tuple((st["i0"], st["j0"]) for st in hs)
        carry = jax.lax.fori_loop(0, nd_c, tb_body, carry0)
        for st, c in zip(hs, carry):
            st["tb_finish"](c)

    return kernel


@partial(jax.jit, static_argnames=("L1R", "L2R", "NDP", "WP", "match",
                                   "mismatch", "gap_p", "end_gap_p",
                                   "interpret", "emit_kinds", "halves",
                                   "s1_per_block"))
def _pallas_call(scal, params, s1t, s2q, *, L1R, L2R, NDP, WP,
                 match, mismatch, gap_p, end_gap_p, interpret=False,
                 emit_kinds=False, halves=1, s1_per_block=False):
    """Returns ([kinds [nb, NDP, LANES] if emit_kinds,]
    sub [nb, L2R, LANES], mapq [nb, L1R, LANES], end [nb, 8, LANES]);
    sub/mapq/end are emitted by the in-kernel traceback so no XLA
    gather/scatter post-pass is needed (TPU scatters serialize; the
    kernel's one-hot window writes do not). s2q packs each candidate
    position as (qual << 2) | nt_code in the reversed right-aligned
    storage layout. Keeping the traceback's dynamic VMEM accesses to a
    minimum matters: Mosaic compile time grows superlinearly with them.

    halves > 1 fuses that many grid blocks per kernel invocation (the
    wavefront loop is latency-bound per step, so fused blocks run in
    roughly the time of one); block counts are padded to a multiple."""
    H = halves
    nb_in = s2q.shape[0]
    pad = (-nb_in) % H
    if pad:
        scal = jnp.concatenate([scal, scal[:pad]], 0)
        params = jnp.concatenate([params, params[:pad]], 0)
        s2q = jnp.concatenate([s2q, s2q[:pad]], 0)
        if s1_per_block:
            s1t = jnp.concatenate([s1t, s1t[:pad]], 0)
    nblocks = nb_in + pad
    kernel = _make_kernel(L1R, L2R, NDP, WP, match, mismatch, gap_p,
                          end_gap_p, emit_kinds, H, s1_per_block)

    def idx(h):
        return lambda b, *_: (H * b + h, 0, 0)

    if s1_per_block:
        s1_specs = [pl.BlockSpec((None, L1R, LANES), idx(h))
                    for h in range(H)]
    else:
        s1_specs = [pl.BlockSpec((L1R, LANES), lambda b, *_: (0, 0))]
    in_specs = (
        [pl.BlockSpec((None, 8, LANES), idx(h)) for h in range(H)]
        + s1_specs
        + [pl.BlockSpec((None, L2R, LANES), idx(h)) for h in range(H)])
    shapes = [(L2R, LANES), (L1R, LANES), (8, LANES)]
    if emit_kinds:
        shapes.insert(0, (NDP, LANES))
    out_specs, out_shape = [], []
    for h in range(H):
        for shp in shapes:
            out_specs.append(pl.BlockSpec((None,) + shp, idx(h)))
            out_shape.append(
                jax.ShapeDtypeStruct((nblocks,) + shp, jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks // H,),
        in_specs=in_specs,
        out_specs=out_specs,
        # per half, in unpack order: slab, p1, p2, acc
        scratch_shapes=[
            pltpu.VMEM(((NDP + 3) // 4, WP, LANES), jnp.int8)
            if k == 0 else pltpu.VMEM((WP, LANES), jnp.int32)
            for _ in range(H) for k in range(4)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, *([params] * H), *([s1t] * (H if s1_per_block else 1)),
      *([s2q] * H))
    # half h wrote only rows {H*b + h} of its own output arrays; pick
    # each half's rows and restore block order
    nout = len(shapes)
    merged = []
    for k in range(nout):
        if H == 1:
            merged.append(outs[k][:nb_in])
            continue
        nb2 = nblocks // H
        stacked = jnp.stack(
            [outs[h * nout + k].reshape(
                (nb2, H) + outs[k].shape[1:])[:, h] for h in range(H)],
            axis=1)
        merged.append(
            stacked.reshape((nblocks,) + outs[k].shape[1:])[:nb_in])
    return merged


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


def assemble_blocks(s2b: np.ndarray, len2b: np.ndarray, order=None,
                    lanes=LANES):
    """Sort candidates by length and chunk into 128-lane blocks.

    Returns (block_index_lists [nblocks, lanes], per-lane original row ->
    (block, lane) inverse map)."""
    len2b = np.asarray(len2b, np.int64)
    n = len(len2b)
    if order is None:
        order = np.argsort(len2b, kind="stable")
    blocks = []
    for k in range(0, n, lanes):
        chunk = order[k: k + lanes]
        pad = np.full(lanes - len(chunk), chunk[0], np.int64)
        blocks.append(np.concatenate([chunk, pad]))
    return np.stack(blocks) if blocks else np.zeros((0, lanes), np.int64)


def pack_s2_blocks(s2b: np.ndarray, len2b: np.ndarray,
                   block_idx: np.ndarray, L2R: int):
    """Reversed right-aligned candidate char blocks [nblocks, L2R, LANES]
    plus the per-lane parameter rows (len2 only; bands are center-
    dependent and belong to the per-call scalar/params assembly)."""
    nblocks, lanes = block_idx.shape
    if nblocks == 0:
        return np.zeros((0, L2R, lanes), np.int32)
    lens_all = np.asarray(len2b, np.int64)
    out = np.zeros((nblocks, L2R, lanes), np.int32)
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
        scal[bi] = (len1, int(l2.max()), int(rb.max()), int(l2.min()))
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
