"""Chimera (bimera) identification and removal.

reference: src/chimera.cpp (C_is_bimera :18-58, BimeraTableParallel :60-174,
get_ham_endsfree :196-224, get_lr :228-269) and R/chimeras.R (isBimera :43,
isBimeraDenovo :105, isBimeraDenovoTable :220, removeBimeraDenovo :294,
isShiftDenovo :380).

The pairwise alignments (query vs candidate parents, ends-free vectorized NW
with band = maxShift) run batched on device; the left/right overlap
credit scans (get_lr) are exact host-side ports of the reference's pointer
walks, including their quirks (position-based shift crediting, the one-off
double-credit of the first post-mismatch match).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

from .encode import pack_sequences
from .options import current_options
from .ops.nw_batch import nw_batch, steps_to_alignment
from .ops.nw_ref import GAP


def _align_pairs(pairs: List[tuple], seqs: List[str], maxShift: int,
                 match: int, mismatch: int, gap_p: int):
    """Ends-free vectorized-NW alignments of arbitrary (query, parent)
    index pairs in ONE device batch.

    reference: nwalign_vectorized2 calls in src/chimera.cpp:27,122.
    Returns {pair: (al0, al1)} uint8 code arrays (GAP=254)."""
    if not pairs:
        return {}
    mat, lens = pack_sequences(seqs)
    qi = np.array([p[0] for p in pairs], np.int64)
    pi = np.array([p[1] for p in pairs], np.int64)
    kinds, p0, p1, _, _, ok = nw_batch(
        mat[qi], lens[qi], mat[pi], lens[pi], match=match,
        mismatch=mismatch, gap_p=gap_p, end_gap_p=0, band=maxShift)
    kinds, p0, p1 = np.asarray(kinds), np.asarray(p0), np.asarray(p1)
    if not np.asarray(ok).all():
        raise RuntimeError("N-W Align out of range.")
    out = {}
    for k, pr in enumerate(pairs):
        out[pr] = steps_to_alignment(
            kinds[k], p0[k], p1[k], mat[qi[k]][: lens[qi[k]]],
            mat[pi[k]][: lens[pi[k]]])
    return out


def _align_parents(sq: str, parents: List[str], maxShift: int,
                   match: int, mismatch: int, gap_p: int):
    """sq vs each parent (single-query convenience wrapper)."""
    seqs = [sq] + list(parents)
    pairs = [(0, 1 + k) for k in range(len(parents))]
    als = _align_pairs(pairs, seqs, maxShift, match, mismatch, gap_p)
    return [als[p] for p in pairs]


def _ham_endsfree(al0: np.ndarray, al1: np.ndarray) -> int:
    """Hamming distance over the internal (non-end-gap) alignment region.

    reference: get_ham_endsfree, src/chimera.cpp:196-224."""
    n = len(al0)
    i = 0
    gap1 = al0[i] == GAP
    gap2 = al1[i] == GAP
    while gap1 or gap2:
        i += 1
        gap1 = gap1 and al0[i] == GAP
        gap2 = gap2 and al1[i] == GAP
    j = n - 1
    gap1 = al0[j] == GAP
    gap2 = al1[j] == GAP
    while gap1 or gap2:
        j -= 1
        gap1 = gap1 and al0[j] == GAP
        gap2 = gap2 and al1[j] == GAP
    return int(np.sum(al0[i: j + 1] != al1[i: j + 1]))


def _get_lr(al0: np.ndarray, al1: np.ndarray, allow_one_off: bool,
            max_shift: int):
    """Left/right overlap credits, exact port of get_lr
    (reference: src/chimera.cpp:228-269)."""
    n = len(al0)
    pos = 0
    left = 0
    while pos < n and al0[pos] == GAP:
        pos += 1                      # scan in until query starts
    while pos < max_shift and al1[pos] == GAP:
        pos += 1                      # credit ends-free parent overhang
        left += 1
    while pos < n and al0[pos] == al1[pos]:
        pos += 1
        left += 1
    left_oo = right_oo = 0
    if allow_one_off:
        left_oo = left
        pos += 1
        if pos < n and al0[pos] != GAP:
            left_oo += 1
        while pos < n and al0[pos] == al1[pos]:
            pos += 1
            left_oo += 1

    pos = n - 1
    right = 0
    while pos >= 0 and al0[pos] == GAP:
        pos -= 1
    while pos > n - max_shift and al1[pos] == GAP:
        pos -= 1
        right += 1
    while pos >= 0 and al0[pos] == al1[pos]:
        pos -= 1
        right += 1
    if allow_one_off:
        right_oo = right
        pos -= 1
        if pos >= 0 and al0[pos] != GAP:
            right_oo += 1
        while pos >= 0 and al0[pos] == al1[pos]:
            pos -= 1
            right_oo += 1
    return left, right, left_oo, right_oo


def _vote_bimera(als, sqlen: int, allowOneOff: bool,
                 minOneOffParentDistance: int, maxShift: int) -> bool:
    """Bimera decision from a query's parent alignments
    (reference: C_is_bimera body, src/chimera.cpp:18-58)."""
    max_left = max_right = 0
    oo_max_left = oo_max_right = oo_max_left_oo = oo_max_right_oo = 0
    for al0, al1 in als:
        left, right, left_oo, right_oo = _get_lr(al0, al1, allowOneOff,
                                                 maxShift)
        if left + right >= sqlen:
            continue  # toss id/pure-shift/internal-indel "parents"
        max_left = max(max_left, left)
        max_right = max(max_right, right)
        if allowOneOff and _ham_endsfree(al0, al1) >= \
                minOneOffParentDistance:
            oo_max_left = max(oo_max_left, left)
            oo_max_right = max(oo_max_right, right)
            oo_max_left_oo = max(oo_max_left_oo, left_oo)
            oo_max_right_oo = max(oo_max_right_oo, right_oo)
        if max_left + max_right >= sqlen:
            return True
        if allowOneOff and (oo_max_left + oo_max_right_oo >= sqlen
                            or oo_max_left_oo + oo_max_right >= sqlen):
            return True
    return False


def is_bimera(sq: str, parents: List[str], allowOneOff: bool = False,
              minOneOffParentDistance: int = 4, maxShift: int = 16,
              **opt_overrides) -> bool:
    """True if sq is consistent with being a two-parent chimera.

    reference: C_is_bimera (src/chimera.cpp:18-58), isBimera
    (R/chimeras.R:43-47)."""
    opts = current_options().replace(**opt_overrides)
    als = _align_parents(sq, parents, maxShift, opts.MATCH, opts.MISMATCH,
                         opts.GAP_PENALTY)
    return _vote_bimera(als, len(sq), allowOneOff,
                        minOneOffParentDistance, maxShift)


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
    # all (query, parent) alignments in one device batch
    par_idx = []
    all_pairs = []
    for i, abund in enumerate(abunds):
        sel = (abunds > minFoldParentOverAbundance * abund) & \
            (abunds > minParentAbundance)
        idx = np.nonzero(sel)[0]
        if len(idx) < 2:
            idx = idx[:0]
        par_idx.append(idx)
        all_pairs.extend((i, int(k)) for k in idx)
    als = _align_pairs(all_pairs, seqs, maxShift, opts.MATCH,
                       opts.MISMATCH, opts.GAP_PENALTY)
    bims = np.zeros(len(seqs), dtype=bool)
    for i, idx in enumerate(par_idx):
        if len(idx) < 2:
            continue
        bims[i] = _vote_bimera(
            [als[(i, int(k))] for k in idx], len(seqs[i]), allowOneOff,
            minOneOffParentDistance, maxShift)
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

    # all (query, union-parent) alignments across all columns in ONE batch
    unions = []
    all_pairs = []
    for j in range(ncol):
        present = mat[:, j] > 0
        if not present.any():
            unions.append(np.zeros(0, np.int64))
            continue
        parent_mask = (mat > (minFoldParentOverAbundance *
                              mat[:, j][:, None])) & \
            (mat >= minParentAbundance)
        parent_mask[~present, :] = False
        union = np.nonzero(parent_mask.any(axis=0))[0]
        union = union[union != j]
        unions.append(union)
        all_pairs.extend((j, int(k)) for k in union)
    als_all = _align_pairs(all_pairs, sqs, maxShift, opts.MATCH,
                           opts.MISMATCH, opts.GAP_PENALTY)

    for j in range(ncol):
        present = mat[:, j] > 0
        nsam[j] = int(present.sum())
        if nsam[j] == 0:
            continue
        sqlen = len(sqs[j])
        parent_mask = (mat > (minFoldParentOverAbundance *
                              mat[:, j][:, None])) & \
            (mat >= minParentAbundance)
        parent_mask[~present, :] = False
        union = unions[j]
        lefts = np.zeros(ncol, dtype=np.int64)
        rights = np.zeros(ncol, dtype=np.int64)
        lefts_oo = np.zeros(ncol, dtype=np.int64)
        rights_oo = np.zeros(ncol, dtype=np.int64)
        allowed = np.zeros(ncol, dtype=bool)
        for k in union:
            al0, al1 = als_all[(j, int(k))]
            left, right, left_oo, right_oo = _get_lr(
                al0, al1, allowOneOff, maxShift)
            if allowOneOff and _ham_endsfree(al0, al1) >= \
                    minOneOffParentDistance:
                allowed[k] = True
            if left + right < sqlen:
                lefts[k], rights[k] = left, right
                lefts_oo[k], rights_oo[k] = left_oo, right_oo
        for i in np.nonzero(present)[0]:
            pk = np.nonzero(parent_mask[i])[0]
            if len(pk) == 0:
                continue
            max_left = int(lefts[pk].max(initial=0))
            max_right = int(rights[pk].max(initial=0))
            if max_left + max_right >= sqlen:
                nflag[j] += 1
            elif allowOneOff:
                pa = pk[allowed[pk]]
                if len(pa):
                    if (lefts[pa].max(initial=0) +
                            rights_oo[pa].max(initial=0) >= sqlen or
                            lefts_oo[pa].max(initial=0) +
                            rights[pa].max(initial=0) >= sqlen):
                        nflag[j] += 1
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

    reference: isShiftDenovo (R/chimeras.R:380-421)."""
    from .paired import eval_pair, nwalign
    from .seqtab import get_sequences, get_uniques

    unqs_int = get_uniques(unqs)
    seqs = list(unqs_int.keys())
    abunds = np.array(list(unqs_int.values()))

    def is_shifted_pair(sq1, sq2):
        a1, a2 = nwalign(sq1, sq2, band=-1)
        match, mismatch, indel = eval_pair(a1, a2)
        return ((match < len(sq1) or flagSubseqs)
                and (match < len(sq2) or flagSubseqs)
                and match >= minOverlap and mismatch == 0 and indel == 0)

    shifts = np.zeros(len(seqs), dtype=bool)
    for i, (sq, ab) in enumerate(zip(seqs, abunds)):
        pars = [s for s, a in zip(seqs, abunds) if a > ab]
        if not pars:
            if verbose:
                print("No possible parents.")
            continue
        shifts[i] = any(is_shifted_pair(sq, p) for p in pars)
    flagged = {s for s, b in zip(seqs, shifts) if b}
    seqs_input = get_sequences(unqs)
    return pd.Series([s in flagged for s in seqs_input], index=seqs_input)
