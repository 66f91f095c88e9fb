"""Exact sorted-set / count-dictionary comparisons.

Reference: src/wcompare.cpp:28-51 (weighted_compare: sorted-merge
intersection with min-weights), :111 (set_compare). Host numpy
(searchsorted-based merge); a device merge-path kernel can replace this
for large batches.
"""

from __future__ import annotations

import numpy as np

from ..result import SketchingResult


def set_intersection_size(a: np.ndarray, b: np.ndarray) -> float:
    """|A & B| for sorted u64 arrays."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    if len(a) > len(b):
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx = np.minimum(idx, len(b) - 1)
    return float((b[idx] == a).sum())


def weighted_intersection_size(a: np.ndarray, ca: np.ndarray,
                               b: np.ndarray, cb: np.ndarray) -> float:
    """Sum of min(count_a, count_b) over shared keys (weighted_compare
    isz semantics)."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    idx = np.searchsorted(b, a)
    idx_c = np.minimum(idx, len(b) - 1)
    hit = b[idx_c] == a
    return float(np.minimum(ca[hit], cb[idx_c[hit]]).sum())


def cosine_compare(a: np.ndarray, ca: np.ndarray,
                   b: np.ndarray, cb: np.ndarray) -> float:
    """Dot product of two sparse count vectors keyed by sorted u64 hashes
    (cosine_compare, wcompare.cpp:117-143; divide by the norms for cosine
    similarity — the reference returns the raw dot product too)."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    idx = np.searchsorted(b, a)
    idx_c = np.minimum(idx, len(b) - 1)
    hit = b[idx_c] == a
    return float((ca[hit] * cb[idx_c[hit]]).sum())


def union_size_weighted(a: np.ndarray, ca: np.ndarray,
                        b: np.ndarray, cb: np.ndarray) -> float:
    """Sum of max(count_a, count_b) over the key union (weighted_compare
    union semantics, wcompare.cpp:28-51)."""
    isz = weighted_intersection_size(a, ca, b, cb)
    return float(ca.sum() + cb.sum() - isz)


def hamming_matches(a: np.ndarray, b: np.ndarray) -> float:
    """Equal positions over the overlap plus the length difference
    (hamming_compare, wcompare.cpp:52-55; the streaming hamming_compare_f
    :89-107 computes the same value)."""
    n = min(len(a), len(b))
    return float((a[:n] == b[:n]).sum()) + float(max(len(a), len(b)) - n)


def mmer_sequence_pairs(opts, result: SketchingResult, ia: np.ndarray,
                        ib: np.ndarray) -> np.ndarray:
    """Minimizer-sequence (--seq) comparisons (cmp_core.cpp:547-553):
    exact span edit distance under --exact-kmer-dist (value or
    max_len - value depending on the measure), positional hamming
    matches otherwise."""
    from ..enums import Measure
    from .editdist import mmer_edit_distance_pair
    seqs = result.mmer_sequences
    out = np.empty(len(ia), dtype=np.float64)
    for p, (i, j) in enumerate(zip(ia, ib)):
        if opts.exact_kmer_dist:
            dist, maxd = mmer_edit_distance_pair(seqs[int(i)], seqs[int(j)])
            out[p] = dist if opts.measure == Measure.M_EDIT_DISTANCE \
                else maxd - dist
        else:
            out[p] = hamming_matches(seqs[int(i)], seqs[int(j)])
    return out


def exact_intersections(result: SketchingResult, rows: np.ndarray,
                        cols: np.ndarray) -> np.ndarray:
    """Intersection-size matrix for exact k-mer representations.

    Vectorized posting-list join (replaces the reference's per-pair
    sorted merges, wcompare.cpp:28-51/:111, with one sort + one
    searchsorted + a ragged expansion per row block): concatenate the
    column sets into a key-sorted table, match every row key against the
    unique-key groups, expand matches to (row, col) contributions, and
    accumulate with one bincount. Weighted mode contributes
    min(count_row, count_col) per shared key."""
    sets = result.kmer_sets
    counts = result.kmer_set_counts
    nr, nc = len(rows), len(cols)
    out = np.zeros((nr, nc), dtype=np.float64)
    if nr == 0 or nc == 0:
        return out
    col_sizes = np.array([len(sets[int(j)]) for j in cols], np.int64)
    if col_sizes.sum() == 0:
        return out
    ck = np.concatenate([sets[int(j)] for j in cols])
    co = np.repeat(np.arange(nc, dtype=np.int64), col_sizes)
    cc = (np.concatenate([counts[int(j)] for j in cols])
          if counts is not None else None)
    order = np.argsort(ck, kind="stable")
    ck, co = ck[order], co[order]
    if cc is not None:
        cc = cc[order]
    grp_start = np.nonzero(np.concatenate([[True], ck[1:] != ck[:-1]]))[0]
    uk = ck[grp_start]
    glen = np.diff(np.concatenate([grp_start, [len(ck)]]))

    row_sizes = np.array([len(sets[int(i)]) for i in rows], np.int64)
    if row_sizes.sum() == 0:
        return out
    rk = np.concatenate([sets[int(i)] for i in rows])
    ro = np.repeat(np.arange(nr, dtype=np.int64), row_sizes)
    rc = (np.concatenate([counts[int(i)] for i in rows])
          if counts is not None else None)
    pos = np.searchsorted(uk, rk)
    pos = np.minimum(pos, len(uk) - 1)
    hit = uk[pos] == rk
    gl = glen[pos[hit]]
    gs = grp_start[pos[hit]]
    total = int(gl.sum())
    if total == 0:
        return out
    # ragged expansion: each row-key match fans out over its col group
    offs = np.repeat(np.cumsum(gl) - gl, gl)
    within = np.arange(total, dtype=np.int64) - offs
    src = np.repeat(gs, gl) + within
    flat = np.repeat(ro[hit], gl) * nc + co[src]
    if counts is not None:
        vals = np.minimum(np.repeat(rc[hit], gl), cc[src]).astype(np.float64)
        out = np.bincount(flat, weights=vals,
                          minlength=nr * nc).reshape(nr, nc)
    else:
        out = np.bincount(flat, minlength=nr * nc).astype(
            np.float64).reshape(nr, nc)
    return out


def exact_intersections_pairs(result: SketchingResult, ia: np.ndarray,
                              ib: np.ndarray) -> np.ndarray:
    """Intersection sizes for an explicit pair list, grouped by the left
    item so each group is one vectorized posting join (the refine/dedup
    loops previously did one doubly-nested call per pair)."""
    ia = np.asarray(ia)
    ib = np.asarray(ib)
    out = np.empty(len(ia), dtype=np.float64)
    order = np.argsort(ia, kind="stable")
    sia = ia[order]
    starts = np.nonzero(np.concatenate([[True], sia[1:] != sia[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(sia)]])
    for s, e in zip(starts, ends):
        grp = order[s:e]
        out[grp] = exact_intersections(
            result, sia[s:s + 1], ib[grp])[0]
    return out
