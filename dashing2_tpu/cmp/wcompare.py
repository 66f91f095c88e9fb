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
    """Intersection-size matrix for exact k-mer representations."""
    sets = result.kmer_sets
    counts = result.kmer_set_counts
    out = np.zeros((len(rows), len(cols)), dtype=np.float64)
    for ii, i in enumerate(rows):
        for jj, j in enumerate(cols):
            if counts is not None:
                out[ii, jj] = weighted_intersection_size(
                    sets[i], counts[i], sets[j], counts[j])
            else:
                out[ii, jj] = set_intersection_size(sets[i], sets[j])
    return out
