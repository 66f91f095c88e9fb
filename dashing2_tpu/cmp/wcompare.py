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
