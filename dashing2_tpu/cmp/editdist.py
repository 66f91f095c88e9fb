"""Edit distances: Myers bit-parallel Levenshtein over byte sequences and
the O(nm) DP over minimizer spans.

Reference: vendored edlib (src/edlib.cpp, used with EDLIB_TASK_DISTANCE in
NW mode, cmp_core.cpp:331-347) and src/edit-distance.h:12-57 (u64-span DP).
This is an independent implementation of Myers' 1999 algorithm (global
alignment via the Ukkonen-style NW adaptation) — host-side; candidate
volumes after LSH filtering are small.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..result import SketchingResult


def myers_edit_distance(a: bytes, b: bytes) -> int:
    """Levenshtein distance (unit costs), Myers' 1999 bit-parallel
    recurrence run on Python big-ints (CPython performs the 64-bit word
    blocking internally, so this is the unblocked textbook form at blocked
    speed)."""
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    m = len(a)
    peq = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    last = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) & mask ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & last:
            score += 1
        elif mh & last:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def span_edit_distance(a: np.ndarray, b: np.ndarray) -> int:
    """O(nm) DP over u64 token spans (edit-distance.h:12-57), one
    vectorized row per outer token.

    The left-to-right dependency cur[j] = min(tmp[j], cur[j-1] + 1) with
    tmp[j] = min(prev[j] + 1, prev[j-1] + cost_j) unrolls to
    cur[j] = j + min_{l<=j}(tmp[l] - l), a prefix-min scan — so each DP
    row is pure numpy instead of an interpreted inner loop."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    if n > m:  # outer loop over the SHORTER sequence: fewer
        a, b = b, a        # interpreted rows, each a wide vectorized op
        n, m = m, n
    prev = np.arange(m + 1, dtype=np.int64)
    ar = np.arange(m + 1, dtype=np.int64)
    tmp = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        np.minimum(prev[1:] + 1, prev[:-1] + (b != a[i - 1]), out=tmp[1:])
        tmp[0] = i
        prev = ar + np.minimum.accumulate(tmp - ar)
    return int(prev[-1])


def myers_batch_native(seqs: Sequence[bytes], ia: np.ndarray,
                       ib: np.ndarray, nthreads: int = 0
                       ) -> np.ndarray | None:
    """Batch Levenshtein via the native blocked-Myers library
    (native/myers_ed.cpp), fanned across threads. None when the
    toolchain is unavailable."""
    import ctypes
    import os

    from ..native import load_myers_lib
    lib = load_myers_lib()
    if lib is None:
        return None
    needed = sorted({int(x) for x in ia} | {int(x) for x in ib})
    remap = {g: l for l, g in enumerate(needed)}
    offsets = np.zeros(len(needed) + 1, np.int64)
    bufs = []
    for l, g in enumerate(needed):
        s = bytes(seqs[g])
        bufs.append(s)
        offsets[l + 1] = offsets[l] + len(s)
    concat = np.frombuffer(b"".join(bufs), dtype=np.uint8) if bufs else \
        np.zeros(0, np.uint8)
    if concat.size == 0:
        concat = np.zeros(1, np.uint8)  # non-null base pointer
    ia_l = np.asarray([remap[int(x)] for x in ia], np.int64)
    ib_l = np.asarray([remap[int(x)] for x in ib], np.int64)
    out = np.empty(len(ia), np.int64)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.myers_batch(concat.ctypes.data_as(u8p),
                    offsets.ctypes.data_as(i64p),
                    ia_l.ctypes.data_as(i64p), ib_l.ctypes.data_as(i64p),
                    len(ia), nthreads, out.ctypes.data_as(i64p))
    return out.astype(np.float64)


def edit_distances_pairs(result: SketchingResult, ia: np.ndarray,
                         ib: np.ndarray) -> np.ndarray:
    seqs = result.sequences
    if seqs is not None:
        if len(ia):
            native = myers_batch_native(seqs, ia, ib)
            if native is not None:
                return native
        out = np.empty(len(ia), dtype=np.float64)
        for p, (i, j) in enumerate(zip(ia, ib)):
            out[p] = myers_edit_distance(seqs[int(i)], seqs[int(j)])
        return out
    out = np.empty(len(ia), dtype=np.float64)
    mseqs = result.mmer_sequences
    for p, (i, j) in enumerate(zip(ia, ib)):
        out[p] = span_edit_distance(mseqs[int(i)], mseqs[int(j)])
    return out


def mmer_edit_distance_pair(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """(edit_distance, max_edit_distance) for minimizer sequences
    (wcompare.cpp mmer_edit_distance semantics)."""
    return span_edit_distance(a, b), max(len(a), len(b))
