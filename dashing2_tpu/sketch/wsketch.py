"""wsketch subcommand: sketch pre-aggregated weighted sets (CSR or flat).

Reference: src/wsketch.cpp. Inputs are raw binary vectors: ids/weights
(+ optional indptr for CSR matrices); '-' as the weights file means
uniform weights. Items fed to the sketcher are row ordinals, remapped to
original ids at the end (wsketch.cpp:17-49).

Outputs (CSR case, wsketch.cpp:300-360):
  <pref>.sampled.indices.stacked.<n>.<m>.i64  — winning original ids
  <pref>.sampled.regs.stacked.<n>.<m>.f64     — stacked sigs w/ header
                                                (u64 n, u64 m, f64 cards)
  <pref>.sampled.hashes.stacked.<n>.<m>.i64   — u64 signature hashes
  <pref>.sampled.info.txt                     — total weights
Flat case (wsketch.cpp:362-377): .sampled.indices.u64 / .sampled.hashes.f64
(f64 total weight + registers) / .sampled.ids.u64 / .sampled.tw.txt.
"""

from __future__ import annotations

import sys
from typing import List, Optional, Tuple

import numpy as np

from .. import hashing as H
from ..ops import sketch_kernels as SK
from .weighted import bagminhash, probminhash


def _read_vec(path: str, dtype) -> Optional[np.ndarray]:
    if path == "-":
        return None
    return np.fromfile(path, dtype=dtype)


def _sketch_row(ids: np.ndarray, weights: Optional[np.ndarray], m: int,
                sketchtype: int
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Returns (sigs f64 (m,), sig_hashes u64 (m,), sampled_ids u64 (m,),
    total_weight). sketchtype: 1=BagMinHash, 0=ProbMinHash,
    -1=FullSetSketch (set semantics)."""
    n = len(ids)
    if n == 0:
        # empty CSR row: empty-sketch conventions (all-zero registers,
        # cardinality/total weight 0) — the reference's rowwise sketcher
        # emits a row for empty ranges rather than aborting
        sigs = np.zeros(m, np.float64)
        _, hashes = H.wyhash64_step(sigs.view(np.uint64))
        return sigs, hashes, np.zeros(m, np.uint64), 0.0
    w = weights if weights is not None else np.ones(n)
    ordinals = np.arange(n, dtype=np.uint64)
    if sketchtype == -1:
        regs, win = SK.css_sketch(ordinals, np.ones(n, bool), m,
                                  return_ids=True)
        sigs = np.where(np.isfinite(regs), regs, 0.0)
        tw = float(n)
        sampled = ids[np.clip(win, 0, n - 1)].astype(np.uint64)
    else:
        fn = bagminhash if sketchtype == 1 else probminhash
        sigs, win = fn(ordinals, np.asarray(w, np.float64), m,
                       with_ids=True)
        tw = float(np.asarray(w, np.float64).sum())
        sampled = ids[np.clip(win, 0, n - 1)].astype(np.uint64)
    # u64 "hash" signatures: wyhash64_stateless of the register bit
    # patterns (CSetSketch::to_sigs<integral>, setsketch.h:573-589 —
    # stateless(x) = mix(x + WY_INC), which is exactly one
    # wyhash64_step ON the bits)
    bits = sigs.view(np.uint64)
    _, hashes = H.wyhash64_step(bits)
    return sigs, hashes, sampled, tw


def wsketch_main(a) -> int:
    args: List[str] = a.wargs
    if not 1 <= len(args) <= 3:
        print("wsketch requires 1-3 positional args "
              "(ids [weights [indptr]])", file=sys.stderr)
        return 1
    m = a.sketchsize
    # default ProbMinHash (the reference's usage contract and its CSR
    # path; its flat path's 1->BagMinHash mapping is an internal
    # inconsistency there); -B picks BagMinHash, -q set semantics
    sketchtype = (-1 if getattr(a, "setsketch", False)
                  else 1 if getattr(a, "bagminhash", False) else 0)
    id_dtype = np.uint32 if a.u32 else np.uint64
    w_dtype = np.float32 if a.f32 else np.float64
    ip_dtype = np.uint32 if getattr(a, "indptr32", False) else np.uint64
    outpref = a.outfile or args[0]
    if len(args) == 3:
        ids = _read_vec(args[0], id_dtype)
        weights = _read_vec(args[1], w_dtype) if len(args) >= 2 else None
        indptr = _read_vec(args[2], ip_dtype)
        nr = len(indptr) - 1
        sig_rows = np.empty((nr, m), np.float64)
        hash_rows = np.empty((nr, m), np.uint64)
        id_rows = np.empty((nr, m), np.uint64)
        cards = np.empty(nr, np.float64)
        for i in range(nr):
            b, e = int(indptr[i]), int(indptr[i + 1])
            sig_rows[i], hash_rows[i], id_rows[i], cards[i] = _sketch_row(
                ids[b:e], weights[b:e] if weights is not None else None,
                m, sketchtype)
        tag = f"{nr}.{m}"
        id_rows.tofile(f"{outpref}.sampled.indices.stacked.{tag}.i64")
        with open(f"{outpref}.sampled.regs.stacked.{tag}.f64", "wb") as f:
            np.array([nr, m], np.uint64).tofile(f)
            cards.tofile(f)
            sig_rows.tofile(f)
        hash_rows.tofile(f"{outpref}.sampled.hashes.stacked.{tag}.i64")
        with open(f"{outpref}.sampled.info.txt", "w") as f:
            for c in cards:
                f.write("%0.17g\n" % c)
        return 0
    # flat (single weighted set): ids [weights]
    ids = _read_vec(args[0], id_dtype)
    weights = _read_vec(args[1], w_dtype) if len(args) == 2 else None
    sigs, hashes, sampled, tw = _sketch_row(ids, weights, m, sketchtype)
    hashes.tofile(outpref + ".sampled.indices.u64")
    with open(outpref + ".sampled.hashes.f64", "wb") as f:
        np.array([tw], np.float64).tofile(f)
        sigs.tofile(f)
    sampled.tofile(outpref + ".sampled.ids.u64")
    with open(outpref + ".sampled.tw.txt", "w") as f:
        f.write(f"Total weight: {tw};{args[0]}\n")
    return 0
