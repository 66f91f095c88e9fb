"""Similarity/distance estimators applied to pairwise count matrices.

Vectorized re-derivation of the per-pair logic in compare()
(/root/reference/src/cmp_core.cpp:349-517). Every function takes count
matrices (int32, shape (N, M)) plus cardinality vectors and returns the
final measure matrix in float64 (callers emit float32).

Cardinality conventions: lhcard/rhcard must be pre-broadcast to the count
matrices' shape (callers pass lh[:, None], rh[None, :] for matrices, or
flat per-pair vectors). lhcard is the row/left item, rhcard the
column/right item. Note the reference's asymmetric quirks are kept:
the full-register SET path divides CONTAINMENT by the *column* cardinality
(cmp_core.cpp:484) while the compressed/equality paths divide by the *row*
cardinality (cmp_core.cpp:419,443,511).
"""

from __future__ import annotations

import numpy as np

from ..enums import Measure

FINF = np.float64(np.finfo(np.float32).max)


def sim2dist(x: np.ndarray, k: int, xp=np) -> np.ndarray:
    """Mash/Poisson distance transform (cmp_core.cpp:361):
    -log(2x / (1+x)) / k, +inf at x == 0."""
    pm = -1.0 / max(1, k)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = xp.where(x > 0, xp.log(2.0 * x / (1.0 + x)) * pm, xp.inf)
    return out


def g_b(b: float, arg: np.ndarray, xp=np) -> np.ndarray:
    """SetSketch truncation correction (cmp_core.cpp:323-325):
    (1 - b^-arg) / (1 - 1/b)."""
    return (1.0 - xp.power(b, -arg)) / (1.0 - 1.0 / b)


def _finalize(ret: np.ndarray, xp=np) -> np.ndarray:
    """NaN/inf -> max float (cmp_core.cpp:573)."""
    if xp is not np:
        out = xp.asarray(ret, dtype=xp.float64)
        return xp.where(xp.isfinite(out), out, FINF)
    out = np.asarray(ret, dtype=np.float64)
    bad = ~np.isfinite(out)
    if bad.any():
        out = np.where(bad, FINF, out)
    return out


def full_setsketch_measures(gt: np.ndarray, lt: np.ndarray, m: int,
                            lhcard: np.ndarray, rhcard: np.ndarray,
                            measure: Measure, k: int, xp=np) -> np.ndarray:
    """Full-register SET-space estimator (cmp_core.cpp:458-494).

    alpha = gt/m, beta = lt/m, eq = 1-alpha-beta,
    ucard = max((lh+rh)/(2-alpha-beta), 0).
    """
    invm = 1.0 / m
    alpha = gt * invm
    beta = lt * invm
    eq = 1.0 - alpha - beta
    lh = xp.asarray(lhcard)
    rh = xp.asarray(rhcard)
    with np.errstate(divide="ignore", invalid="ignore"):
        ucard = xp.maximum((lh + rh) / (2.0 - alpha - beta), 0.0)
        eq = xp.where(eq <= 1e-15, 0.0, eq)
        isz = ucard * eq
        if measure == Measure.SIMILARITY:
            ret = eq
        elif measure == Measure.INTERSECTION:
            ret = isz
        elif measure == Measure.CONTAINMENT:
            ret = isz / rh
        elif measure == Measure.SYMMETRIC_CONTAINMENT:
            ret = isz / xp.minimum(lh, rh)
        elif measure == Measure.POISSON_LLR:
            ret = sim2dist(eq, k, xp)
        elif measure == Measure.UNION_SIZE:
            ret = lh + rh - isz
        else:
            raise ValueError(f"measure {measure} invalid here")
        # eq <= 0 -> 0 similarity (or max distance) (cmp_core.cpp:473-475)
        zero_mask = (1.0 - alpha - beta) <= 0
        if measure == Measure.POISSON_LLR:
            ret = xp.where(zero_mask, xp.inf, ret)
        else:
            ret = xp.where(zero_mask, 0.0, ret)
    return _finalize(ret, xp)


def equality_measures(eqc: np.ndarray, m: int, lhcard: np.ndarray,
                      rhcard: np.ndarray, measure: Measure, k: int, xp=np
                      ) -> np.ndarray:
    """Equality-fraction estimator for MULTISET/PSET/full-register-kmer
    paths (cmp_core.cpp:495-517): sim = eq/m, union = (lh+rh)/(1+sim)."""
    sim = eqc / m
    lh = xp.asarray(lhcard)
    rh = xp.asarray(rhcard)
    with np.errstate(divide="ignore", invalid="ignore"):
        ucard = xp.maximum((lh + rh) / (1.0 + sim), 0.0)
        if measure == Measure.SIMILARITY:
            ret = sim
        elif measure == Measure.INTERSECTION:
            ret = sim * ucard
        elif measure == Measure.SYMMETRIC_CONTAINMENT:
            ret = sim * ucard / xp.minimum(lh, rh)
        elif measure == Measure.CONTAINMENT:
            ret = sim * ucard / lh
        elif measure == Measure.POISSON_LLR:
            ret = sim2dist(sim, k, xp)
        elif measure == Measure.UNION_SIZE:
            ret = lh + rh - sim * ucard
        else:
            raise ValueError(f"measure {measure} invalid here")
    return _finalize(ret, xp)


def bbit_measures(eqc: np.ndarray, m: int, fd_level: float,
                  lhcard: np.ndarray, rhcard: np.ndarray,
                  measure: Measure, k: int, xp=np) -> np.ndarray:
    """b-bit compressed estimator (cmp_core.cpp:406-423): collision-corrected
    similarity ret = max(0, (eq/m + b2pow) / (1 + b2pow)),
    b2pow = -2^-(8*fd)."""
    b2pow = -np.ldexp(1.0, -int(fd_level * 8))
    sim = xp.maximum(0.0, (eqc / m + b2pow) / (1.0 + b2pow))
    lh = xp.asarray(lhcard)
    rh = xp.asarray(rhcard)
    with np.errstate(divide="ignore", invalid="ignore"):
        if measure in (Measure.INTERSECTION, Measure.UNION_SIZE):
            isz = xp.maximum((lh + rh) / (1.0 + sim), 0.0)
            ret = isz if measure == Measure.INTERSECTION else lh + rh - isz
        elif measure == Measure.CONTAINMENT:
            ret = xp.maximum((lh + rh) / (1.0 + sim), 0.0) * sim / lh
        elif measure == Measure.POISSON_LLR:
            ret = sim2dist(sim, k, xp)
        elif measure == Measure.SYMMETRIC_CONTAINMENT:
            ret = xp.maximum((lh + rh) / (1.0 + sim), 0.0) * sim / xp.minimum(lh, rh)
        else:  # SIMILARITY
            ret = sim
    return _finalize(ret, xp)


def compressed_ab_measures(gt: np.ndarray, lt: np.ndarray, m: int,
                           b: float, fd_level: float,
                           lhcard: np.ndarray, rhcard: np.ndarray,
                           measure: Measure, k: int,
                           reg_bytes: float = 8.0, xp=np) -> np.ndarray:
    """Setsketch-compressed (a,b-quantized) estimator
    (cmp_core.cpp:424-449): g_b-corrected alpha/beta, union from
    cardinalities, similarity = max(1 - alpha - beta, 0)."""
    invm = 1.0 / m
    alpha = gt * invm
    beta = lt * invm
    if fd_level < reg_bytes:
        alpha = g_b(b, alpha, xp)
        beta = g_b(b, beta, xp)
    lh = xp.asarray(lhcard)
    rh = xp.asarray(rhcard)
    with np.errstate(divide="ignore", invalid="ignore"):
        disjoint = (alpha + beta) >= 1.0
        mu = xp.where(disjoint, lh + rh,
                      xp.maximum((lh + rh) / (2.0 - alpha - beta), 0.0))
        ret = xp.maximum(1.0 - alpha - beta, 0.0)
        if measure == Measure.INTERSECTION:
            ret = ret * mu
        elif measure == Measure.UNION_SIZE:
            ret = lh + rh - ret * mu
        elif measure == Measure.CONTAINMENT:
            ret = ret * mu / lh
        elif measure == Measure.SYMMETRIC_CONTAINMENT:
            ret = ret * mu / xp.minimum(lh, rh)
        elif measure == Measure.POISSON_LLR:
            ret = sim2dist(ret, k, xp)
    return _finalize(ret, xp)


def exact_measures(isz: np.ndarray, lhcard: np.ndarray, rhcard: np.ndarray,
                   measure: Measure, k: int) -> np.ndarray:
    """Exact-mode correction (cmp_core.cpp:519-526 CORRECT_RES): from true
    intersection sizes and cardinalities."""
    lh = np.asarray(lhcard)
    rh = np.asarray(rhcard)
    with np.errstate(divide="ignore", invalid="ignore"):
        if measure == Measure.SYMMETRIC_CONTAINMENT:
            ret = isz / np.minimum(lh, rh)
        elif measure in (Measure.POISSON_LLR, Measure.SIMILARITY):
            ret = isz / (lh + rh - isz)
            if measure == Measure.POISSON_LLR:
                ret = sim2dist(ret, k)
        elif measure == Measure.CONTAINMENT:
            ret = isz / lh
        elif measure == Measure.INTERSECTION:
            ret = isz
        elif measure == Measure.UNION_SIZE:
            ret = lh + rh - isz
        else:
            ret = isz
    return _finalize(ret)


def optimal_parameters(minreg: float, maxreg: float, q: float
                       ) -> tuple[float, float]:
    """SetSketch (b, a) for a register value range (setsketch.cpp:7-10):
    b = exp(log(max/min)/q), a = max/b."""
    if maxreg < minreg:
        minreg, maxreg = maxreg, minreg
    b = float(np.exp(np.log(maxreg / minreg) / q))
    a = maxreg / b
    return b, a
