"""Measured f32-epilogue deviation vs the reference's long-double
estimator epilogues (PARITY.md deviation 7).

native/ld_oracle.cpp transcribes compare()'s epilogues
(cmp_core.cpp:349-517) at long double; these tests sketch a REAL
corpus, extract the exact per-pair counts each representation
consumes, run the production f32 epilogues and the oracle on the same
counts, and bound the ULP distance of the emitted f32 values. The
measured maxima are recorded in PARITY.md.

Known-by-design divergences handled here:
  * non-finite clamping — production clamps inf to f32 max (FINF);
    the reference emits inf (double-max narrowing). Pairs where the
    oracle is non-finite and production is FINF count as 0 ulp.
  * a/b g_b forms — production evaluates g_b via bit tables in f32
    (relative error <= ~1e-6 documented in compressed_ab_measures32);
    the ab modes therefore carry a RELATIVE bound, not a ulp bound.
"""

import os
import sys

import numpy as np
import pytest

from dashing2_tpu.cmp import core as C
from dashing2_tpu.cmp import estimators as E
from dashing2_tpu.config import Dashing2DistOptions
from dashing2_tpu.enums import Measure
from dashing2_tpu.native import ld_epilogue

MEASURES = [Measure.SIMILARITY, Measure.CONTAINMENT,
            Measure.SYMMETRIC_CONTAINMENT, Measure.POISSON_LLR,
            Measure.INTERSECTION, Measure.UNION_SIZE]


def _ulp_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Float32 ULP distance with the FINF-vs-inf clamp matched."""
    a = np.asarray(a, np.float32).copy()
    b = np.asarray(b, np.float32).copy()
    finf = np.float32(np.finfo(np.float32).max)
    bad = ~np.isfinite(b) | (b == finf) | ~np.isfinite(a) | (a == finf)
    both_big = bad & ((~np.isfinite(a)) | (a == finf)) \
        & ((~np.isfinite(b)) | (b == finf))
    a[both_big] = 0.0
    b[both_big] = 0.0
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    am = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bm = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    return np.abs(am - bm)


@pytest.fixture(scope="module")
def sketched(tmp_path_factory):
    sys.path.insert(0, os.path.dirname(__file__))
    from make_fixtures import make
    from dashing2_tpu.sketch.core import sketch_fastx
    d = tmp_path_factory.mktemp("ldo")
    paths = make(str(d), n_genomes=8, length=9000)
    from dashing2_tpu.config import Dashing2Options
    opts = Dashing2Options(k=21, sketchsize=512)
    return sketch_fastx(opts, paths)


def _all_pair_counts(A: np.ndarray):
    n = A.shape[0]
    ia, ib = np.triu_indices(n, 1)
    Aa, Ab = A[ia], A[ib]
    eq = (Aa == Ab).sum(1).astype(np.int64)
    gt = (Aa > Ab).sum(1).astype(np.int64)
    lt = (Aa < Ab).sum(1).astype(np.int64)
    return ia, ib, eq, gt, lt


def test_full_register_epilogue_vs_oracle(sketched):
    """DEFAULT mode (full f64 registers, gt/lt counts)."""
    if ld_epilogue(0, 0, 1, 1, 1.0, 8.0, None, np.zeros(1, np.int64),
                   np.zeros(1, np.int64), np.ones(1), np.ones(1)) is None:
        pytest.skip("toolchain unavailable")
    opts = Dashing2DistOptions(k=21, sketchsize=512)
    creps, res = C._prep(opts, sketched)
    A = C._ordered_bits(opts, res.signatures)
    ia, ib, eq, gt, lt = _all_pair_counts(A)
    lh, rh = res.cardinalities[ia], res.cardinalities[ib]
    worst = {}
    for msr in MEASURES:
        ours = E.full_setsketch_measures32(gt, lt, 512, lh, rh, msr, 21)
        ref = ld_epilogue(0, int(msr), 21, 512, 1.0, 8.0, eq, gt, lt,
                          lh, rh)
        worst[msr.name] = int(_ulp_dist(ours, ref).max())
    # measured: see PARITY.md deviation 7 table
    assert max(worst.values()) <= 8, worst


def test_eqfull_epilogue_vs_oracle(sketched):
    """Equality mode (count_eq over u64 register bits)."""
    if ld_epilogue(0, 0, 1, 1, 1.0, 8.0, None, np.zeros(1, np.int64),
                   np.zeros(1, np.int64), np.ones(1), np.ones(1)) is None:
        pytest.skip("toolchain unavailable")
    opts = Dashing2DistOptions(k=21, sketchsize=512)
    creps, res = C._prep(opts, sketched)
    A = res.signatures.view(np.uint64).reshape(res.signatures.shape)
    ia, ib, eq, gt, lt = _all_pair_counts(A)
    lh, rh = res.cardinalities[ia], res.cardinalities[ib]
    worst = {}
    for msr in MEASURES:
        ours = E.equality_measures32(eq, 512, lh, rh, msr, 21)
        ref = ld_epilogue(1, int(msr), 21, 512, 1.0, 8.0, eq, gt, lt,
                          lh, rh)
        worst[msr.name] = int(_ulp_dist(ours, ref).max())
    assert max(worst.values()) <= 8, worst


@pytest.mark.parametrize("fd", [0.5, 1.0, 2.0, 4.0])
def test_bbit_epilogue_vs_oracle(sketched, fd):
    if ld_epilogue(0, 0, 1, 1, 1.0, 8.0, None, np.zeros(1, np.int64),
                   np.zeros(1, np.int64), np.ones(1), np.ones(1)) is None:
        pytest.skip("toolchain unavailable")
    opts = Dashing2DistOptions(k=21, sketchsize=512, fd_level=fd,
                               truncation_method=1)
    creps, res = C._prep(opts, sketched)
    data = creps.data
    if creps.nibble_packed:
        data = C._unpack_nibbles(data)
    ia, ib, eq, gt, lt = _all_pair_counts(data)
    lh, rh = res.cardinalities[ia], res.cardinalities[ib]
    worst = {}
    for msr in MEASURES:
        ours = E.bbit_measures32(eq, 512, fd, lh, rh, msr, 21)
        ref = ld_epilogue(3, int(msr), 21, 512, 1.0, fd, eq, gt, lt,
                          lh, rh)
        worst[msr.name] = int(_ulp_dist(ours, ref).max())
    assert max(worst.values()) <= 8, (fd, worst)


@pytest.mark.parametrize("fd", [0.5, 1.0, 2.0, 4.0])
def test_ab_epilogue_vs_oracle(sketched, fd):
    """a/b setsketch modes: g_b runs in f32 bit-table form in
    production (documented <= ~1e-6 relative), so the bound here is
    RELATIVE, not ulp."""
    if ld_epilogue(0, 0, 1, 1, 1.0, 8.0, None, np.zeros(1, np.int64),
                   np.zeros(1, np.int64), np.ones(1), np.ones(1)) is None:
        pytest.skip("toolchain unavailable")
    opts = Dashing2DistOptions(k=21, sketchsize=512, fd_level=fd,
                               truncation_method=0)
    creps, res = C._prep(opts, sketched)
    data = creps.data
    if creps.nibble_packed:
        data = C._unpack_nibbles(data)
    ia, ib, eq, gt, lt = _all_pair_counts(data)
    lh, rh = res.cardinalities[ia], res.cardinalities[ib]
    gb_form = "product" if fd == 0.5 else "complement"
    worst_rel = {}
    worst_ulp = {}
    for msr in MEASURES:
        ours = np.asarray(E.compressed_ab_measures32(
            gt, lt, 512, creps.b, fd, lh, rh, msr, 21,
            gb_form=gb_form), np.float32)
        ref = ld_epilogue(2, int(msr), 21, 512, creps.b, fd, eq, gt, lt,
                          lh, rh)
        worst_ulp[msr.name] = int(_ulp_dist(ours, ref).max())
        finf = np.float32(np.finfo(np.float32).max)
        ok = np.isfinite(ref) & (ref != finf) & (ours != finf)
        denom = np.maximum(np.abs(ref[ok]), np.float32(1e-30))
        rel = (np.abs(ours[ok] - ref[ok]) / denom) if ok.any() else [0.0]
        worst_rel[msr.name] = float(np.max(rel))
    assert max(worst_rel.values()) <= 5e-5, (fd, worst_rel, worst_ulp)


if __name__ == "__main__":
    # report mode: print the measured deviation table for PARITY.md
    import tempfile

    class _F:
        @staticmethod
        def mktemp(x):
            import pathlib
            return pathlib.Path(tempfile.mkdtemp(prefix=x))
    sk = sketched.__wrapped__(_F())
    for name, fn, args in [
            ("full", test_full_register_epilogue_vs_oracle, ()),
            ("eqfull", test_eqfull_epilogue_vs_oracle, ())] + [
            (f"bbit-fd{fd}", test_bbit_epilogue_vs_oracle, (fd,))
            for fd in (0.5, 1.0, 2.0, 4.0)] + [
            (f"ab-fd{fd}", test_ab_epilogue_vs_oracle, (fd,))
            for fd in (0.5, 1.0, 2.0, 4.0)]:
        try:
            fn(sk, *args)
            print(f"{name}: PASS (bounds hold)")
        except AssertionError as e:
            print(f"{name}: {e}")
