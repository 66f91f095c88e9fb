"""Cross-product routing fuzz: the SWAR engine route through the real
pairwise_matrix must agree with the XLA route for every (representation,
measure, shape) combination — including odd m, tiny n, heavy ties, and
panel splits. Counts are bit-identical by construction; the f32
epilogues are separate XLA graphs, so agreement is to f32-ulp tolerance
(wide-ab g_b chains drift a few ulps — see test_swar_engines._close)."""

import os

import numpy as np
import pytest

import dashing2_tpu  # noqa: F401
from dashing2_tpu.cmp.core import pairwise_matrix
from dashing2_tpu.config import Dashing2DistOptions
from dashing2_tpu.enums import Measure
from dashing2_tpu.result import SketchingResult


def _mkres(seed, n, m, nq=0, ties=0.0):
    rng = np.random.default_rng(seed)
    res = SketchingResult(names=[f"s{i}" for i in range(n)])
    sigs = np.abs(rng.normal(size=(n, m))) + 1e-9
    if ties:
        tie_rows = rng.random(n) < ties
        sigs[tie_rows] = sigs[0]
    res.signatures = sigs
    res.cardinalities = rng.uniform(1e3, 1e5, size=n)
    res.nq = nq
    return res


def _run(opts, res, mode):
    os.environ["DASHING2_TPU_KERNEL"] = mode
    try:
        return dict(pairwise_matrix(opts, res))
    finally:
        del os.environ["DASHING2_TPU_KERNEL"]


CONFIGS = []
for msr in (Measure.SIMILARITY, Measure.CONTAINMENT,
            Measure.SYMMETRIC_CONTAINMENT, Measure.POISSON_LLR,
            Measure.INTERSECTION, Measure.UNION_SIZE):
    CONFIGS.append((dict(kmer_result=1, measure=msr), 97, 0, 0.0))
CONFIGS += [
    (dict(kmer_result=1, fd_level=1.0, truncation_method=1), 130, 0, 0.3),
    (dict(kmer_result=1, fd_level=2.0, truncation_method=1,
          measure=Measure.POISSON_LLR), 75, 0, 0.0),
    (dict(kmer_result=1, fd_level=1.0,
          measure=Measure.CONTAINMENT), 110, 0, 0.5),
    (dict(kmer_result=1, fd_level=2.0), 83, 0, 0.0),
    (dict(kmer_result=1, measure=Measure.SIMILARITY), 120, 33, 0.2),
    (dict(kmer_result=1, fd_level=1.0, truncation_method=1,
          measure=Measure.SYMMETRIC_CONTAINMENT), 96, 24, 0.0),
]


# m must be even (config.py rounds odd sketchsize up, so signatures
# narrower than opts.sketchsize cannot arise from the real pipeline);
# 66 is not a multiple of 4, exercising the pack8/pack10 pad fields
@pytest.mark.parametrize("m", [128, 66])
@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
def test_swar_vs_xla_route(cfg_idx, m):
    kind_opts, n, nq, ties = CONFIGS[cfg_idx]
    tol = 2e-6 if kind_opts.get("fd_level", 8.0) >= 2.0 \
        and "truncation_method" not in kind_opts else 3e-7
    res1 = _mkres(cfg_idx * 7 + m, n, m, nq, ties)
    res2 = _mkres(cfg_idx * 7 + m, n, m, nq, ties)
    opts = Dashing2DistOptions(sketchsize=m, **kind_opts)
    a = _run(opts, res1, "swar")
    b = _run(opts, res2, "xla")
    assert a.keys() == b.keys()
    for k in a:
        av, bv = a[k], b[k]
        fin = np.isfinite(av) & np.isfinite(bv)
        assert np.array_equal(np.isfinite(av), np.isfinite(bv)), k
        # INTERSECTION/UNION scale with cardinalities (1e3-1e5); use
        # relative tolerance only
        np.testing.assert_allclose(av[fin], bv[fin], rtol=max(tol, 2e-6),
                                   atol=tol * 1e5)


@pytest.mark.parametrize("m", [128, 66])
@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
def test_pull_pack_knob_fuzz_byte_identical(cfg_idx, m, monkeypatch):
    """The round-5 transfer knobs (u16 counts pull + byte-packed
    trapezoid + upper-only) are BYTE-identical to the plain f32 route
    across the whole config grid: SIMILARITY configs engage the packed
    counts routes, the other measures exercise the exclusion guards,
    and panel configs (nq > 0) the packed panel path."""
    kind_opts, n, nq, ties = CONFIGS[cfg_idx]
    res1 = _mkres(cfg_idx * 13 + m, n, m, nq, ties)
    res2 = _mkres(cfg_idx * 13 + m, n, m, nq, ties)
    opts = Dashing2DistOptions(sketchsize=m, **kind_opts)
    monkeypatch.setenv("DASHING2_TPU_KERNEL", "swar")
    monkeypatch.setenv("DASHING2_TPU_MULTICHIP", "0")
    upper = nq == 0
    monkeypatch.setenv("DASHING2_TPU_PULL_COUNTS", "0")
    ref = dict(pairwise_matrix(opts, res1, upper_only=upper))
    monkeypatch.setenv("DASHING2_TPU_PULL_COUNTS", "force")
    monkeypatch.setenv("DASHING2_TPU_PACK_PULL", "1")
    monkeypatch.setenv("DASHING2_TPU_UPPER", "force")
    got = dict(pairwise_matrix(opts, res2, upper_only=upper))
    assert ref.keys() == got.keys()
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        if upper:
            # the f32 route returns full blocks; the packed route
            # zeros the lower-left — compare the upper trapezoids
            cols = a.shape[1]
            mask = np.arange(cols)[None, :] >= k
            a = np.where(mask, a, 0)
            b = np.where(mask, b, 0)
        assert np.array_equal(a, b, equal_nan=True), k
