"""Batched exact-set intersection join vs the scalar merge primitives."""

import numpy as np

from dashing2_tpu.cmp import wcompare as W
from dashing2_tpu.result import SketchingResult


def _mk_result(rng, n, weighted, maxkeys=200):
    sets, counts = [], []
    universe = rng.integers(0, 500, size=2000).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15)
    for _ in range(n):
        k = int(rng.integers(0, maxkeys))
        s = np.unique(rng.choice(universe, size=k)) if k else np.zeros(
            0, np.uint64)
        sets.append(s)
        counts.append(rng.integers(1, 9, size=len(s)).astype(np.float64))
    r = SketchingResult()
    r.kmer_sets = sets
    r.kmer_set_counts = counts if weighted else None
    return r


def _scalar_matrix(r, rows, cols):
    out = np.zeros((len(rows), len(cols)))
    for ii, i in enumerate(rows):
        for jj, j in enumerate(cols):
            if r.kmer_set_counts is not None:
                out[ii, jj] = W.weighted_intersection_size(
                    r.kmer_sets[i], r.kmer_set_counts[i],
                    r.kmer_sets[j], r.kmer_set_counts[j])
            else:
                out[ii, jj] = W.set_intersection_size(
                    r.kmer_sets[i], r.kmer_sets[j])
    return out


def test_exact_intersections_matches_scalar_set_and_weighted():
    rng = np.random.default_rng(3)
    for weighted in (False, True):
        r = _mk_result(rng, 18, weighted)
        rows = np.arange(7)
        cols = np.arange(18)
        got = W.exact_intersections(r, rows, cols)
        ref = _scalar_matrix(r, rows, cols)
        assert np.array_equal(got, ref), (weighted, got - ref)


def test_exact_intersections_empty_sets():
    rng = np.random.default_rng(4)
    r = _mk_result(rng, 6, False)
    r.kmer_sets[2] = np.zeros(0, np.uint64)
    got = W.exact_intersections(r, np.arange(6), np.arange(6))
    ref = _scalar_matrix(r, np.arange(6), np.arange(6))
    assert np.array_equal(got, ref)
    assert (got[2] == 0).all() and (got[:, 2] == 0).all()


def test_exact_intersections_pairs_matches_matrix():
    rng = np.random.default_rng(5)
    for weighted in (False, True):
        r = _mk_result(rng, 12, weighted)
        ia = rng.integers(0, 12, size=40)
        ib = rng.integers(0, 12, size=40)
        got = W.exact_intersections_pairs(r, ia, ib)
        ref = np.array([_scalar_matrix(r, [i], [j])[0, 0]
                        for i, j in zip(ia, ib)])
        assert np.array_equal(got, ref)


def test_device_exact_pairs_engine_matches_host_join():
    """Round-3 device sorted-merge pair intersections (one row-wise
    lax.sort per pair block) == the host posting join, weighted and
    set modes."""
    import jax.numpy as jnp

    from dashing2_tpu.cmp import wcompare as W
    from dashing2_tpu.result import SketchingResult

    rng = np.random.default_rng(9)
    n = 30
    sets, counts = [], []
    for _ in range(n):
        k = int(rng.integers(1, 400))
        u = np.unique(rng.integers(0, 2000, size=k).astype(np.uint64))
        sets.append(u)
        counts.append(rng.integers(1, 9, size=len(u)).astype(np.float64))
    ia = rng.integers(0, n, size=2000)
    ib = rng.integers(0, n, size=2000)
    for with_counts in (True, False):
        res = SketchingResult(names=[str(i) for i in range(n)])
        res.kmer_sets = sets
        if with_counts:
            res.kmer_set_counts = counts
        host = W.exact_intersections_pairs(res, ia, ib)
        keys, cnt, valid, weighted = W._device_sets_cache(res)
        fn = W._isect_pairs_fn(weighted)
        dev = np.asarray(fn(keys, cnt, valid,
                            jnp.asarray(ia.astype(np.int32)),
                            jnp.asarray(ib.astype(np.int32)))
                         ).astype(float)
        assert np.array_equal(host, dev)


def test_device_exact_pairs_max_key_vs_pad_sentinel():
    """A VALID key equal to u64::max (poly-T k-mer under seed-zero/raw
    codes) collides with the pad sentinel; the two-key sort (invalidity
    as tiebreaker) must still count it as shared when both sets hold it,
    regardless of padding between the sets."""
    import jax.numpy as jnp

    from dashing2_tpu.cmp import wcompare as W
    from dashing2_tpu.result import SketchingResult

    M = np.uint64(0xFFFFFFFFFFFFFFFF)
    sets = [
        np.array([5, 9, M], np.uint64),          # short set (pads exist)
        np.array([1, 2, 3, 4, 5, 6, 7, M], np.uint64),  # longest: L=8
        np.array([9], np.uint64),                # max absent
    ]
    res = SketchingResult(names=["a", "b", "c"])
    res.kmer_sets = sets
    keys, cnt, valid, weighted = W._device_sets_cache(res)
    fn = W._isect_pairs_fn(weighted)
    ia = jnp.asarray(np.array([0, 0, 1, 2], np.int32))
    ib = jnp.asarray(np.array([1, 2, 2, 0], np.int32))
    got = np.asarray(fn(keys, cnt, valid, ia, ib))
    # (0,1): {5, M}; (0,2): {9}; (1,2): {}; (2,0): {9}
    assert got.tolist() == [2, 1, 0, 1]
