import numpy as np
import jax.numpy as jnp
import pytest

from dashing2_tpu.ops import cmp_kernels as CK


def naive_counts(a, b):
    N, M = a.shape[0], b.shape[0]
    eq = np.zeros((N, M), np.int32)
    gt = np.zeros((N, M), np.int32)
    lt = np.zeros((N, M), np.int32)
    for i in range(N):
        for j in range(M):
            eq[i, j] = (a[i] == b[j]).sum()
            gt[i, j] = (a[i] > b[j]).sum()
            lt[i, j] = (a[i] < b[j]).sum()
    return eq, gt, lt


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.uint64])
def test_counts_match_naive(dtype):
    rng = np.random.default_rng(hash(dtype.__name__) % 100)
    hi = 8 if dtype == np.uint8 else 1000
    a = rng.integers(0, hi, size=(37, 96)).astype(dtype)
    b = rng.integers(0, hi, size=(45, 96)).astype(dtype)
    eq_n, gt_n, lt_n = naive_counts(a, b)
    eq = np.asarray(CK.count_eq(a, b, tm=16, tn=16))
    gt, lt = CK.count_gtlt(a, b, tm=16, tn=16)
    assert np.array_equal(eq, eq_n)
    assert np.array_equal(np.asarray(gt), gt_n)
    assert np.array_equal(np.asarray(lt), lt_n)


def test_u64_high_bit_ordering():
    # values straddling the 2^63 boundary must order as unsigned
    a = np.array([[1, 1 << 63, (1 << 64) - 1]], dtype=np.uint64)
    b = np.array([[2, 1, 1 << 63]], dtype=np.uint64)
    gt, lt = CK.count_gtlt(a, b, tm=8, tn=8)
    assert int(np.asarray(gt)[0, 0]) == 2  # 2^63 > 1, 2^64-1 > 2^63
    assert int(np.asarray(lt)[0, 0]) == 1  # 1 < 2


def test_f64_ordered_bitcast_roundtrip():
    rng = np.random.default_rng(5)
    x = np.abs(rng.normal(size=(8, 64))) + 1e-12
    x[0, 0] = 0.0
    u = CK.f64_to_ordered_u64(x)
    # order preserved per register column across rows
    eq_f, gt_f, lt_f = naive_counts(x, x[::-1])
    gt, lt = CK.count_gtlt(u, u[::-1], tm=8, tn=8)
    assert np.array_equal(np.asarray(gt), gt_f)
    assert np.array_equal(np.asarray(lt), lt_f)
    eq = np.asarray(CK.count_eq(u, u[::-1], tm=8, tn=8))
    assert np.array_equal(eq, eq_f)
    with pytest.raises(ValueError):
        CK.f64_to_ordered_u64(np.array([-1.0]))


def test_nibble_counts():
    rng = np.random.default_rng(9)
    na = rng.integers(0, 16, size=(10, 64)).astype(np.uint8)
    nb = rng.integers(0, 16, size=(12, 64)).astype(np.uint8)
    packed_a = (na[:, 0::2] | (na[:, 1::2] << 4)).astype(np.uint8)
    packed_b = (nb[:, 0::2] | (nb[:, 1::2] << 4)).astype(np.uint8)
    eq_n, gt_n, lt_n = naive_counts(na, nb)
    eq = np.asarray(CK.count_eq_nibbles(packed_a, packed_b, tm=8, tn=8))
    assert np.array_equal(eq, eq_n)
    gt, lt = CK.count_gtlt_nibbles(packed_a, packed_b, tm=8, tn=8)
    assert np.array_equal(np.asarray(gt), gt_n)
    assert np.array_equal(np.asarray(lt), lt_n)


def test_nonmultiple_tile_padding():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 50, size=(33, 40)).astype(np.uint16)
    b = rng.integers(0, 50, size=(7, 40)).astype(np.uint16)
    eq_n, gt_n, lt_n = naive_counts(a, b)
    assert np.array_equal(np.asarray(CK.count_eq(a, b)), eq_n)
    gt, lt = CK.count_gtlt(a, b)
    assert np.array_equal(np.asarray(gt), gt_n)
    assert np.array_equal(np.asarray(lt), lt_n)


def test_self_pairs_kernels_match_general():
    from dashing2_tpu.ops.cmp_kernels import (count_eq, count_eq_self,
                                              count_gtlt, count_gtlt_self)
    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 64, size=(130, 64), dtype=np.uint64)
    gt, lt = count_gtlt_self(a, t=32)
    gt2, lt2 = count_gtlt(a, a)
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(gt2))
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lt2))
    eq = count_eq_self(a, t=32)
    eq2 = count_eq(a, a)
    np.testing.assert_array_equal(np.asarray(eq), np.asarray(eq2))
    b = rng.integers(0, 250, size=(97, 64)).astype(np.uint8)
    gt, lt = count_gtlt_self(b, t=32)
    gt2, lt2 = count_gtlt(b, b)
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(gt2))
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lt2))


def test_pairwise_matrix_self_path_matches_blocked(tmp_path):
    """The circulant self-pairs fast path must emit the same matrix as the
    general blocked path (forced via DASHING2_TPU_SELF_MAX=0)."""
    import os
    from dashing2_tpu.cmp.core import pairwise_matrix
    from dashing2_tpu.config import Dashing2DistOptions
    from dashing2_tpu.result import SketchingResult

    rng = np.random.default_rng(6)
    n, m = 100, 128
    sigs = np.abs(rng.normal(size=(n, m))) + 1e-9
    res = SketchingResult(names=[f"s{i}" for i in range(n)])
    res.signatures = sigs
    res.cardinalities = rng.uniform(1e3, 1e5, size=n)
    opts = Dashing2DistOptions(sketchsize=m,
                               kmer_result=1)  # FULL_SETSKETCH
    blocks_self = dict(pairwise_matrix(opts, res))
    os.environ["DASHING2_TPU_SELF_MAX"] = "0"
    try:
        import copy
        res2 = SketchingResult(names=list(res.names))
        res2.signatures = sigs.copy()
        res2.cardinalities = res.cardinalities.copy()
        blocks_gen = dict(pairwise_matrix(opts, res2))
    finally:
        del os.environ["DASHING2_TPU_SELF_MAX"]
    assert blocks_self.keys() == blocks_gen.keys()
    for k in blocks_self:
        np.testing.assert_array_equal(blocks_self[k], blocks_gen[k])


def test_brent_minimizer():
    from dashing2_tpu.cmp.estimators import brent_find_minima
    x, fx = brent_find_minima(lambda x: (x - 0.3) ** 2 + 1.0, 0.0, 1.0)
    assert abs(x - 0.3) < 1e-6 and abs(fx - 1.0) < 1e-10


def test_jmle_simple_recovers_jaccard():
    """On synthetic gt/lt counts drawn at a known Jaccard, the MLE lands
    near the truth (setsketch.h:93-112 semantics)."""
    from dashing2_tpu.cmp.estimators import jmle_simple
    m, b = 4096, 1.2
    # symmetric case: equal cardinalities; E[gt] = E[lt] = m(1-J)/2
    for j_true in (0.1, 0.5, 0.9):
        gt = lt = int(m * (1 - j_true) / 2)
        est = jmle_simple(gt, lt, m, 1e6, 1e6, b)
        assert abs(est - j_true) < 0.05, (j_true, est)
    assert jmle_simple(0, 0, m, 0.0, 0.0, b) == 0.0


def test_device_pair_counts_fn_matches_numpy():
    """The jitted pair-list count kernel (u32 limb compares) must match
    host u64 comparisons for both one- and two-limb forms."""
    import jax.numpy as jnp
    from dashing2_tpu.cmp.core import _pair_counts_fn
    rng = np.random.default_rng(3)
    n, m, P = 64, 96, 4096
    data = rng.integers(0, 1 << 63, size=(n, m), dtype=np.uint64)
    data[3] = data[7]
    ia = rng.integers(0, n, size=P)
    ib = rng.integers(0, n, size=P)
    hi = (data >> np.uint64(32)).astype(np.uint32)
    lo = data.astype(np.uint32)
    fn = _pair_counts_fn(True, 1024)
    eq, gt, lt = fn(jnp.asarray(hi), jnp.asarray(lo),
                    jnp.asarray(ia.astype(np.int32)),
                    jnp.asarray(ib.astype(np.int32)))
    A, B = data[ia], data[ib]
    assert np.array_equal(np.asarray(eq), (A == B).sum(1))
    assert np.array_equal(np.asarray(gt), (A > B).sum(1))
    assert np.array_equal(np.asarray(lt), (A < B).sum(1))

    small = (data & np.uint64(0xFF)).astype(np.uint32)
    fn1 = _pair_counts_fn(False, 1024)
    eq, gt, lt = fn1(jnp.asarray(small), jnp.asarray(small),
                     jnp.asarray(ia.astype(np.int32)),
                     jnp.asarray(ib.astype(np.int32)))
    A, B = small[ia], small[ib]
    assert np.array_equal(np.asarray(eq), (A == B).sum(1))
    assert np.array_equal(np.asarray(gt), (A > B).sum(1))
    assert np.array_equal(np.asarray(lt), (A < B).sum(1))


def test_pair_counts_swar_fn_matches_numpy():
    """The SWAR pair-list kernels (packed popcount gt tiles, eq via the
    trichotomy) must be bit-identical to host comparisons: pack10 over
    raw u8 registers, pack16 over per-column dense ranks of u64
    registers (rank reduction is order-isomorphic per column so eq/gt/lt
    are unchanged). Covers odd m (pad fields must not leak into counts)."""
    import jax.numpy as jnp
    from dashing2_tpu.cmp.core import _pair_counts_swar_fn, _swar_pack_fn
    rng = np.random.default_rng(11)
    n, m, P = 96, 101, 2048   # m not divisible by 2 or 3
    ia = rng.integers(0, n, size=P).astype(np.int32)
    ib = rng.integers(0, n, size=P).astype(np.int32)

    d8 = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    d8[5] = d8[9]
    pk = _swar_pack_fn("pack10")(jnp.asarray(d8))
    eq, gt, lt = _pair_counts_swar_fn("gtlt10", m, 1024)(
        pk, jnp.asarray(ia), jnp.asarray(ib))
    A, B = d8[ia], d8[ib]
    assert np.array_equal(np.asarray(eq), (A == B).sum(1))
    assert np.array_equal(np.asarray(gt), (A > B).sum(1))
    assert np.array_equal(np.asarray(lt), (A < B).sum(1))

    d64 = rng.integers(0, 1 << 63, size=(n, m), dtype=np.uint64)
    d64[3] = d64[7]
    d64[:, 40] = d64[0, 40]   # heavy column ties exercise dense ranks
    pk = _swar_pack_fn("rank16")(jnp.asarray(d64))
    eq, gt, lt = _pair_counts_swar_fn("gtlt16", m, 1024)(
        pk, jnp.asarray(ia), jnp.asarray(ib))
    A, B = d64[ia], d64[ib]
    assert np.array_equal(np.asarray(eq), (A == B).sum(1))
    assert np.array_equal(np.asarray(gt), (A > B).sum(1))
    assert np.array_equal(np.asarray(lt), (A < B).sum(1))


def test_device_pair_counts_sharded_matches_host():
    """The full _device_pair_counts routing with the pair vector sharded
    over the (virtual 8-device) mesh: SWAR packing decisions, padding to
    block*ndev, and the shard_map fns must reproduce host comparisons
    exactly for u8 (pack10), rank-packed u64, and the large-n limb
    fallback."""
    import jax
    from dashing2_tpu.cmp.core import _device_pair_counts
    ndev = len(jax.devices())
    if ndev < 2:
        import pytest
        pytest.skip("needs a multi-device mesh")
    rng = np.random.default_rng(23)
    n, m = 96, 33
    block = 256
    P = block * ndev + 77          # forces padding
    ia = rng.integers(0, n, size=P).astype(np.int64)
    ib = rng.integers(0, n, size=P).astype(np.int64)
    import os
    os.environ["DASHING2_TPU_PAIR_DEVICE"] = "force"
    try:
        for data in (
            rng.integers(0, 256, size=(n, m), dtype=np.uint8),
            rng.integers(0, 1 << 63, size=(n, m), dtype=np.uint64),
        ):
            out = _device_pair_counts(data, ia, ib, block=block)
            A, B = data[ia], data[ib]
            assert np.array_equal(out[0], (A == B).sum(1))
            assert np.array_equal(out[1], (A > B).sum(1))
            assert np.array_equal(out[2], (A < B).sum(1))
            # eq-only engines (pack8 / rank eq15): eq exact, gt/lt zero
            out = _device_pair_counts(data, ia, ib, block=block,
                                      want="eq")
            assert np.array_equal(out[0], (A == B).sum(1))
            assert not out[1].any() and not out[2].any()
        # limb fallback: n > 32767 rank bound with a small pair list
        # (thin m keeps it cheap)
        big = rng.integers(0, 1 << 63, size=(32770, 3), dtype=np.uint64)
        out = _device_pair_counts(big, ia % 32770, ib % 32770,
                                  block=block)
        A, B = big[ia % 32770], big[ib % 32770]
        assert np.array_equal(out[0], (A == B).sum(1))
        assert np.array_equal(out[1], (A > B).sum(1))
        assert np.array_equal(out[2], (A < B).sum(1))
        # large pair list over the same matrix -> two-level rank30 pack
        ial = rng.integers(0, 32770, size=70000).astype(np.int64)
        ibl = rng.integers(0, 32770, size=70000).astype(np.int64)
        for want in ("gtlt", "eq"):
            out = _device_pair_counts(big, ial, ibl, block=block,
                                      want=want)
            A, B = big[ial], big[ibl]
            assert np.array_equal(out[0], (A == B).sum(1))
            if want == "gtlt":
                assert np.array_equal(out[1], (A > B).sum(1))
                assert np.array_equal(out[2], (A < B).sum(1))
    finally:
        del os.environ["DASHING2_TPU_PAIR_DEVICE"]


def test_pair_matrix_route_matches_host():
    """The memoized count-matrix route (full self-pairs matrix built
    once, pair lists served by flat extraction) must be bit-identical
    to host comparisons for every SWAR packing and both want modes,
    and must actually serve from the cached matrix on repeat calls."""
    import os
    from dashing2_tpu.cmp.core import _device_pair_counts
    rng = np.random.default_rng(31)
    n, m, P = 97, 101, 4096   # odd sizes exercise pad corrections
    ia = rng.integers(0, n, size=P).astype(np.int64)
    ib = rng.integers(0, n, size=P).astype(np.int64)
    os.environ["DASHING2_TPU_PAIR_DEVICE"] = "force"
    os.environ["DASHING2_TPU_PAIR_MATRIX"] = "force"
    try:
        for data in (
            rng.integers(0, 256, size=(n, m), dtype=np.uint8),
            rng.integers(0, 1 << 63, size=(n, m), dtype=np.uint64),
        ):
            data[3] = data[7]
            A, B = data[ia], data[ib]
            for want in ("gtlt", "eq"):
                cache = {}
                out = _device_pair_counts(data, ia, ib, cache=cache,
                                          cache_key=f"t-{want}",
                                          want=want)
                assert f"t-{want}_mat" in cache, "matrix not memoized"
                assert np.array_equal(out[0], (A == B).sum(1))
                if want == "gtlt":
                    assert np.array_equal(out[1], (A > B).sum(1))
                    assert np.array_equal(out[2], (A < B).sum(1))
                else:
                    assert not out[1].any() and not out[2].any()
                # repeat over the cache with a different pair list
                out2 = _device_pair_counts(data, ib[:64], ia[:64],
                                           cache=cache,
                                           cache_key=f"t-{want}",
                                           want=want)
                assert np.array_equal(
                    out2[0], (data[ib[:64]] == data[ia[:64]]).sum(1))
        # rank30 packing (n past the 2^15 single-half rank bound is too
        # slow for CPU tests; force the pack via a large pair hint
        # instead is covered by the sharded test) — here check the
        # cumulative-pairs policy trips without force
        os.environ["DASHING2_TPU_PAIR_MATRIX"] = "1"
        data = rng.integers(0, 1 << 63, size=(64, 33), dtype=np.uint64)
        cache = {}
        A, B = data[ia % 64], data[ib % 64]
        for rep in range(3):   # 3 * 4096 pairs > 64*64/32 = 128
            out = _device_pair_counts(data, ia % 64, ib % 64,
                                      cache=cache, cache_key="cum",
                                      want="gtlt")
            assert np.array_equal(out[1], (A > B).sum(1))
        assert "cum_mat" in cache, "cumulative policy never built"
    finally:
        del os.environ["DASHING2_TPU_PAIR_DEVICE"]
        os.environ.pop("DASHING2_TPU_PAIR_MATRIX", None)


def test_prep_handles_readonly_signatures():
    """_prep finalizes OPH signatures in place (rescale + densify); a
    read-only input (np.load mmap_mode='r', writeable=False views) must
    be copied, not crash — and the result must match the writeable run."""
    from dashing2_tpu.cmp import core as C
    from dashing2_tpu.config import Dashing2DistOptions
    from dashing2_tpu.enums import KmerSketchResultType
    from dashing2_tpu.result import SketchingResult

    rng = np.random.default_rng(41)
    m = 64
    sigs = rng.random((6, m))
    sigs[0, :50] = 0.0                      # sparse row -> rescale+densify
    opts = Dashing2DistOptions(k=31, sketchsize=m,
                               kmer_result=KmerSketchResultType.ONE_PERM)

    def mk(arr):
        r = SketchingResult(names=[str(i) for i in range(6)])
        r.signatures = arr
        r.cardinalities = np.full(6, 100.0)
        return r

    ro = sigs.copy()
    ro.setflags(write=False)
    res_ro = mk(ro)
    _, res_ro = C._prep(opts, res_ro)
    res_rw = mk(sigs.copy())
    _, res_rw = C._prep(opts, res_rw)
    assert res_ro.signatures.flags.writeable
    assert np.array_equal(res_ro.signatures, res_rw.signatures)
