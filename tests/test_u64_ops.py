import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dashing2_tpu import hashing as H
from dashing2_tpu.ops import u64 as L
from dashing2_tpu.ops import hashes as DH


@pytest.fixture(scope="module")
def rand_u64():
    rng = np.random.default_rng(7)
    return rng.integers(0, 1 << 64, size=2048, dtype=np.uint64)


def test_limb_roundtrip(rand_u64):
    pair = L.from_u64(rand_u64)
    assert np.array_equal(np.asarray(L.to_u64(pair)), rand_u64)


def test_limb_add_sub_mul(rand_u64):
    a = rand_u64[:1024]
    b = rand_u64[1024:]
    pa, pb = L.from_u64(a), L.from_u64(b)
    with np.errstate(over="ignore"):
        assert np.array_equal(np.asarray(L.to_u64(L.add(pa, pb))), a + b)
        assert np.array_equal(np.asarray(L.to_u64(L.sub(pa, pb))), a - b)
        assert np.array_equal(np.asarray(L.to_u64(L.mul(pa, pb))), a * b)


def test_limb_mul_wide(rand_u64):
    a = rand_u64[:512]
    b = rand_u64[512:1024]
    hi, lo = L.mul_wide(L.from_u64(a), L.from_u64(b))
    hi_np = np.asarray(L.to_u64(hi))
    lo_np = np.asarray(L.to_u64(lo))
    for i in range(512):
        p = int(a[i]) * int(b[i])
        assert int(lo_np[i]) == p & ((1 << 64) - 1), i
        assert int(hi_np[i]) == p >> 64, i


@pytest.mark.parametrize("s", [1, 7, 21, 31, 32, 33, 47, 63])
def test_limb_shifts(rand_u64, s):
    a = rand_u64[:256]
    pa = L.from_u64(a)
    with np.errstate(over="ignore"):
        assert np.array_equal(np.asarray(L.to_u64(L.shl(pa, s))),
                              a << np.uint64(s))
        assert np.array_equal(np.asarray(L.to_u64(L.shr(pa, s))),
                              a >> np.uint64(s))


def test_limb_compare(rand_u64):
    a = rand_u64[:1024]
    b = rand_u64[1024:]
    pa, pb = L.from_u64(a), L.from_u64(b)
    assert np.array_equal(np.asarray(L.gt(pa, pb)), a > b)
    assert np.array_equal(np.asarray(L.lt(pa, pb)), a < b)
    assert np.array_equal(np.asarray(L.eq(pa, pa)), np.ones(1024, bool))


@pytest.mark.parametrize("m", [6, 1024, 1000, 4096, 999983])
def test_mod_small(rand_u64, m):
    got = np.asarray(L.mod_small(L.from_u64(rand_u64), m))
    assert np.array_equal(got, (rand_u64 % np.uint64(m)).astype(np.uint32))


def test_device_wanghash_matches_host(rand_u64):
    got = np.asarray(jax.jit(DH.wanghash)(jnp.asarray(rand_u64)))
    assert np.array_equal(got, H.wanghash(rand_u64))
    got_l = np.asarray(L.to_u64(DH.wanghash_limbs(L.from_u64(rand_u64))))
    assert np.array_equal(got_l, H.wanghash(rand_u64))


def test_device_maskfn_cehasher_ophhash(rand_u64):
    x = jnp.asarray(rand_u64)
    assert np.array_equal(np.asarray(DH.maskfn(x)), H.maskfn(rand_u64))
    assert np.array_equal(np.asarray(DH.cehasher(x)), H.cehasher(rand_u64))
    assert np.array_equal(np.asarray(DH.oph_hash(x)), H.oph_hash(rand_u64))
    assert np.array_equal(
        np.asarray(L.to_u64(DH.maskfn_limbs(L.from_u64(rand_u64)))),
        H.maskfn(rand_u64))
    assert np.array_equal(
        np.asarray(L.to_u64(DH.oph_hash_limbs(L.from_u64(rand_u64)))),
        H.oph_hash(rand_u64))
    assert np.array_equal(
        np.asarray(L.to_u64(DH.cehasher_limbs(L.from_u64(rand_u64)))),
        H.cehasher(rand_u64))


def test_device_wyhash_step(rand_u64):
    s_host, o_host = H.wyhash64_step(rand_u64)
    s_dev, o_dev = DH.wyhash64_step(jnp.asarray(rand_u64))
    assert np.array_equal(np.asarray(s_dev), s_host)
    assert np.array_equal(np.asarray(o_dev), o_host)
    s_l, o_l = DH.wyhash64_step_limbs(L.from_u64(rand_u64))
    assert np.array_equal(np.asarray(L.to_u64(o_l)), o_host)


def test_unit_float(rand_u64):
    got = np.asarray(DH.u64_to_unit_float(jnp.asarray(rand_u64)))
    want = rand_u64.astype(np.float64) * 2.0 ** -64
    assert np.array_equal(got, want)
