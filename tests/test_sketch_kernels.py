import numpy as np
import jax.numpy as jnp
import pytest

from dashing2_tpu import hashing as H
from dashing2_tpu.ops import hashes as DH
from dashing2_tpu.ops import sketch_kernels as SK


def _rand_hashes(n, seed=0):
    return np.random.default_rng(seed).integers(0, 1 << 64, size=n,
                                                dtype=np.uint64)


def test_oph_matches_scalar_reference():
    """Replicate oph.h:176-211 streaming semantics in pure Python and
    compare with the batched segment-min kernel."""
    m = 64
    hashed = _rand_hashes(5000, 1)
    # pure-python reference
    s = H.mt19937_64_first(H.OPH_DEFAULT_SEED)
    regs = np.full(m, SK.U64MAX, dtype=np.uint64)
    counts = np.zeros(m, dtype=np.uint32)
    for h in hashed:
        hid = int(H.wanghash(np.uint64(int(h) ^ s ^ H.CEIXOR_OPH)))
        idx = hid % m
        if hid < regs[idx]:
            regs[idx] = hid
            counts[idx] = 1
        elif hid == regs[idx]:
            counts[idx] += 1
    got_r, got_c = SK.oph_sketch_segments(
        jnp.asarray(hashed), jnp.ones(len(hashed), bool),
        jnp.zeros(len(hashed), jnp.int32), nseqs=1, m=m)
    assert np.array_equal(np.asarray(got_r)[0], regs)
    assert np.array_equal(np.asarray(got_c)[0], counts)


def test_oph_multi_sequence_batching():
    m = 32
    h1 = _rand_hashes(1000, 2)
    h2 = _rand_hashes(800, 3)
    both = np.concatenate([h1, h2])
    seq_ids = np.concatenate([np.zeros(1000, np.int32), np.ones(800, np.int32)])
    r, c = SK.oph_sketch_segments(jnp.asarray(both),
                                  jnp.ones(len(both), bool),
                                  jnp.asarray(seq_ids), nseqs=2, m=m)
    r1, _ = SK.oph_sketch_segments(jnp.asarray(h1), jnp.ones(1000, bool),
                                   jnp.zeros(1000, jnp.int32), nseqs=1, m=m)
    r2, _ = SK.oph_sketch_segments(jnp.asarray(h2), jnp.ones(800, bool),
                                   jnp.zeros(800, jnp.int32), nseqs=1, m=m)
    assert np.array_equal(np.asarray(r)[0], np.asarray(r1)[0])
    assert np.array_equal(np.asarray(r)[1], np.asarray(r2)[0])


def test_oph_cardinality_accuracy():
    # like test/oph.cpp but asserted: relative error within statistical bounds
    m = 1024
    for true_n, tol in ((10_000, 0.15), (100_000, 0.15)):
        hashed = _rand_hashes(true_n, true_n)
        r, _ = SK.oph_sketch_segments(jnp.asarray(hashed),
                                      jnp.ones(true_n, bool),
                                      jnp.zeros(true_n, jnp.int32),
                                      nseqs=1, m=m)
        card = SK.oph_cardinality(np.asarray(r))[0]
        assert abs(card - true_n) / true_n < tol, (card, true_n)


def test_oph_sigs_order_preserving_and_zero_for_empty():
    m = 16
    hashed = _rand_hashes(40, 7)
    r, _ = SK.oph_sketch_segments(jnp.asarray(hashed), jnp.ones(40, bool),
                                  jnp.zeros(40, jnp.int32), nseqs=1, m=m)
    regs = np.asarray(r)[0]
    sigs = SK.oph_to_sigs(regs)[0] if SK.oph_to_sigs(regs).ndim == 2 else SK.oph_to_sigs(regs)
    empty = regs == SK.U64MAX
    assert (sigs[empty] == 0).all()
    live = ~empty
    lr = regs[live].astype(np.float64)
    ls = sigs[live]
    order_r = np.argsort(lr)
    order_s = np.argsort(ls)
    assert np.array_equal(order_r, order_s)


def test_oph_densify_fills_and_is_deterministic():
    regs = np.array([5.0, 0.0, 7.0, 0.0, 1.0, 2.0, 0.0, 9.0])
    out1, ne1 = SK.oph_densify(regs)
    out2, ne2 = SK.oph_densify(regs)
    assert ne1 == 3 and np.array_equal(out1, out2)
    assert (out1 != 0).all()
    # non-empty entries unchanged
    assert (out1[regs != 0] == regs[regs != 0]).all()
    # all-empty stays empty
    z, ne = SK.oph_densify(np.zeros(8))
    assert ne == 8 and (z == 0).all()


def test_oph_densify_rows_matches_scalar():
    """Vectorized all-rows densify must be bit-exact with the per-row
    scalar loop, including kmer co-assignment."""
    rng = np.random.default_rng(7)
    m = 64
    sigs = np.abs(rng.normal(size=(40, m)))
    # varied sparsity incl. a nearly-empty row (deep redraw chains) and
    # boundary rows (no empties / all empty)
    for i in range(40):
        k = int(rng.integers(0, m))
        sigs[i, rng.choice(m, size=k, replace=False)] = 0.0
    sigs[0, :] = 1.0
    sigs[1, :] = 0.0
    sigs[2, 1:] = 0.0
    kmers = rng.integers(0, 2 ** 63, size=(40, m)).astype(np.uint64)

    ref_sigs = sigs.copy()
    ref_kmers = kmers.copy()
    for i in range(40):
        row, _ = SK.oph_densify(ref_sigs[i], ref_kmers[i])
        ref_sigs[i] = row

    got_sigs = sigs.copy()
    got_kmers = kmers.copy()
    ne = SK.oph_densify_rows(got_sigs, got_kmers, block=16)
    assert np.array_equal(got_sigs, ref_sigs)
    assert np.array_equal(got_kmers, ref_kmers)
    assert np.array_equal(ne, (sigs == 0).sum(axis=1))

    # u64 raw-register form (empty = u64max)
    regs = rng.integers(1, 2 ** 63, size=(8, m)).astype(np.uint64)
    regs[regs % np.uint64(3) == 0] = np.uint64(0xFFFFFFFFFFFFFFFF)
    ref = np.stack([SK.oph_densify(r)[0] for r in regs])
    got = regs.copy()
    SK.oph_densify_rows(got)
    assert np.array_equal(got, ref)


def test_css_filter_pass_matches_bruteforce():
    """The threshold-filtered sketch must equal the brute-force min over
    ALL items' draws under the same RNG construction."""
    m = 64
    n = 3000
    hashed = _rand_hashes(n, 11)
    regs = SK.css_sketch(hashed, np.ones(n, bool), m)
    # brute force with identical RNG mapping
    rv = H.css_item_hash(hashed)
    u1 = rv.astype(np.float64) * 2.0 ** -64
    x1 = np.where(rv == 0, np.inf, -np.log(np.maximum(u1, 1e-300)) / m)
    _, draw = H.wyhash64_step(rv)
    idx0 = (draw % np.uint64(m)).astype(np.int64)
    j = (np.arange(m, dtype=np.uint64) * np.uint64(SK._GOLD))
    full = np.empty((n, m))
    for d in range(n):
        u = H.wanghash(np.uint64(rv[d]) ^ j).astype(np.float64) * 2.0 ** -64
        e = x1[d] - np.log(np.maximum(u, 1e-300))
        e[idx0[d]] = x1[d]
        full[d] = e
    want = full.min(axis=0)
    np.testing.assert_allclose(regs, want, rtol=1e-12)


def test_css_duplicates_are_set_semantics():
    m = 32
    h = _rand_hashes(500, 13)
    dup = np.concatenate([h, h, h[:100]])
    r1 = SK.css_sketch(h, np.ones(len(h), bool), m)
    r2 = SK.css_sketch(dup, np.ones(len(dup), bool), m)
    np.testing.assert_array_equal(r1, r2)


def test_css_cardinality_accuracy():
    m = 1024
    for true_n in (5_000, 50_000):
        hashed = _rand_hashes(true_n, true_n + 1)
        regs = SK.css_sketch(hashed, np.ones(true_n, bool), m)
        card = SK.css_cardinality(regs)
        assert abs(card - true_n) / true_n < 0.15, (card, true_n)


def test_css_jaccard_via_shared_registers():
    m = 2048
    universe = _rand_hashes(30_000, 21)
    a = universe[:20_000]
    b = universe[10_000:]   # |A&B| = 10k, |A|B| = 30k -> J = 1/3
    ra = SK.css_sketch(a, np.ones(len(a), bool), m)
    rb = SK.css_sketch(b, np.ones(len(b), bool), m)
    jac = (ra == rb).mean()
    assert abs(jac - 1 / 3) < 0.05, jac


def test_sort_count_unique():
    vals = np.array([5, 3, 5, 5, 9, 3, 7], dtype=np.uint64)
    valid = np.array([1, 1, 1, 1, 1, 1, 0], bool)
    uniq, counts, nuniq = SK.sort_count_unique(jnp.asarray(vals),
                                               jnp.asarray(valid), 8)
    assert int(nuniq) == 3
    assert np.asarray(uniq)[:3].tolist() == [3, 5, 9]
    assert np.asarray(counts)[:3].tolist() == [2, 3, 1]
    assert (np.asarray(uniq)[3:] == SK.U64MAX).all()


def test_bottomk():
    vals = np.array([9, 2, 2, 7, 1], dtype=np.uint64)
    out = SK.bottomk(vals, np.ones(5, bool), 4)
    assert out.tolist() == [1, 2, 7, 9]
    out2 = SK.bottomk(vals, np.ones(5, bool), 6)
    assert out2[:4].tolist() == [1, 2, 7, 9]
    assert (out2[4:] == SK.U64MAX).all()


def test_fused_oph_step_matches_unfused():
    """The round-3 fused encode+hash+OPH jit must equal the unfused
    pipeline (hash batch -> oph_sketch_rows -> pack) bit-for-bit."""
    import jax.numpy as jnp

    from dashing2_tpu import hashing as H
    from dashing2_tpu.enums import Alphabet
    from dashing2_tpu.ops import sketch_kernels as SK
    from dashing2_tpu.sketch.core import (_fused_oph_fn, _hash_chunk_batch,
                                          _hkw_key)

    rng = np.random.default_rng(13)
    R, L, m = 4, 512, 64
    chunks = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    fs = jnp.zeros(1, jnp.uint64)
    hkw = dict(k=21, w=31, canon=True, alphabet=Alphabet.DNA,
               entmin=False, xormask=H.XORMASK, seed_is_zero=False,
               downsample_threshold=(1 << 64) - 1, chunk_len=L,
               span=21, spacing_offsets=None, rolling=False, use128=False)
    for want_counts in (False, True):
        fused = _fused_oph_fn(_hkw_key(hkw), m, H.OPH_DEFAULT_SEED,
                              want_counts, False)
        out = np.asarray(fused(chunks, fs))
        hashed, valid = _hash_chunk_batch(chunks, fs,
                                          use_filterset=False, **hkw)
        r, c = SK.oph_sketch_rows(hashed, valid, m=m,
                                  seed=H.OPH_DEFAULT_SEED,
                                  want_counts=want_counts)
        if want_counts:
            ref = np.concatenate([np.asarray(r),
                                  np.asarray(c).astype(np.uint64)], axis=1)
        else:
            # the counts half (all zeros) is not shipped: pulls are the
            # drain bottleneck over a remote chip
            ref = np.asarray(r)
        assert np.array_equal(out, ref)


def test_oph_sort_engine_matches_dense():
    """The rotation-sort engine must be bit-identical to the dense
    one-hot engine (registers AND min-multiplicity counts), including
    duplicate ids (repeated k-mers -> multiplicity > 1), sparse
    validity, and rows whose buckets are partly empty."""
    from dashing2_tpu import hashing as H
    from dashing2_tpu.ops import sketch_kernels as SK

    rng = np.random.default_rng(23)
    for R, nk, m, dup, pvalid in ((6, 5000, 64, False, 0.9),
                                  (3, 700, 256, True, 0.97),
                                  (2, 100, 128, True, 0.5),
                                  (4, 2048, 1024, True, 1.0)):
        h = rng.integers(1, 1 << 63, size=(R, nk)).astype(np.uint64)
        if dup:
            # repeat a quarter of the stream to force count ties
            src = rng.integers(0, nk, size=nk // 4)
            dst = rng.integers(0, nk, size=nk // 4)
            h[:, dst] = h[:, src]
        hj = jnp.asarray(h)
        v = jnp.asarray(rng.random((R, nk)) < pvalid)
        for wc in (True, False):
            r1, c1 = SK.oph_sketch_rows_dense(
                hj, v, m=m, seed=H.OPH_DEFAULT_SEED, want_counts=wc)
            r2, c2 = SK.oph_sketch_rows_sort(
                hj, v, m=m, seed=H.OPH_DEFAULT_SEED, want_counts=wc)
            assert np.array_equal(np.asarray(r1), np.asarray(r2))
            assert np.array_equal(np.asarray(c1), np.asarray(c2))
            r3, c3 = SK.oph_sketch_rows_dense2(
                hj, v, m=m, seed=H.OPH_DEFAULT_SEED, want_counts=wc)
            assert np.array_equal(np.asarray(r1), np.asarray(r3))
            assert np.array_equal(np.asarray(c1), np.asarray(c3))
            r4, c4 = SK.oph_sketch_rows_rot(
                hj, v, m=m, seed=H.OPH_DEFAULT_SEED, want_counts=wc)
            assert np.array_equal(np.asarray(r1), np.asarray(r4))
            assert np.array_equal(np.asarray(c1), np.asarray(c4))


def test_oph_rot_engine_u32max_aliasing():
    """Adversarial cases for the subtract-trick rot engine: post-hash
    ids crafted so the ROTATED high u32 word is all-ones (bucket m-1
    with a maximal top segment) while other buckets are empty — the
    empty-bucket U32MAX sentinel must not capture those positions —
    plus hi-word ties within a bucket (pass 2 tie-breaks) and
    all-invalid rows."""
    from dashing2_tpu import hashing as H
    from dashing2_tpu.ops import sketch_kernels as SK

    rng = np.random.default_rng(41)
    R, nk, m = 3, 256, 64
    lgm = 6
    # rotated value rot = bucket << 58 | rest; choose rot hi32 = all-ones
    # => bucket = m-1, top segment maximal. id = rotl(rot, lgm).
    rot = (np.uint64(0xFFFFFFFF) << np.uint64(32)) \
        | rng.integers(0, 1 << 32, size=(R, nk)).astype(np.uint64)
    ids = (rot << np.uint64(lgm)) | (rot >> np.uint64(64 - lgm))
    # half the stream: normal random ids landing in a few buckets only
    ids[:, ::2] = rng.integers(1, 1 << 63, size=(R, nk // 2)
                               ).astype(np.uint64)
    pre = H.oph_hash_inverse(ids, H.OPH_DEFAULT_SEED)
    hj = jnp.asarray(pre)
    for v in (jnp.asarray(rng.random((R, nk)) < 0.9),
              jnp.zeros((R, nk), bool)):
        r1, c1 = SK.oph_sketch_rows_dense(hj, v, m=m,
                                          seed=H.OPH_DEFAULT_SEED)
        r2, c2 = SK.oph_sketch_rows_rot(hj, v, m=m,
                                        seed=H.OPH_DEFAULT_SEED)
        assert np.array_equal(np.asarray(r1), np.asarray(r2))
        assert np.array_equal(np.asarray(c1), np.asarray(c2))
    # hi-word ties: same crafted-collision stream as the dense2 test
    his = rng.integers(0, 4, size=(R, nk)).astype(np.uint64) << np.uint64(32)
    ids2 = his | rng.integers(0, 1 << 32, size=(R, nk)).astype(np.uint64)
    hj2 = jnp.asarray(H.oph_hash_inverse(ids2, H.OPH_DEFAULT_SEED))
    v = jnp.asarray(rng.random((R, nk)) < 0.95)
    r1, c1 = SK.oph_sketch_rows_dense(hj2, v, m=m, seed=H.OPH_DEFAULT_SEED)
    r2, c2 = SK.oph_sketch_rows_rot(hj2, v, m=m, seed=H.OPH_DEFAULT_SEED)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    # non-pow2 m delegates
    r1, c1 = SK.oph_sketch_rows_dense(hj2, v, m=96, seed=H.OPH_DEFAULT_SEED)
    r2, c2 = SK.oph_sketch_rows_rot(hj2, v, m=96, seed=H.OPH_DEFAULT_SEED)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_oph_dense2_hi_word_ties():
    """dense2's pass B must break ties among k-mers whose POST-HASH ids
    share the high u32 word. The id hash is invertible, so hi-word
    collisions are forced by inverting crafted ids back to pre-hash
    values and feeding those as the stream."""
    from dashing2_tpu import hashing as H
    from dashing2_tpu.ops import sketch_kernels as SK

    rng = np.random.default_rng(31)
    R, nk, m = 3, 512, 32
    # target post-hash ids: few distinct hi words, random lo words
    his = rng.integers(0, 8, size=(R, nk)).astype(np.uint64) << np.uint64(32)
    ids = his | rng.integers(0, 1 << 32, size=(R, nk)).astype(np.uint64)
    pre = H.oph_hash_inverse(ids, H.OPH_DEFAULT_SEED)
    hj = jnp.asarray(pre)
    v = jnp.asarray(rng.random((R, nk)) < 0.95)
    r1, c1 = SK.oph_sketch_rows_dense(hj, v, m=m,
                                      seed=H.OPH_DEFAULT_SEED)
    r2, c2 = SK.oph_sketch_rows_dense2(hj, v, m=m,
                                       seed=H.OPH_DEFAULT_SEED)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_oph_sort_engine_non_pow2_delegates():
    from dashing2_tpu import hashing as H
    from dashing2_tpu.ops import sketch_kernels as SK

    rng = np.random.default_rng(29)
    h = jnp.asarray(rng.integers(1, 1 << 63, size=(2, 300)
                                 ).astype(np.uint64))
    v = jnp.ones((2, 300), bool)
    r1, c1 = SK.oph_sketch_rows_dense(h, v, m=96,
                                      seed=H.OPH_DEFAULT_SEED)
    r2, c2 = SK.oph_sketch_rows_sort(h, v, m=96, seed=H.OPH_DEFAULT_SEED)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_oph_scatter_engine_matches_dense():
    """The segment_min scatter engine must be bit-identical to the
    dense one-hot engine (registers AND min-multiplicity counts)."""
    from dashing2_tpu import hashing as H
    from dashing2_tpu.ops import sketch_kernels as SK

    rng = np.random.default_rng(19)
    R, nk, m = 6, 5000, 64
    h = jnp.asarray(rng.integers(1, 1 << 63, size=(R, nk)
                                 ).astype(np.uint64))
    v = jnp.asarray(rng.random((R, nk)) < 0.9)
    r1, c1 = SK.oph_sketch_rows_dense(h, v, m=m, seed=H.OPH_DEFAULT_SEED,
                                      want_counts=True)
    r2, c2 = SK.oph_sketch_rows_scatter(h, v, m=m,
                                        seed=H.OPH_DEFAULT_SEED,
                                        want_counts=True)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
