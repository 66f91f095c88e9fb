import gzip

import numpy as np
import pytest

from dashing2_tpu.ops.pallas_cmp import (counts_int_pallas,
                                         counts_nibble_mxu, gtlt_pallas)


def naive(a, b):
    eq = np.array([[(x == y).sum() for y in b] for x in a])
    gt = np.array([[(x > y).sum() for y in b] for x in a])
    lt = np.array([[(x < y).sum() for y in b] for x in a])
    return eq, gt, lt


def test_gtlt_pallas_interpret_matches():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 64, size=(20, 64), dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=(13, 64), dtype=np.uint64)
    # plant some equal registers
    b[:, ::3] = a[0, ::3]
    _, gt_n, lt_n = naive(a, b)
    gt, lt = gtlt_pallas(a, b, tm=8, tn=128)
    assert np.array_equal(np.asarray(gt), gt_n)
    assert np.array_equal(np.asarray(lt), lt_n)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.uint32])
def test_counts_int_pallas(dt):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 200, size=(17, 96)).astype(dt)
    b = rng.integers(0, 200, size=(9, 96)).astype(dt)
    eq_n, gt_n, lt_n = naive(a, b)
    eq, gt, lt = counts_int_pallas(a, b, tm=8, tn=128)
    assert np.array_equal(np.asarray(eq), eq_n)
    assert np.array_equal(np.asarray(gt), gt_n)
    assert np.array_equal(np.asarray(lt), lt_n)


def test_counts_nibble_mxu():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 16, size=(11, 64)).astype(np.uint8)
    b = rng.integers(0, 16, size=(7, 64)).astype(np.uint8)
    eq_n, gt_n, lt_n = naive(a, b)
    eq, gt, lt = counts_nibble_mxu(a, b)
    assert np.array_equal(np.asarray(eq), eq_n)
    assert np.array_equal(np.asarray(gt), gt_n)
    assert np.array_equal(np.asarray(lt), lt_n)


def test_native_reader_matches_python(tmp_path):
    from dashing2_tpu.enums import Alphabet
    from dashing2_tpu.io.fastx import read_encoded, read_fastx
    from dashing2_tpu.native import load_fastx_lib
    from dashing2_tpu.ops.kmers import alphabet_lut
    fa = tmp_path / "x.fa"
    fa.write_text(">s1 desc\nACGTNNacgt\nGGGG\n>s2\nTTTT\n\n>s3\nA\n")
    fq = tmp_path / "y.fq.gz"
    with gzip.open(fq, "wt") as f:
        f.write("@r1\nACGTA\n+\nIIIII\n@r2 z\nGGCCN\n+r2 z\n!!!!!\n")
    if load_fastx_lib() is None:
        pytest.skip("no native toolchain")
    for p in (str(fa), str(fq)):
        native = [(n, c.tolist()) for n, c in read_encoded(p, Alphabet.DNA)]
        py = [(n, alphabet_lut(Alphabet.DNA)[
            np.frombuffer(s, np.uint8)].tolist())
            for n, s in read_fastx(p)]
        assert native == py, p


def test_native_reader_malformed(tmp_path):
    from dashing2_tpu.enums import Alphabet
    from dashing2_tpu.io.fastx import read_encoded
    from dashing2_tpu.native import load_fastx_lib
    if load_fastx_lib() is None:
        pytest.skip("no native toolchain")
    bad = tmp_path / "bad.fa"
    bad.write_text("this is not fasta\n")
    with pytest.raises(ValueError):
        list(read_encoded(str(bad), Alphabet.DNA))


def test_gtlt_self_pallas_triangular():
    """Scalar-prefetch triangular Pallas kernel == full-square counts."""
    import numpy as np
    from dashing2_tpu.ops.pallas_cmp import gtlt_self_pallas
    from dashing2_tpu.ops.cmp_kernels import count_gtlt
    rng = np.random.default_rng(12)
    a = rng.integers(0, 1 << 64, size=(200, 128), dtype=np.uint64)
    gt, lt = gtlt_self_pallas(a, t=64)
    gt2, lt2 = count_gtlt(a, a)
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(gt2))
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lt2))


def test_tri_comb_counts_match_reference():
    """Triangular single-matmul engine (interpret mode off-TPU) must
    produce exact eq/gt/lt incl. padding rows sliced off and the
    eq_chunk==64 decode boundary (identical rows)."""
    import jax.numpy as jnp
    from dashing2_tpu.ops.pallas_cmp import counts_nibble_tri_self
    rng = np.random.default_rng(11)
    for n, m in ((300, 128), (512, 64)):
        a = rng.integers(0, 16, size=(n, m)).astype(np.uint8)
        a[7] = a[3]         # identical pair
        a[20] = 0           # constant rows
        a[21] = 15
        eq, gt, lt = counts_nibble_tri_self(jnp.asarray(a), bm=128)
        eq_ref = (a[:, None, :] == a[None, :, :]).sum(2)
        gt_ref = (a[:, None, :] > a[None, :, :]).sum(2)
        assert np.array_equal(np.asarray(eq), eq_ref), (n, m)
        assert np.array_equal(np.asarray(gt), gt_ref), (n, m)
        assert np.array_equal(np.asarray(lt), m - eq_ref - gt_ref), (n, m)


def test_tri_eq_counts_match_reference():
    import jax.numpy as jnp
    from dashing2_tpu.ops.pallas_cmp import eq_nibble_tri_self
    rng = np.random.default_rng(12)
    a = rng.integers(0, 16, size=(300, 128)).astype(np.uint8)
    a[5] = a[2]
    eq = np.asarray(eq_nibble_tri_self(jnp.asarray(a), bm=128))
    ref = (a[:, None, :] == a[None, :, :]).sum(2)
    assert np.array_equal(eq, ref)
