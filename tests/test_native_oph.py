"""Native host OPH sketcher: bit-exactness vs the device path.

The native engine (native/oph_sketch.cpp) reimplements the default DNA
chain — 2-bit encode + RC canonicalization, maskfn scrambler, ownership
window, downsampling, OPH id hash + bucket min/multiplicity — as a
serial per-row loop threaded across batch rows. Every supported config
must match ops/kmers.hashed_kmers -> oph_sketch_rows bit-for-bit.
"""

import os

import numpy as np
import pytest

import dashing2_tpu  # noqa: F401  (x64 mode)
import jax.numpy as jnp

from dashing2_tpu import hashing as H
from dashing2_tpu import native as NAT
from dashing2_tpu.enums import Alphabet
from dashing2_tpu.ops import sketch_kernels as SK
from dashing2_tpu.sketch.core import (_hash_chunk_batch, _native_oph_rows,
                                      _native_oph_supported)
from make_fixtures import make


def _hkw(k=31, w=None, canon=True, chunk_len=512, xormask=H.XORMASK,
         seed_is_zero=False, ds=(1 << 64) - 1):
    return dict(k=k, w=w or k, canon=canon, alphabet=Alphabet.DNA,
                entmin=False, xormask=xormask, seed_is_zero=seed_is_zero,
                downsample_threshold=ds, chunk_len=chunk_len, span=k,
                spacing_offsets=None, rolling=False, use128=False)


def _codes(rng, R, L, invalid_frac=0.02):
    c = rng.integers(0, 4, size=(R, L)).astype(np.uint8)
    bad = rng.random((R, L)) < invalid_frac
    c[bad] = 0xFF
    return c


lib = NAT.load_oph_lib()
pytestmark = pytest.mark.skipif(lib is None,
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("k,canon,seed_is_zero,ds_frac", [
    (31, True, False, None),
    (32, True, False, None),     # full-width mask edge
    (21, False, False, None),
    (4, True, True, None),       # raw codes, tiny k
    (31, True, False, 0.5),      # downsampling active
])
def test_native_matches_device(k, canon, seed_is_zero, ds_frac):
    rng = np.random.default_rng(hash((k, canon, seed_is_zero)) % 2**32)
    R, L, m = 5, 700, 128
    ds = (1 << 64) - 1 if ds_frac is None else int(ds_frac * 2**64)
    hkw = _hkw(k=k, canon=canon, chunk_len=L - 80,
               seed_is_zero=seed_is_zero, ds=ds)
    assert _native_oph_supported(hkw, use_fs=False)
    chunks = _codes(rng, R, L)
    for want_counts in (True, False):
        hashed, valid = _hash_chunk_batch(
            jnp.asarray(chunks), jnp.zeros(1, jnp.uint64),
            use_filterset=False, **hkw)
        r_dev, c_dev = SK.oph_sketch_rows_dense(
            hashed, valid, m=m, seed=H.OPH_DEFAULT_SEED,
            want_counts=want_counts)
        r_nat, c_nat = _native_oph_rows(lib, chunks, hkw, m,
                                        H.OPH_DEFAULT_SEED, want_counts)
        assert np.array_equal(np.asarray(r_dev), r_nat)
        assert np.array_equal(np.asarray(c_dev), c_nat)


@pytest.mark.parametrize("k,w,invalid_frac,ds_frac", [
    (21, 31, 0.02, None),    # typical minimizer config
    (31, 50, 0.0, None),     # clean row, wide window
    (32, 40, 0.05, None),    # k=32 edge (all-T code == invalid sentinel)
    (4, 12, 0.10, None),     # tiny k, heavy invalids, dense ties
    (21, 31, 0.02, 0.5),     # minimizers + downsampling
])
def test_native_minimizers_match_device(k, w, invalid_frac, ds_frac):
    """w > k window-minimizer selection (lexicographic, leftmost tie
    break, kmers.py:360-394 incl. the out-of-range maxv padding edges)
    must be bit-identical between the native engine and the device
    path."""
    rng = np.random.default_rng(hash((k, w, invalid_frac)) % 2**32)
    R, L, m = 5, 700, 128
    ds = (1 << 64) - 1 if ds_frac is None else int(ds_frac * 2**64)
    hkw = _hkw(k=k, w=w, chunk_len=L - 100, ds=ds)
    assert _native_oph_supported(hkw, use_fs=False)
    chunks = _codes(rng, R, L, invalid_frac=invalid_frac)
    if k == 4:
        # low-entropy periodic rows force dense score ties so the
        # leftmost tie break is exercised (invalids re-sprinkled)
        motif = rng.integers(0, 4, size=(R, 5)).astype(np.uint8)
        chunks = np.tile(motif, (1, L // 5 + 1))[:, :L]
        chunks[rng.random((R, L)) < invalid_frac] = 0xFF
    for want_counts in (True, False):
        hashed, valid = _hash_chunk_batch(
            jnp.asarray(chunks), jnp.zeros(1, jnp.uint64),
            use_filterset=False, **hkw)
        r_dev, c_dev = SK.oph_sketch_rows_dense(
            hashed, valid, m=m, seed=H.OPH_DEFAULT_SEED,
            want_counts=want_counts)
        r_nat, c_nat = _native_oph_rows(lib, chunks, hkw, m,
                                        H.OPH_DEFAULT_SEED, want_counts)
        assert np.array_equal(np.asarray(r_dev), r_nat), (k, w)
        assert np.array_equal(np.asarray(c_dev), c_nat), (k, w)


def test_native_threads_layout_independent():
    """Row partitioning across thread counts must not change results."""
    rng = np.random.default_rng(7)
    R, L, m = 9, 900, 64
    hkw = _hkw(chunk_len=L - 80)
    chunks = _codes(rng, R, L)
    outs = [_native_oph_rows(lib, chunks, hkw, m, H.OPH_DEFAULT_SEED,
                             True, nthreads=nt) for nt in (1, 3, 8)]
    for r, c in outs[1:]:
        assert np.array_equal(outs[0][0], r)
        assert np.array_equal(outs[0][1], c)


def test_native_unsupported_configs_rejected():
    assert not _native_oph_supported(_hkw(k=40), False)       # k > 32
    assert _native_oph_supported(_hkw(w=50), False)   # minimizers: native
    h = _hkw(w=50)
    h["entmin"] = True                           # entropy scoring: not
    assert not _native_oph_supported(h, False)
    assert not _native_oph_supported(_hkw(), True)            # filterset
    h = _hkw(); h["rolling"] = True
    assert not _native_oph_supported(h, False)
    h = _hkw(); h["alphabet"] = Alphabet.PROTEIN
    assert not _native_oph_supported(h, False)


@pytest.mark.parametrize("engine", ["dense", "dense2", "sort", "scatter"])
def test_device_engines_e2e_match_default(engine, tmp_path, monkeypatch):
    """Explicit device OPH engines through the CLI (which on the test
    mesh also exercises the multichip row-sharded dispatch — batch rows
    shard over the 8 virtual devices) produce byte-identical output to
    the default CPU segments path."""
    from dashing2_tpu.cli import main
    paths = make(str(tmp_path / "fa"), n_genomes=4, length=6000)
    out_d, out_e = str(tmp_path / "d.bin"), str(tmp_path / "e.bin")
    args = ["sketch", "-S", "128", "-k", "31", "--binary-output",
            "--cmpout"]
    monkeypatch.delenv("DASHING2_TPU_OPH_ENGINE", raising=False)
    assert main(args + [out_d] + paths) == 0
    monkeypatch.setenv("DASHING2_TPU_OPH_ENGINE", engine)
    assert main(args + [out_e] + paths) == 0
    with open(out_d, "rb") as f1, open(out_e, "rb") as f2:
        assert f1.read() == f2.read()


def test_dense_path_mixed_shape_drain(tmp_path, monkeypatch):
    """A tail batch (padded to a smaller power of two) sharing a drain
    window with full batches must not break the async dispatch loop
    (regression: jnp.stack over mixed shapes raised on any corpus whose
    chunk count was not a multiple of rows_per_batch)."""
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.sketch.core import sketch_fastx
    monkeypatch.setenv("DASHING2_TPU_OPH_ENGINE", "dense")
    paths = make(str(tmp_path / "fa"), n_genomes=21, length=3000)
    opts = Dashing2Options(k=21, sketchsize=64)
    res = sketch_fastx(opts, paths, rows_per_batch=16)  # 1 full + tail
    monkeypatch.delenv("DASHING2_TPU_OPH_ENGINE")
    ref = sketch_fastx(Dashing2Options(k=21, sketchsize=64), paths,
                       rows_per_batch=16)
    assert np.array_equal(np.asarray(res.signatures),
                          np.asarray(ref.signatures))


def test_native_engine_e2e_matches_default(tmp_path, monkeypatch):
    """DASHING2_TPU_OPH_ENGINE=native through the CLI produces
    byte-identical output to the default engine."""
    from dashing2_tpu.cli import main
    paths = make(str(tmp_path / "fa"), n_genomes=4, length=6000)
    out_d, out_n = str(tmp_path / "d.bin"), str(tmp_path / "n.bin")
    args = ["sketch", "-S", "128", "-k", "31", "--binary-output",
            "--cmpout"]
    monkeypatch.delenv("DASHING2_TPU_OPH_ENGINE", raising=False)
    assert main(args + [out_d] + paths) == 0
    monkeypatch.setenv("DASHING2_TPU_OPH_ENGINE", "native")
    assert main(args + [out_n] + paths) == 0
    with open(out_d, "rb") as f1, open(out_n, "rb") as f2:
        assert f1.read() == f2.read()
