"""Native blocked-Myers edit distance vs the Python reference."""

import numpy as np
import pytest

from dashing2_tpu.cmp.editdist import (myers_batch_native,
                                       myers_edit_distance)
from dashing2_tpu.native import load_myers_lib


@pytest.mark.skipif(load_myers_lib() is None, reason="no C++ toolchain")
def test_native_matches_python_random():
    rng = np.random.default_rng(0)
    seqs = []
    for _ in range(20):
        L = int(rng.integers(0, 400))
        seqs.append(bytes(rng.choice(list(b"ACGT"), size=L)))
    seqs.append(b"")  # empty edge case
    ia = rng.integers(0, len(seqs), size=60)
    ib = rng.integers(0, len(seqs), size=60)
    got = myers_batch_native(seqs, ia, ib, nthreads=4)
    ref = np.array([myers_edit_distance(seqs[int(i)], seqs[int(j)])
                    for i, j in zip(ia, ib)], np.float64)
    assert np.array_equal(got, ref)


@pytest.mark.skipif(load_myers_lib() is None, reason="no C++ toolchain")
def test_native_long_multiblock():
    """Cross the 64-cell block boundary (W > 1) and mutation structure."""
    rng = np.random.default_rng(1)
    base = rng.choice(list(b"ACGT"), size=1000)
    mut = base.copy()
    pos = rng.choice(1000, size=37, replace=False)
    mut[pos] = rng.choice(list(b"ACGT"), size=37)
    ins = np.insert(mut, [100, 500, 900], [65, 67, 71])
    seqs = [bytes(base), bytes(mut), bytes(ins), bytes(base[:64]),
            bytes(base[:65]), bytes(base[:127]), bytes(base[:128])]
    ia, ib = np.meshgrid(np.arange(7), np.arange(7))
    ia, ib = ia.ravel(), ib.ravel()
    got = myers_batch_native(seqs, ia, ib)
    ref = np.array([myers_edit_distance(seqs[int(i)], seqs[int(j)])
                    for i, j in zip(ia, ib)], np.float64)
    assert np.array_equal(got, ref), np.abs(got - ref).max()
    # identity pairs are 0
    assert got[ia == ib].sum() == 0


@pytest.mark.skipif(load_myers_lib() is None, reason="no C++ toolchain")
def test_banded_matches_unbanded_structured():
    """The Ukkonen-banded path (m > 128 triggers it) must equal the
    unbanded kernel across divergence structures that stress band
    growth: unrelated pairs, sparse substitutions, long deletions,
    front-shifts, tandem repeats."""
    import ctypes
    from dashing2_tpu.native import load_myers_lib
    lib = load_myers_lib()
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.myers_one_full.restype = ctypes.c_int64
    lib.myers_one_full.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]

    def call(fn, a, b):
        aa = np.frombuffer(a, np.uint8) if a else np.zeros(1, np.uint8)
        bb = np.frombuffer(b, np.uint8) if b else np.zeros(1, np.uint8)
        return fn(aa.ctypes.data_as(u8p), len(a), bb.ctypes.data_as(u8p),
                  len(b))

    rng = np.random.default_rng(2)
    acgt = list(b"ACGT")
    for trial in range(60):
        L1 = int(rng.integers(129, 1200))
        base = rng.choice(acgt, size=L1).astype(np.uint8)
        mode = trial % 5
        if mode == 0:
            other = rng.choice(acgt, size=int(rng.integers(129, 1200))
                               ).astype(np.uint8)
        elif mode == 1:
            other = base.copy()
            p = rng.choice(L1, size=max(1, L1 // 50), replace=False)
            other[p] = rng.choice(acgt, size=len(p))
        elif mode == 2:
            other = np.delete(base, slice(L1 // 3, L1 // 3 + L1 // 4))
        elif mode == 3:
            other = np.concatenate(
                [rng.choice(acgt, size=150).astype(np.uint8), base])
        else:
            other = np.concatenate([base, base[:L1 // 2]])
        a, b = bytes(base), bytes(other)
        assert call(lib.myers_one, a, b) == call(lib.myers_one_full, a, b), \
            (trial, mode, len(a), len(b))


def test_native_under_ubsan(tmp_path, monkeypatch):
    """Sanitizer build path (the reference's dashing2-add analogue):
    rebuild the native components under UBSan in a fresh cache dir and
    exercise them — UB aborts the process, so passing = clean."""
    import subprocess
    import sys
    code = (
        "import os; os.environ['DASHING2_TPU_SANITIZE']='undefined';"
        "os.environ['DASHING2_TPU_CACHE']=%r;"
        "import numpy as np;"
        "from dashing2_tpu.cmp.editdist import myers_batch_native;"
        "from dashing2_tpu.native import load_myers_lib;"
        "assert load_myers_lib() is not None;"
        "s=[b'ACGT'*300, b'ACGA'*300];"
        "out=myers_batch_native(s, np.array([0]), np.array([1]));"
        "assert out[0] == 300, out" % str(tmp_path))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True)
    if b"g++" in r.stderr and r.returncode != 0:
        pytest.skip("no toolchain")
    assert r.returncode == 0, r.stderr.decode()[-1500:]
