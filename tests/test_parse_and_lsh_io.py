"""Tests for the parse.py reader facade and LSH index (de)serialization."""

import os

import numpy as np

from dashing2_tpu import parse
from dashing2_tpu.cmp.lsh import LSHIndex
from dashing2_tpu.io import formats


def test_parse_signatures_roundtrip(tmp_path):
    p = str(tmp_path / "sigs.bin")
    cards = np.array([10.0, 20.0, 30.0])
    sigs = np.random.default_rng(0).random((3, 64))
    formats.write_stacked_signatures(p, cards, sigs, names=["a", "b", "c"])
    out = parse.parse_binary_signatures(p)
    assert out.nseqs == 3
    np.testing.assert_array_equal(out.cardinalities, cards)
    np.testing.assert_array_equal(out.signatures, sigs)


def test_parse_packed_sketch_stacking(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.ss")
        formats.write_sketch_cache(p, 100.0 * (i + 1), rng.random(32))
        paths.append(p)
    dest = str(tmp_path / "packed.bin")
    out = parse.convert_sketches_to_packed_sketch(paths, dest)
    assert out.nseqs == 3
    re = parse.parse_binary_signatures(dest)
    np.testing.assert_array_equal(re.signatures, out.signatures)
    one = parse.parse_binary_sketch(paths[1])
    assert one["cardinality"] == 200.0


def test_parse_knn_and_clustering(tmp_path):
    kp = str(tmp_path / "g.csr")
    indptr = np.array([0, 2, 3, 3], np.uint64)
    indices = np.array([1, 2, 0], np.uint32)
    data = np.array([0.5, 0.25, 0.5], np.float32)
    formats.write_knn_csr(kp, indptr, indices, data)
    g = parse.parse_knn(kp)
    try:
        import scipy  # noqa: F401
        assert g.shape == (3, 3) and g.nnz == 3
    except ImportError:
        np.testing.assert_array_equal(g[0], indptr)
    cp = str(tmp_path / "c.bin")
    formats.write_clustering(cp, [np.array([0, 2]), np.array([1])], 3)
    cl = parse.parse_binary_clustering(cp)
    assert [list(c) for c in cl] == [[0, 2], [1]]


def test_condensed_to_square():
    flat = np.array([1, 2, 3], np.float32)  # pairs (0,1) (0,2) (1,2)
    sq = parse.condensed_to_square(flat, 3)
    assert sq[0, 1] == sq[1, 0] == 1
    assert sq[0, 2] == sq[2, 0] == 2
    assert sq[1, 2] == sq[2, 1] == 3
    assert sq[0, 0] == 0


def test_lsh_index_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    regs = rng.random((40, 64))
    idx = LSHIndex.build(regs, nLSH=3)
    p = str(tmp_path / "index.lsh.gz")
    idx.save(p)
    idx2 = LSHIndex.load(p)
    assert idx2.m == idx.m
    assert idx2.nperhashes == idx.nperhashes
    assert idx2.nperrows == idx.nperrows
    for a, b in zip(idx.keys, idx2.keys):
        np.testing.assert_array_equal(a, b)
    ia, ib, c = idx.candidate_pairs(max_per_item=5)
    ia2, ib2, c2 = idx2.candidate_pairs(max_per_item=5)
    np.testing.assert_array_equal(ia, ia2)
    np.testing.assert_array_equal(ib, ib2)
    np.testing.assert_array_equal(c, c2)
    # incremental interface matches after reload
    idx.insert(0, 0)
    idx2.insert(0, 0)
    np.testing.assert_array_equal(idx.query(1, 8), idx2.query(1, 8))


def test_lsh_index_save_load_bottomk(tmp_path):
    """Bottom-k (exact-mode) indexes must round-trip their ragged
    per-item hash lists (regression: save wrote only the flag and load
    returned an empty non-bottomk index — every query silently yielded
    zero candidates)."""
    rng = np.random.default_rng(6)
    bk = [np.unique(rng.integers(0, 500, size=rng.integers(3, 30))
                    .astype(np.uint64)) for _ in range(25)]
    idx = LSHIndex.build(np.zeros((0, 0)), nLSH=3, bottomk=bk)
    p = str(tmp_path / "bk.lsh.gz")
    idx.save(p)
    idx2 = LSHIndex.load(p)
    assert idx2.bottomk_mode
    assert len(idx2._bottomk) == len(bk)
    for a, b in zip(idx._bottomk, idx2._bottomk):
        np.testing.assert_array_equal(a, b)
    ia, ib, c = idx.candidate_pairs(max_per_item=5)
    ia2, ib2, c2 = idx2.candidate_pairs(max_per_item=5)
    assert len(ia) > 0
    np.testing.assert_array_equal(ia, ia2)
    np.testing.assert_array_equal(ib, ib2)
    np.testing.assert_array_equal(c, c2)
    idx.insert(0, 0)
    idx2.insert(0, 0)
    np.testing.assert_array_equal(idx.query(1, 8), idx2.query(1, 8))


def test_dedup_exhaustive_matches_reference_order():
    """--exhaustive-dedup iterates ORIGINAL input order with no rep
    swap (dedup_core.cpp:262-283 ignores its sorted order array): with
    A (small card) before B (large card) mutually similar, A founds
    Cluster-0 and stays its representative."""
    from dashing2_tpu.cmp import core as C
    from dashing2_tpu.cmp.graph import dedup_core
    from dashing2_tpu.config import Dashing2DistOptions
    from dashing2_tpu.result import SketchingResult

    rng = np.random.default_rng(3)
    m = 64
    base = rng.random(m) + 0.01
    b_regs = base.copy()
    b_regs[:4] = rng.random(4) + 0.01      # B: 60/64 registers equal A's
    sigs = np.stack([base, b_regs,
                     rng.random(m) + 0.01])            # C (dissimilar)
    res = SketchingResult(names=["A", "B", "C"])
    res.signatures = sigs
    res.cardinalities = np.array([5.0, 50.0, 7.0])
    opts = Dashing2DistOptions(k=31, sketchsize=m, exhaustive_dedup=True,
                               min_similarity=0.5)
    creps, res = C._prep(opts, res)
    ids, cons = dedup_core(opts, res, creps)
    assert ids[0] == 0, (ids, cons)          # A founded first, stays rep
    assert 1 in cons[0]                      # B joined A's cluster


def test_native_row_formatter_roundtrip():
    import numpy as np
    from dashing2_tpu.io.emitters import _fmt_row
    v = np.array([0.0, 1.0, 0.5, 3.14159, 1e-8, 2e20, np.inf, -np.inf,
                  np.nan, 0.92578125], np.float32)
    s = _fmt_row(v)
    parts = s.split("\t")[1:]
    assert len(parts) == len(v)
    back = np.array([np.float32(x) for x in parts])
    mask = ~np.isnan(v)
    np.testing.assert_array_equal(back[mask], v[mask])
    assert np.isnan(back[~mask]).all()


def test_pairwise_equality_compare_matches_numpy_loop():
    """parse.pairwise_equality_compare (reference python/parse.py:128)
    == the reference's numpy fallback loop, for float and int inputs."""
    rng = np.random.default_rng(7)
    for arr in (
        rng.integers(0, 4, size=(17, 33)).astype(np.uint64).view(
            np.float64) * 0 + rng.integers(0, 4, size=(17, 33)),
        rng.integers(0, 3, size=(9, 12), dtype=np.int64),
        rng.integers(0, 5, size=(300, 8)).astype(np.uint16),
    ):
        arr = np.ascontiguousarray(arr)
        nr = arr.shape[0]
        want = []
        for i in range(nr - 1):
            want.append((arr[i] == arr[i + 1:]).sum(axis=1))
        want = np.concatenate(want)
        got = parse.pairwise_equality_compare(arr)
        assert got.shape == (nr * (nr - 1) // 2,)
        np.testing.assert_array_equal(got.astype(np.int64), want)
        # dtype contract: counts fit the per-row register count
        assert got.dtype in (np.uint8, np.uint16, np.uint32)


def test_lsh_ssi_format_roundtrip(tmp_path):
    """Reference gz layout (ssi.h:454-532): save_ssi -> load_ssi gives
    the same candidate sets (counts included) as the native index, and
    the bytes parse as the reference struct sequence."""
    import gzip
    import struct
    rng = np.random.default_rng(7)
    regs = rng.random((60, 64))
    idx = LSHIndex.build(regs, nLSH=3)
    p = str(tmp_path / "index.ssi")
    idx.save_ssi(p)
    # independent structural parse per ssi.h:459-484
    with gzip.open(p, "rb") as f:
        total_ids, nms = struct.unpack("<QQ", f.read(16))
        assert total_ids == 60 and nms == len(idx.keys)
        map_counts = [struct.unpack("<Q", f.read(8))[0]
                      for _ in range(nms)]
        assert map_counts == [k.shape[1] for k in idx.keys]
        rpr = [struct.unpack("<Q", f.read(8))[0] for _ in range(nms)]
        assert rpr == list(idx.nperhashes)
        ibk, locked = f.read(1)[0], f.read(1)[0]
        assert ibk == 0 and locked == 0
        for t in range(nms):
            for _j in range(map_counts[t]):
                sz = struct.unpack("<Q", f.read(8))[0]
                for _k in range(sz):
                    psz = struct.unpack("<Q", f.read(8))[0]
                    f.read(4)                      # u32 key
                    ids = np.frombuffer(f.read(4 * psz), "<u4")
                    assert (np.diff(ids) > 0).all()
        assert f.read() == b""
    idx2 = LSHIndex.load_ssi(p)
    ia, ib, c = idx.candidate_pairs(max_per_item=-1)
    ia2, ib2, c2 = idx2.candidate_pairs(max_per_item=-1)
    np.testing.assert_array_equal(ia, ia2)
    np.testing.assert_array_equal(ib, ib2)
    np.testing.assert_array_equal(c, c2)


def test_lsh_ssi_bottomk_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    bk = [np.unique(rng.integers(0, 400, size=rng.integers(3, 25))
                    .astype(np.uint64)) for _ in range(20)]
    idx = LSHIndex.build(np.zeros((0, 0)), nLSH=3, bottomk=bk)
    p = str(tmp_path / "bk.ssi")
    idx.save_ssi(p)
    idx2 = LSHIndex.load_ssi(p)
    ia, ib, c = idx.candidate_pairs(max_per_item=-1)
    ia2, ib2, c2 = idx2.candidate_pairs(max_per_item=-1)
    np.testing.assert_array_equal(ia, ia2)
    np.testing.assert_array_equal(ib, ib2)
    np.testing.assert_array_equal(c, c2)


def test_cli_index_save_load(tmp_path):
    """--index-save then --index-load through the CLI: identical KNN
    output, for both the native and the reference (.ssi) layouts."""
    import random

    from dashing2_tpu.cli import main
    random.seed(21)
    paths = []
    base = "".join(random.choice("ACGT") for _ in range(2500))
    for i in range(8):
        p = str(tmp_path / f"g{i}.fa")
        s = list(base)
        for _ in range(i * 60):
            s[random.randrange(len(s))] = random.choice("ACGT")
        with open(p, "w") as f:
            f.write(f">g{i}\n{''.join(s)}\n")
        paths.append(p)
    for suffix in ("idx.gz", "idx.ssi"):
        ipath = str(tmp_path / f"knn.{suffix}")
        o1 = str(tmp_path / f"a_{suffix}.knn")
        o2 = str(tmp_path / f"b_{suffix}.knn")
        assert main(["cmp", "-k", "21", "-S", "128", "--topk", "3",
                     "--index-save", ipath, "--cmpout", o1] + paths) == 0
        assert os.path.getsize(ipath) > 0
        assert main(["cmp", "-k", "21", "-S", "128", "--topk", "3",
                     "--index-load", ipath, "--cmpout", o2] + paths) == 0
        assert open(o1, "rb").read() == open(o2, "rb").read()
