"""True 128-bit exact k-mer sets (--set --long-kmers).

The reference's exact compare paths hold FULL __uint128_t keys
(src/wcompare.cpp:28-51,111, loaded at src/cmp_main.cpp:305-352);
register sketches truncate to the low word (enums.h:144-148 +
oph.h update(uint64_t), preserved). Round 5 closes the former
low-word truncation of exact sets: structured ('hi','lo') arrays
(dashing2_tpu/u128.py) flow through sketching, caches, presketched
load, the posting-join comparators, and LSH bottom-k candidates.
"""

import glob
import os
import random

import numpy as np
import pytest

import dashing2_tpu  # noqa: F401
from dashing2_tpu import u128 as U
from dashing2_tpu.cli import main
from dashing2_tpu.result import SketchingResult


def _write_corpus(d, n=4, length=3000, seed=3):
    random.seed(seed)
    base = "".join(random.choice("ACGT") for _ in range(length))
    paths = []
    for i in range(n):
        p = str(d / f"g{i}.fa")
        s = list(base)
        for _ in range(i * length // 25):
            s[random.randrange(len(s))] = random.choice("ACGT")
        with open(p, "w") as f:
            f.write(f">g{i}\n{''.join(s)}\n")
        paths.append(p)
    return paths


def test_u128_dtype_order_matches_numeric():
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 62, 200, dtype=np.uint64)
    lo = rng.integers(0, 1 << 62, 200, dtype=np.uint64)
    arr = U.from_words(hi, lo)
    s = np.sort(arr)
    nums = sorted((int(h) << 64) | int(x) for h, x in zip(hi, lo))
    got = [(int(e["hi"]) << 64) | int(e["lo"]) for e in s]
    assert got == nums


def test_exact_intersections_full_width(tmp_path):
    """Sets whose keys COLLIDE in the low word intersect only on full
    128-bit equality — the truncated route would report full overlap."""
    from dashing2_tpu.cmp.wcompare import (exact_intersections,
                                           exact_intersections_pairs)
    lo = np.arange(100, dtype=np.uint64)
    a = np.sort(U.from_words(np.zeros(100, np.uint64), lo))
    b = np.sort(U.from_words(np.ones(100, np.uint64), lo))
    c = np.sort(U.from_words(np.concatenate(
        [np.zeros(50, np.uint64), np.ones(50, np.uint64)]), lo))
    res = SketchingResult(names=["a", "b", "c"])
    res.kmer_sets = [a, b, c]
    res.cardinalities = np.array([100.0, 100.0, 100.0])
    isz = exact_intersections(res, np.arange(3), np.arange(3))
    expect = np.array([[100, 0, 50], [0, 100, 50], [50, 50, 100]],
                      np.float64)
    assert np.array_equal(isz, expect)
    prs = exact_intersections_pairs(res, np.array([0, 0, 1, 2]),
                                    np.array([1, 2, 2, 0]))
    assert np.array_equal(prs, [0, 50, 50, 50])


def test_u128_sketch_oracle(tmp_path):
    """Sketched .kmerset128 caches hold the exact masked u128 k-mer
    sets: intersections computed by the pipeline equal a python-set
    oracle over the cache files' full (hi, lo) tuples."""
    paths = _write_corpus(tmp_path)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["cmp", "-k", "40", "--set", "--long-kmers", "-W",
                     "--cmpout", "out.tsv"] + paths) == 0
        caches = sorted(glob.glob("*.kmerset128"))
        assert len(caches) == len(paths)
        sets = []
        for c in caches:
            # skip the reference-layout 8-byte f64 cardinality header
            raw = np.fromfile(c, np.uint64, offset=8).reshape(-1, 2)
            sets.append({(int(h), int(x))
                         for x, h in zip(raw[:, 0], raw[:, 1])})
        body = open("out.tsv").read().strip().split("\n")[3:]
        vals = [l.split("\t")[1:] for l in body]
        for i in range(len(paths)):
            for j in range(i + 1, len(paths)):
                isz = len(sets[i] & sets[j])
                un = len(sets[i] | sets[j])
                got = float(vals[i][j])
                assert got == pytest.approx(isz / un, rel=1e-6), (i, j)
    finally:
        os.chdir(cwd)


def test_u128_cache_roundtrip_and_presketched(tmp_path):
    paths = _write_corpus(tmp_path, n=3)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = ["cmp", "-k", "40", "--set", "--long-kmers", "-W",
                "--cmpout"]
        assert main(args + ["a.tsv"] + paths) == 0
        # cache-hit rerun: byte-identical matrix
        assert main(args + ["b.tsv"] + paths) == 0
        tail = lambda p: open(p).read().split("\n")[3:]   # noqa: E731
        assert tail("a.tsv") == tail("b.tsv")
        # presketched load of the .kmerset128 artifacts (full keys)
        caches = sorted(glob.glob("*.kmerset128"))
        assert main(["cmp", "--presketched", "--cmpout", "c.tsv"]
                    + caches) == 0
        va = [l.split("\t")[1:] for l in tail("a.tsv") if l]
        vc = [l.split("\t")[1:] for l in tail("c.tsv") if l]
        assert va == vc
        # on-disk layout: f64 cardinality header, then little-endian
        # (lo, hi) entries ascending as u128 (fastxsketch.cpp:467-489)
        card = float(np.fromfile(caches[0], np.float64, count=1)[0])
        raw = np.fromfile(caches[0], np.uint64, offset=8).reshape(-1, 2)
        assert card == float(len(raw))
        keys = [(int(h), int(x)) for x, h in zip(raw[:, 0], raw[:, 1])]
        assert keys == sorted(keys)
    finally:
        os.chdir(cwd)


def test_u128_presketched_low_word_collision(tmp_path):
    """Two handmade .kmerset128 files sharing every LOW word but no
    full key: similarity must be 0 (the pre-round-5 truncation
    reported 1.0)."""
    lo = (np.arange(64, dtype=np.uint64) + 7) * np.uint64(0x9E3779B9)
    for name, hi in (("x", 1), ("y", 2)):
        arr = np.sort(U.from_words(np.full(64, hi, np.uint64), lo))
        with open(str(tmp_path / f"{name}.kmerset128"), "wb") as f:
            np.float64(len(arr)).tofile(f)     # reference card header
            U.tofile_bytes(arr).tofile(f)
    out = str(tmp_path / "o.tsv")
    assert main(["cmp", "--presketched", "--cmpout", out,
                 str(tmp_path / "x.kmerset128"),
                 str(tmp_path / "y.kmerset128")]) == 0
    body = [l for l in open(out).read().strip().split("\n")[3:] if l]
    assert float(body[0].split("\t")[2]) == 0.0


def test_u128_countdict_weighted(tmp_path):
    """--countdict --long-kmers: weighted intersections over full
    u128 keys with per-key multiplicities."""
    paths = _write_corpus(tmp_path, n=3, length=2000, seed=9)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["cmp", "-k", "40", "--countdict", "--long-kmers",
                     "-W", "--cmpout", "w.tsv"] + paths) == 0
        body = [l for l in open("w.tsv").read().strip().split("\n")[3:]]
        assert len(body) == 3
        # caches: .kmerset128 keys + f64 counts of equal length
        kf = sorted(glob.glob("*.kmerset128"))
        assert kf, "no kmer cache written"
    finally:
        os.chdir(cwd)


def test_u128_dedup_knn_candidates(tmp_path):
    """KNN graph over u128 exact sets: LSH bottom-k candidates bucket
    on low words, refinement uses full-key intersections."""
    paths = _write_corpus(tmp_path, n=6, length=1500, seed=11)
    out = str(tmp_path / "knn.tsv")
    assert main(["cmp", "-k", "40", "--set", "--long-kmers",
                 "--topk", "2", "--cmpout", out] + paths) == 0
    assert os.path.getsize(out) > 0


def test_mod_u128_exact():
    rng = np.random.default_rng(1)
    hi = rng.integers(0, 1 << 63, 50, dtype=np.uint64)
    lo = rng.integers(0, 1 << 63, 50, dtype=np.uint64)
    arr = U.from_words(hi, lo)
    for d in (7, 1000003, (1 << 30) + 1, (1 << 40) + 9):
        got = U.mod_u128(arr, d)
        exp = [((int(h) << 64) | int(x)) % d for h, x in zip(hi, lo)]
        assert got.tolist() == exp


def test_u128_mmer_sequences_end_to_end(tmp_path):
    """--seq --long-kmers: full 128-bit minimizer tokens through
    sketching, caches, presketched reload, stacked emit, and printmin
    decode (the reference's mmer_edit_distance_f<u128_t> +
    printminmain u128 path)."""
    import io

    paths = _write_corpus(tmp_path, n=3, length=2500, seed=7)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = ["cmp", "-k", "40", "-w", "60", "--seq", "--long-kmers",
                "-W", "--cmpout"]
        assert main(args + ["a.tsv"] + paths) == 0
        caches = sorted(glob.glob("*.mmerseq128"))
        assert len(caches) == 3
        # tokens on disk are little-endian u128 (even u64 word count)
        raw = np.fromfile(caches[0], np.uint64)
        assert len(raw) % 2 == 0 and len(raw) > 0
        tail = lambda p: [l.split("\t")[1:] for l          # noqa: E731
                          in open(p).read().strip().split("\n")[3:]]
        # cache-hit rerun and presketched reload both match
        assert main(args + ["b.tsv"] + paths) == 0
        assert tail("b.tsv") == tail("a.tsv")
        assert main(["cmp", "--presketched", "--cmpout", "c.tsv"]
                    + caches) == 0
        assert tail("c.tsv") == tail("a.tsv")
        # edit-distance measure over u128 tokens
        assert main(["cmp", "-k", "40", "-w", "60", "--seq",
                     "--long-kmers", "-W", "--compute-edit-distance",
                     "--exact-kmer-dist", "--cmpout", "d.tsv"]
                    + paths) == 0
        assert len(tail("d.tsv")) == 3
        # stacked emit + printmin: decoded 40-mers are real k-mers of
        # the input (canonical: fwd or RC)
        assert main(["sketch", "-k", "40", "-w", "60", "--seq",
                     "--long-kmers", "-o", "stack.mseq"] + paths) == 0
        from dashing2_tpu.io.printmin import printmin_main
        buf = io.StringIO()
        printmin_main("stack.mseq", out=buf)
        lines = buf.getvalue().strip().split("\n")
        assert len(lines) == 3
        tok = lines[0].split("\t")[0]
        assert len(tok) == 40 and set(tok) <= set("ACGT")
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        rc = "".join(comp[c] for c in reversed(tok))
        g0 = open(paths[0]).read().split("\n")[1]
        assert tok in g0 or rc in g0
    finally:
        os.chdir(cwd)


def test_presketched_mmerseq64_loader(tmp_path):
    """.mmerseq64 cache artifacts load through --presketched with the
    exact-span-distance coupling applied (cmp_main.cpp:335-342)."""
    paths = _write_corpus(tmp_path, n=3, length=2500, seed=15)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        args = ["cmp", "-k", "21", "-w", "31", "--seq", "-W",
                "--cmpout"]
        assert main(args + ["a.tsv"] + paths) == 0
        caches = sorted(glob.glob("*.mmerseq64"))
        assert len(caches) == 3
        assert main(["cmp", "--presketched", "--cmpout", "b.tsv"]
                    + caches) == 0
        tail = lambda p: [l.split("\t")[1:] for l          # noqa: E731
                          in open(p).read().strip().split("\n")[3:]]
        assert tail("b.tsv") == tail("a.tsv")
    finally:
        os.chdir(cwd)


def test_u128_native_hash_matches_device(tmp_path, monkeypatch):
    """The native u128 counting hasher (hash_rows_native128) is
    byte-identical to the device _hash_chunk_batch128 path across
    set/countdict/minimizer configs."""
    paths = _write_corpus(tmp_path, n=4, length=2500, seed=23)
    for args in (["--set", "-k", "40", "--long-kmers"],
                 ["--countdict", "-k", "40", "--long-kmers"],
                 ["--set", "-k", "40", "-w", "60", "--long-kmers"]):
        outs = []
        for knob in ("1", "0"):
            monkeypatch.setenv("DASHING2_TPU_NATIVE_HASH", knob)
            out = str(tmp_path / f"u{knob}.bin")
            assert main(["cmp", "--binary-output", "--cmpout", out]
                        + args + paths) == 0
            outs.append(open(out, "rb").read())
        assert outs[0] == outs[1], args
