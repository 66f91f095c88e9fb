import numpy as np
import pytest

from make_fixtures import make, mutate, write_fasta
from dashing2_tpu.io import formats


def run_cli(args):
    from dashing2_tpu.cli import main
    return main(args)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fa_feat")
    return make(str(d), n_genomes=4, length=8000)


def test_cache_roundtrip_identical_results(fixtures, tmp_path):
    import time
    args = ["sketch", "-k", "21", "-S", "256", "--cache",
            "--outprefix", str(tmp_path), "--binary-output"]
    out1 = tmp_path / "d1.bin"
    run_cli(args + ["--cmpout", str(out1)] + fixtures)
    # cache files must exist now
    import glob
    caches = glob.glob(str(tmp_path / "*.opss"))
    assert len(caches) == len(fixtures), caches
    out2 = tmp_path / "d2.bin"
    run_cli(args + ["--cmpout", str(out2)] + fixtures)
    a = np.fromfile(out1, np.float32)
    b = np.fromfile(out2, np.float32)
    assert np.array_equal(a, b)
    # corrupt one cache -> still works (resketches)
    with open(caches[0], "wb") as f:
        f.write(b"garbage")
    out3 = tmp_path / "d3.bin"
    run_cli(args + ["--cmpout", str(out3)] + fixtures)
    assert np.array_equal(a, np.fromfile(out3, np.float32))


def test_cache_compressed_registers_roundtrip(fixtures, tmp_path):
    """--cache with compressed direct sketching (--fastcmp N --setsketch
    path) must store/reload the QUANTIZED register dtype, not f64
    (regression: the wrapper allocated f64 and fed float 'compressed'
    registers to the width-dispatched engines)."""
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.enums import KmerSketchResultType
    from dashing2_tpu.sketch.core import sketch_fastx
    for fd, dt in ((1.0, np.uint8), (8.0, np.uint64)):
        opts = dict(k=21, sketchsize=128, cache_sketches=True,
                    kmer_result=KmerSketchResultType.FULL_SETSKETCH,
                    fd_level=fd, compressed_a=0.02,
                    compressed_b=1.0006 if fd == 8.0 else 1.06,
                    outprefix=str(tmp_path))
        r1 = sketch_fastx(Dashing2Options(**opts), fixtures[:3])
        assert r1.signatures.dtype == dt
        r2 = sketch_fastx(Dashing2Options(**opts), fixtures[:3])  # hits
        assert r2.signatures.dtype == dt
        assert np.array_equal(np.asarray(r1.signatures),
                              np.asarray(r2.signatures))
        assert np.allclose(r1.cardinalities, r2.cardinalities)
    # CLI byte-compare through --setsketch-ab
    args = ["sketch", "--full-setsketch", "--setsketch-ab", "0.02,1.06",
            "--fastcmp", "1", "-k", "21", "-S", "128", "--cache",
            "--outprefix", str(tmp_path), "--binary-output"]
    out1, out2 = tmp_path / "ab1.bin", tmp_path / "ab2.bin"
    assert run_cli(args + ["--cmpout", str(out1)] + fixtures[:3]) == 0
    assert run_cli(args + ["--cmpout", str(out2)] + fixtures[:3]) == 0
    assert np.array_equal(np.fromfile(out1, np.float32),
                          np.fromfile(out2, np.float32))


def test_cache_save_kmers_roundtrip(fixtures, tmp_path):
    """--cache + --save-kmers/--save-kmercounts: cached items must carry
    their k-mer ids (regression: cache hits produced all-zero kmer rows,
    and all-hit runs dropped res.kmers entirely)."""
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.sketch.core import sketch_fastx

    def mk():
        return Dashing2Options(k=21, sketchsize=128, cache_sketches=True,
                               save_kmers=True, save_kmercounts=True,
                               outprefix=str(tmp_path))
    r1 = sketch_fastx(mk(), fixtures[:3])
    assert r1.kmers is not None and r1.kmercounts is not None
    assert len(r1.destination_files) == 3
    r2 = sketch_fastx(mk(), fixtures[:3])       # all cache hits
    assert r2.kmers is not None and r2.kmercounts is not None
    assert np.array_equal(r1.kmers, r2.kmers)
    assert np.array_equal(r1.kmercounts, r2.kmercounts)
    assert np.array_equal(r1.signatures, r2.signatures)
    assert len(r2.destination_files) == 3       # hits report dests too
    assert (r2.kmers != 0).any()


def test_cache_exact_sets(fixtures, tmp_path):
    args = ["sketch", "--set", "-k", "21", "--cache",
            "--outprefix", str(tmp_path), "--binary-output"]
    out1 = tmp_path / "e1.bin"
    run_cli(args + ["--cmpout", str(out1)] + fixtures[:3])
    out2 = tmp_path / "e2.bin"
    run_cli(args + ["--cmpout", str(out2)] + fixtures[:3])
    assert np.array_equal(np.fromfile(out1, np.float32),
                          np.fromfile(out2, np.float32))


def test_presketched_single_sketch_files(fixtures, tmp_path):
    run_cli(["sketch", "-k", "21", "-S", "256", "--cache",
             "--outprefix", str(tmp_path)] + fixtures[:3])
    import glob
    caches = sorted(glob.glob(str(tmp_path / "*.opss")))
    assert len(caches) == 3
    out = tmp_path / "d.bin"
    rc = run_cli(["cmp", "--presketched", "-S", "256", "--binary-output",
                  "--cmpout", str(out)] + caches)
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert len(vals) == 3
    assert (vals > 0.2).all()


def test_long_kmers_128(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--long-kmers", "-k", "45", "-S", "256",
                  "--binary-output", "--cmpout", str(out)] + fixtures[:3])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    # k=45 on 0.2%-mutant genomes: similarity ~ (1-0.002*2)^45-ish
    assert 0.5 < vals[0] < 1.0, vals


def test_rolling_hash_long_k(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "-k", "75", "-S", "256",
                  "--binary-output", "--cmpout", str(out)] + fixtures[:3])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert 0.3 < vals[0] < 1.0, vals
    # self-similarity check: same file twice
    out2 = tmp_path / "d2.bin"
    run_cli(["sketch", "-k", "75", "-S", "256", "--binary-output",
             "--cmpout", str(out2), fixtures[0], fixtures[0]])
    assert np.fromfile(out2, np.float32)[0] == 1.0


def test_spacing_cli(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "-k", "17", "--spacing", "0,1x8,0x7",
                  "-S", "256", "--binary-output", "--cmpout", str(out),
                  fixtures[0], fixtures[0]])
    assert rc == 0
    assert np.fromfile(out, np.float32)[0] == 1.0


def test_countmin_weighted(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--multiset", "-c", "8192", "-k", "21",
                  "-S", "256", "--binary-output", "--cmpout", str(out)]
                 + fixtures[:3])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert 0.4 < vals[0] <= 1.0, vals


def test_edit_distance_omh(tmp_path):
    rng = np.random.default_rng(12)
    from make_fixtures import random_genome
    base = random_genome(rng, 2000)
    seqs = [("s0", base), ("s1", mutate(rng, base, 0.01)),
            ("s2", mutate(rng, base, 0.10)), ("s3", random_genome(rng, 2000))]
    fa = tmp_path / "seqs.fa"
    write_fasta(str(fa), seqs)
    out = tmp_path / "omh.bin"
    rc = run_cli(["sketch", "--edit-distance", "--parse-by-seq", "-k", "12",
                  "-S", "512", "--binary-output", "--cmpout", str(out),
                  str(fa)])
    assert rc == 0
    n = 4
    vals = np.fromfile(out, np.float32)
    mat = np.zeros((n, n), np.float32)
    idx = 0
    for i in range(n):
        for j in range(i + 1, n):
            mat[i, j] = vals[idx]
            idx += 1
    # closer sequences share more OMH registers
    assert mat[0, 1] > mat[0, 2] > mat[0, 3]
    assert mat[0, 3] < 0.05


def test_edit_distance_exact_knn(tmp_path):
    rng = np.random.default_rng(13)
    from make_fixtures import random_genome
    base = random_genome(rng, 500)
    seqs = [(f"s{i}", mutate(rng, base, 0.01 * i)) for i in range(5)]
    fa = tmp_path / "seqs.fa"
    write_fasta(str(fa), seqs)
    out = tmp_path / "knn.bin"
    rc = run_cli(["sketch", "--edit-distance", "--parse-by-seq",
                  "--compute-edit-distance", "-k", "10", "-S", "256",
                  "--topk", "2", "--binary-output", "--cmpout", str(out),
                  str(fa)])
    assert rc == 0
    indptr, indices, data = formats.read_knn_csr(str(out))
    # s0's closest neighbor by true edit distance should be s1
    row0 = indices[int(indptr[0]):int(indptr[1])]
    assert row0[0] == 1, (row0, data[:4])
    # distances ascending
    d0 = data[int(indptr[0]):int(indptr[1])]
    assert (np.diff(d0) >= 0).all()


def test_direct_compressed_sketching(fixtures, tmp_path):
    # --full --fastcmp-bytes: sketch directly into (a,b)-quantized byte
    # registers; similarities should track the full-register estimates
    out1 = tmp_path / "full.bin"
    out2 = tmp_path / "bytes.bin"
    run_cli(["sketch", "--full", "-k", "21", "-S", "512",
             "--binary-output", "--cmpout", str(out1)] + fixtures[:3])
    run_cli(["sketch", "--full", "--fastcmp-bytes", "-k", "21", "-S", "512",
             "--binary-output", "--cmpout", str(out2)] + fixtures[:3])
    a = np.fromfile(out1, np.float32)
    b = np.fromfile(out2, np.float32)
    assert len(a) == len(b) == 3
    np.testing.assert_allclose(a, b, atol=0.08)


def test_pairlist_mode(fixtures, tmp_path):
    pl = tmp_path / "pairs.txt"
    pl.write_text(f"{fixtures[0]} {fixtures[1]}\n{fixtures[1]} {fixtures[2]}\n")
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "-k", "21", "-S", "256", "--binary-output",
                  "--pairlist", str(pl), "--cmpout", str(out)])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert len(vals) == 3  # 3 unique paths -> 3 pairs


def _slow_levenshtein(a, b):
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[-1]


def test_span_edit_distance_matches_oracle():
    from dashing2_tpu.cmp.editdist import span_edit_distance
    rng = np.random.default_rng(7)
    for _ in range(20):
        na, nb = rng.integers(0, 40, size=2)
        a = rng.integers(0, 5, size=na).astype(np.uint64)
        b = rng.integers(0, 5, size=nb).astype(np.uint64)
        assert span_edit_distance(a, b) == _slow_levenshtein(list(a), list(b))


def test_mmer_sequence_compare_modes(fixtures, tmp_path):
    # --seq default: exact span edit distance (exact_kmer_dist is forced
    # for FULL_MMER_* results, cmp_main.h:82-83); similarity form is
    # max_len - dist, M_EDIT_DISTANCE emits the distance itself
    outd = tmp_path / "ed.bin"
    outs = tmp_path / "sim.bin"
    base = ["sketch", "-k", "17", "-w", "80", "--seq", "--binary-output"]
    run_cli(base + ["--compute-edit-distance", "--cmpout", str(outd)]
            + fixtures[:3])
    run_cli(base + ["--cmpout", str(outs)] + fixtures[:3])
    d = np.fromfile(outd, np.float32)
    s = np.fromfile(outs, np.float32)
    assert len(d) == len(s) == 3
    assert (d >= 0).all()
    # similarity + distance = max length per pair => their sum is the
    # pairwise max sequence length, so both encode the same comparison
    assert np.array_equal(np.argsort(d), np.argsort(-s))
    # closer genomes (g0 vs g1) have smaller edit distance than g0 vs g3
    m = np.zeros((3, 3), np.float32)
    iu = np.triu_indices(3, 1)
    m[iu] = d
    assert m[0, 1] <= m[0, 2]


def test_sig_ram_limit_memmap_spill(fixtures, tmp_path):
    """--sig-ram-limit 1 forces signatures into a disk-backed memmap;
    results must be identical to the in-RAM path."""
    out1 = tmp_path / "ram.bin"
    out2 = tmp_path / "mm.bin"
    base = ["sketch", "-k", "21", "-S", "256", "--binary-output"]
    run_cli(base + ["--cmpout", str(out1)] + fixtures[:3])
    run_cli(base + ["--sig-ram-limit", "1", "--cmpout", str(out2)]
            + fixtures[:3])
    np.testing.assert_array_equal(np.fromfile(out1, np.float32),
                                  np.fromfile(out2, np.float32))


def test_mmvec_alloc_modes():
    from dashing2_tpu.io import mmvec
    a = mmvec.alloc((4, 8), np.float64, ram_limit=1 << 30, fill=1.5)
    assert not isinstance(a, np.memmap) and (a == 1.5).all()
    b = mmvec.alloc((4, 8), np.float64, ram_limit=1, fill=2.5)
    assert isinstance(b, np.memmap) and (b == 2.5).all()
    b[2, 3] = 9.0
    assert b[2, 3] == 9.0


def test_f32_registers_mode(fixtures, tmp_path):
    """--f32-registers (RegT=float build analogue) must closely track the
    f64 similarities (f32 rounding only moves near-tied registers)."""
    out1 = tmp_path / "f64.bin"
    out2 = tmp_path / "f32.bin"
    base = ["sketch", "--full", "-k", "21", "-S", "512", "--binary-output"]
    run_cli(base + ["--cmpout", str(out1)] + fixtures[:3])
    run_cli(base + ["--f32-registers", "--cmpout", str(out2)] + fixtures[:3])
    a = np.fromfile(out1, np.float32)
    b = np.fromfile(out2, np.float32)
    np.testing.assert_allclose(a, b, atol=0.02)


def test_prefetch_iterator():
    from dashing2_tpu.io.prefetch import prefetch
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("producer failed")
    it = prefetch(boom())
    assert next(it) == 1
    import pytest
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_sequence_store_spill():
    from dashing2_tpu.io.seqstore import SequenceStore
    st = SequenceStore(threshold=10)
    seqs = [b"ACGTACGT", b"TTTT", b"", b"GGGGCCCCAAAA"]
    for s in seqs:
        st.append(s)
    assert st._ram is None  # spilled past 10 bytes
    assert len(st) == 4
    assert [st[i] for i in range(4)] == seqs
    st2 = SequenceStore(in_ram=True, threshold=1)
    for s in seqs:
        st2.append(s)
    assert st2._ram is not None
    assert list(st2) == seqs


def test_edit_distance_space_with_spilled_seqs(fixtures, tmp_path):
    out1 = tmp_path / "ed1.bin"
    out2 = tmp_path / "ed2.bin"
    base = ["sketch", "--edit-distance", "--exact-kmer-dist",
            "--compute-edit-distance", "-k", "8", "-S", "64",
            "--binary-output", "--parse-by-seq"]
    run_cli(base + ["--cmpout", str(out1)] + fixtures[:2])
    import dashing2_tpu.io.seqstore as ss
    old = ss.RAM_THRESHOLD
    ss.RAM_THRESHOLD = 1  # force disk spill
    try:
        run_cli(base + ["--cmpout", str(out2)] + fixtures[:2])
    finally:
        ss.RAM_THRESHOLD = old
    np.testing.assert_array_equal(np.fromfile(out1, np.float32),
                                  np.fromfile(out2, np.float32))


def test_filterset_binary_kmer_list(fixtures, tmp_path):
    """--filterset path:bin (non-'k' suffix) loads raw u64 hashes and
    excludes them; excluding a file's own saved k-mers must change its
    similarities (d2.cpp:45-77)."""
    db = tmp_path / "db.bin"
    run_cli(["sketch", "-k", "21", "-S", "128", "--save-kmers",
             "-o", str(db)] + fixtures[:2])
    kmers = np.fromfile(str(db) + ".kmer64", np.uint64, offset=24)
    kf = tmp_path / "filter.u64"
    kmers.tofile(kf)
    out1 = tmp_path / "nofs.bin"
    out2 = tmp_path / "fs.bin"
    base = ["sketch", "-k", "21", "-S", "128", "--binary-output"]
    run_cli(base + ["--cmpout", str(out1)] + fixtures[:2])
    run_cli(base + ["--filterset", f"{kf}:bin", "--cmpout", str(out2)]
            + fixtures[:2])
    a = np.fromfile(out1, np.float32)
    b = np.fromfile(out2, np.float32)
    assert not np.array_equal(a, b)  # the filter removed shared k-mers


def test_fastcmp_levels_track_full(fixtures, tmp_path):
    """--fastcmp {0.5,1,2,4} (setsketch quantization) and --bbit-sigs
    (b-bit truncation) must track the full-register similarities within
    their quantization tolerance (make_compressed, cmp_core.cpp:209-322)."""
    base = ["sketch", "-k", "21", "-S", "512", "--binary-output"]
    ref = tmp_path / "full.bin"
    run_cli(base + ["--cmpout", str(ref)] + fixtures[:3])
    full = np.fromfile(ref, np.float32)
    for fd, tol in (("0.5", 0.12), ("1", 0.06), ("2", 0.05), ("4", 0.05)):
        out = tmp_path / f"fd{fd}.bin"
        run_cli(base + ["--fastcmp", fd, "--cmpout", str(out)]
                + fixtures[:3])
        got = np.fromfile(out, np.float32)
        np.testing.assert_allclose(got, full, atol=tol, err_msg=f"fd={fd}")
    out = tmp_path / "bbit.bin"
    run_cli(base + ["--fastcmp", "2", "--bbit-sigs", "--cmpout", str(out)]
            + fixtures[:3])
    got = np.fromfile(out, np.float32)
    np.testing.assert_allclose(got, full, atol=0.06)


def test_makedest_parameter_keying(tmp_path):
    """Cache artifact names must change with every content-affecting
    parameter (fastxmerge.cpp:70-120)."""
    import dataclasses
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.io.cache import makedest
    base = Dashing2Options(k=21, sketchsize=256)
    name0 = makedest(base, "in.fa")
    variants = [
        dict(k=22), dict(w=40), dict(sketchsize=512), dict(seedseed=7),
        dict(canonicalize=False), dict(count_threshold=2.0),
        dict(sspace=1, kmer_result=1), dict(kmer_result=2),
        dict(alphabet=2, canonicalize=False),
    ]
    names = {name0}
    for kv in variants:
        nm = makedest(dataclasses.replace(base, **kv), "in.fa")
        assert nm not in names, (kv, nm)
        names.add(nm)
    assert name0.endswith(".opss")
