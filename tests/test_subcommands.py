import struct
import zlib

import numpy as np
import pytest

from make_fixtures import make
from dashing2_tpu.io import formats


def run_cli(args):
    from dashing2_tpu.cli import main
    return main(args)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fa_sub")
    return make(str(d), n_genomes=4, length=8000)


# ----------------------------------------------------------------------
# wsketch
# ----------------------------------------------------------------------

def test_wsketch_csr(tmp_path):
    rng = np.random.default_rng(0)
    # 3 rows sharing many ids -> correlated sketches
    ids = rng.integers(0, 5000, size=600).astype(np.uint64)
    weights = rng.uniform(0.5, 3.0, size=600)
    indptr = np.array([0, 200, 400, 600], dtype=np.uint64)
    (tmp_path / "ids.u64").write_bytes(ids.tobytes())
    (tmp_path / "w.f64").write_bytes(weights.tobytes())
    (tmp_path / "indptr.u64").write_bytes(indptr.tobytes())
    pref = str(tmp_path / "out")
    rc = run_cli(["wsketch", "-S", "128", "-o", pref,
                  str(tmp_path / "ids.u64"), str(tmp_path / "w.f64"),
                  str(tmp_path / "indptr.u64")])
    assert rc == 0
    regs = np.fromfile(f"{pref}.sampled.regs.stacked.3.128.f64",
                       dtype=np.uint8)
    n, m = regs[:16].view(np.uint64)
    assert (n, m) == (3, 128)
    cards = regs[16:16 + 24].view(np.float64)
    np.testing.assert_allclose(cards[0], weights[:200].sum(), rtol=1e-9)
    sampled = np.fromfile(f"{pref}.sampled.indices.stacked.3.128.i64",
                          dtype=np.uint64).reshape(3, 128)
    # sampled ids must come from the right row
    assert set(sampled[0].tolist()) <= set(ids[:200].tolist())
    assert set(sampled[2].tolist()) <= set(ids[400:].tolist())


def test_wsketch_empty_row_and_modes(tmp_path):
    """Empty CSR rows sketch to all-zero rows instead of crashing, and
    the -q (set semantics) / -B (BagMinHash) / --indptr32 reference
    flags are reachable."""
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 500, size=90).astype(np.uint64)
    weights = rng.uniform(0.5, 2.0, size=90)
    indptr32 = np.array([0, 0, 60, 90], dtype=np.uint32)  # row 0 EMPTY
    (tmp_path / "ids.u64").write_bytes(ids.tobytes())
    (tmp_path / "w.f64").write_bytes(weights.tobytes())
    (tmp_path / "ip.u32").write_bytes(indptr32.tobytes())
    for extra in ([], ["-q"], ["-B"]):
        pref = str(tmp_path / ("o" + "".join(extra)))
        rc = run_cli(["wsketch", "-S", "64", "-o", pref, "--indptr32"]
                     + extra + [str(tmp_path / "ids.u64"),
                                str(tmp_path / "w.f64"),
                                str(tmp_path / "ip.u32")])
        assert rc == 0
        regs = np.fromfile(f"{pref}.sampled.regs.stacked.3.64.f64",
                           np.uint8)
        n, m = regs[:16].view(np.uint64)
        assert (n, m) == (3, 64)
        cards = regs[16:40].view(np.float64)
        sigs = regs[40:].view(np.float64).reshape(3, 64)
        assert cards[0] == 0.0 and (sigs[0] == 0.0).all()
        assert (sigs[1] != 0).any() and (sigs[2] != 0).any()


def test_wsketch_flat_identical_rows_match(tmp_path):
    ids = np.arange(1000, dtype=np.uint64)
    (tmp_path / "a.u64").write_bytes(ids.tobytes())
    p1 = str(tmp_path / "o1")
    p2 = str(tmp_path / "o2")
    run_cli(["wsketch", "-S", "64", "-o", p1, str(tmp_path / "a.u64")])
    run_cli(["wsketch", "-S", "64", "-o", p2, str(tmp_path / "a.u64")])
    s1 = np.fromfile(p1 + ".sampled.hashes.f64", np.float64)
    s2 = np.fromfile(p2 + ".sampled.hashes.f64", np.float64)
    assert np.array_equal(s1, s2)
    assert s1[0] == 1000.0  # total weight header


# ----------------------------------------------------------------------
# contain + save-kmers + printmin
# ----------------------------------------------------------------------

def test_save_kmers_contain_roundtrip(fixtures, tmp_path):
    sk = tmp_path / "db"
    rc = run_cli(["sketch", "-k", "21", "-S", "128", "--save-kmers",
                  "-o", str(sk)] + fixtures)
    assert rc == 0
    db = formats.read_kmer_db(str(sk) + ".kmer64")
    assert db.k == 21 and db.sketchsize == 128
    out = tmp_path / "contain.bin"
    rc = run_cli(["contain", "--binary-output", "--cmpout", str(out),
                  str(sk) + ".kmer64", fixtures[0], fixtures[3]])
    assert rc == 0
    res = formats.read_contain(str(out))
    cov = res["coverage_matrix"]
    assert cov.shape == (2, len(fixtures))
    # query 0 is genome 0: it should cover nearly all of ref 0's sampled kmers
    assert cov[0, 0] > 0.95, cov
    # and less of the most-diverged genome
    assert cov[0, 3] < cov[0, 0]
    # depth for a 1x genome ~ 1
    assert 0.9 < res["depth_matrix"][0, 0] < 2.0


def test_contain_queries_via_ffile(fixtures, tmp_path):
    """contain accepts db + -F query list (regression: the arity guard
    rejected it before the ffile queries were ever appended)."""
    sk = tmp_path / "dbf"
    assert run_cli(["sketch", "-k", "21", "-S", "128", "--save-kmers",
                    "-o", str(sk)] + fixtures) == 0
    qf = tmp_path / "queries.txt"
    qf.write_text(fixtures[0] + "\r\n" + fixtures[1] + "\n")
    out = tmp_path / "cf.bin"
    rc = run_cli(["contain", "--binary-output", "--cmpout", str(out),
                  "-F", str(qf), str(sk) + ".kmer64"])
    assert rc == 0
    res = formats.read_contain(str(out))
    assert res["coverage_matrix"].shape == (2, len(fixtures))


def test_cli_negative_option_values(fixtures, tmp_path):
    """Flags must accept negative values (regression: registering the
    '-2' option made argparse treat every negative number as a flag)."""
    out = tmp_path / "neg.bin"
    rc = run_cli(["sketch", "-w", "-1", "--maxcand", "-1", "-S", "64",
                  "-k", "21", "--cmpout", str(out), fixtures[0],
                  fixtures[1]])
    assert rc == 0
    # and '-2' itself still parses as the long-kmers flag
    out2 = tmp_path / "neg2.bin"
    rc = run_cli(["sketch", "-2", "-k", "45", "-S", "64",
                  "--cmpout", str(out2), fixtures[0], fixtures[1]])
    assert rc == 0


def test_omh_chunked_matches_bruteforce():
    """The streamed top-ell OMH selection must match a direct (m, n)
    brute-force oracle, and trailing-N garbage must not leak into
    signatures (sequences with < ell valid k-mers fold the sentinel)."""
    import jax.numpy as jnp

    from dashing2_tpu import hashing as H
    from dashing2_tpu.ops import kmers as K
    from dashing2_tpu.sketch import omh as O
    from dashing2_tpu.enums import Alphabet

    rng = np.random.default_rng(11)
    k, m, ell = 7, 32, 2
    seq = "".join(rng.choice(list("ACGT"), size=700))
    codes = K.encode_ascii(seq.encode(), Alphabet.DNA)
    got = O.omh_sketch(codes, k, m, ell=ell)

    km, valid = K.dna_kmer_codes(jnp.asarray(codes)[None, :], k, False)
    km, valid = np.asarray(km)[0], np.asarray(valid)[0]
    occ = O._occurrence_ranks(np.where(valid, km, 0))
    keyed = np.where(valid, km ^ (occ.astype(np.uint64)
                                  * np.uint64(O._G1)), np.uint64(0))
    r = np.arange(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        keys = H.wanghash(keyed[None, :]
                          ^ (r[:, None] * np.uint64(O._G2)
                             + np.uint64(O._SALT)))
    keys = np.where(valid[None, :], keys, np.uint64(0xFFFFFFFFFFFFFFFF))
    want = np.full(m, O._SALT, np.uint64)
    for reg in range(m):
        # ell smallest under the f64 view, earliest position on ties
        kf = keys[reg].astype(np.float64)
        idx = np.argsort(kf, kind="stable")[:ell]
        sel = km[np.sort(idx)]
        s = np.uint64(O._SALT)
        with np.errstate(over="ignore"):
            for e in range(ell):
                s = H.wanghash(s ^ sel[e]
                               ^ (np.uint64(e + 1) * np.uint64(O._G1)))
        want[reg] = s
    assert np.array_equal(got, want)

    # N-heavy: one valid k-mer; different trailing Ns must not matter
    s1 = "ACGTACG" + "N" * 20
    s2 = "ACGTACG" + "N" * 35
    c1 = K.encode_ascii(s1.encode(), Alphabet.DNA)
    c2 = K.encode_ascii(s2.encode(), Alphabet.DNA)
    assert np.array_equal(O.omh_sketch(c1, k, m, ell=ell),
                          O.omh_sketch(c2, k, m, ell=ell))


def test_mmer_seq_printmin(fixtures, tmp_path):
    out = tmp_path / "mm.bin"
    rc = run_cli(["sketch", "--seq", "-k", "15", "-w", "31",
                  "-o", str(out), fixtures[0]])
    assert rc == 0
    data = formats.read_mmer_sequences(str(out))
    assert data["k"] == 15 and data["w"] == 31
    assert len(data["seqs"]) == 1 and len(data["seqs"][0]) > 50
    import io
    from dashing2_tpu.io.printmin import printmin_main
    buf = io.StringIO()
    printmin_main(str(out), out=buf)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 1
    kmers = lines[0].split("\t")
    assert len(kmers) == len(data["seqs"][0])
    assert all(len(s) == 15 and set(s) <= set("ACGT") for s in kmers[:10])
    # decoded minimizers must be actual canonical k-mers of the input
    from dashing2_tpu.io.fastx import read_fastx
    _, seq = next(read_fastx(fixtures[0]))
    s = seq.decode()
    rc_tab = str.maketrans("ACGT", "TGCA")
    ksets = set()
    for i in range(len(s) - 14):
        sub = s[i:i + 15]
        ksets.add(min(sub, sub[::-1].translate(rc_tab)))
    assert all(km in ksets for km in kmers[:50])


# ----------------------------------------------------------------------
# BED
# ----------------------------------------------------------------------

def test_bed_sketch_similarity(tmp_path):
    # two BED files sharing half their intervals
    a = tmp_path / "a.bed"
    b = tmp_path / "b.bed"
    lines_shared = [f"chr1\t{i * 1000}\t{i * 1000 + 500}" for i in range(20)]
    lines_a = [f"chr2\t{i * 1000}\t{i * 1000 + 500}" for i in range(20)]
    lines_b = [f"chr3\t{i * 1000}\t{i * 1000 + 500}" for i in range(20)]
    a.write_text("\n".join(lines_shared + lines_a) + "\n")
    b.write_text("\n".join(lines_shared + lines_b) + "\n")
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--bed", "-S", "512", "--binary-output",
                  "--cmpout", str(out), str(a), str(b)])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert abs(vals[0] - 1 / 3) < 0.07, vals  # J = 10k/30k bases


def test_bed_multiset_normalized(tmp_path):
    a = tmp_path / "a.bed"
    a.write_text("chr1\t0\t100\nchr1\t50\t150\n")
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--bed", "--multiset", "--normalize-intervals",
                  "-S", "64", "--binary-output", "--cmpout", str(out),
                  str(a), str(a)])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert vals[0] == 1.0  # identical files -> identical sketches


# ----------------------------------------------------------------------
# BigWig (construct a minimal valid file, then sketch it)
# ----------------------------------------------------------------------

def _write_bigwig_multi(path, chrom_intervals, chrom_size=1000000):
    """Minimal valid multi-chromosome BigWig: one bedGraph block per
    chromosome, flat chrom B+ tree and R-tree leaf nodes."""
    names = list(chrom_intervals)
    key_size = max(len(n.encode()) for n in names)
    chrom_tree = struct.pack("<IIIIQQ", 0x78CA8C91, len(names), key_size,
                             8, len(names), 0)
    chrom_tree += struct.pack("<BBH", 1, 0, len(names))
    for cid, n in enumerate(names):
        chrom_tree += n.encode().ljust(key_size, b"\0") + \
            struct.pack("<II", cid, chrom_size)
    header_size = 64
    chrom_off = header_size
    data_off = chrom_off + len(chrom_tree)
    blocks = []
    for cid, n in enumerate(names):
        ivs = chrom_intervals[n]
        items = b"".join(struct.pack("<IIf", s, e, v)
                         for (s, e, v) in ivs)
        block = struct.pack("<IIIIIBBH", cid, ivs[0][0], ivs[-1][1],
                            0, 0, 1, 0, len(ivs)) + items
        blocks.append((cid, ivs[0][0], ivs[-1][1], zlib.compress(block)))
    data = struct.pack("<Q", len(blocks))
    leaf_meta = []
    for cid, s0, e0, comp in blocks:
        leaf_meta.append((cid, s0, e0, data_off + len(data), len(comp)))
        data += comp
    index_off = data_off + len(data)
    rtree = struct.pack("<IIQIIIIQIi", 0x2468ACE0, 256, len(blocks),
                        0, leaf_meta[0][1], len(names) - 1,
                        leaf_meta[-1][2], index_off, 512, 0)
    rtree += struct.pack("<BBH", 1, 0, len(blocks))
    for cid, s0, e0, off, size in leaf_meta:
        rtree += struct.pack("<IIIIQQ", cid, s0, cid, e0, off, size)
    hdr = struct.pack("<IHHQQQHHQQIQ", 0x888FFC26, 4, 0, chrom_off,
                      data_off, index_off, 0, 0, 0, 0, 1 << 15, 0)
    assert len(hdr) == 64
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(chrom_tree)
        f.write(data)
        f.write(rtree)


def _write_minimal_bigwig(path, chrom="chr1", intervals=((0, 100, 2.0),)):
    # header(64) + chromtree + data + rtree
    chrom_b = chrom.encode()
    key_size = len(chrom_b)
    # layout offsets computed after building pieces
    items = b"".join(struct.pack("<IIf", s, e, v) for (s, e, v) in intervals)
    block = struct.pack("<IIIIIBBH", 0, intervals[0][0],
                        intervals[-1][1], 0, 0, 1, 0, len(intervals)) + items
    comp = zlib.compress(block)
    chrom_tree = struct.pack("<IIIIQQ", 0x78CA8C91, 1, key_size, 8, 1, 0)
    chrom_tree += struct.pack("<BBH", 1, 0, 1) + chrom_b + \
        struct.pack("<II", 0, 1000000)
    header_size = 64
    chrom_off = header_size
    data_off = chrom_off + len(chrom_tree)
    data = struct.pack("<Q", 1) + comp  # leading u64 = number of sections
    index_off = data_off + len(data)
    rtree = struct.pack("<IIQIIIIQQI", 0x2468ACE0, 256, 1, 0,
                        intervals[0][0], 0, intervals[-1][1],
                        data_off + 8, 0, 0)
    # 48-byte rtree header: magic,u32 blockSize,u64 itemCount,
    # u32 startChromIx,u32 startBase,u32 endChromIx,u32 endBase,
    # u64 endFileOffset,u32 itemsPerSlot,u32 reserved... build carefully:
    rtree = struct.pack("<IIQIIIIQIi", 0x2468ACE0, 256, 1,
                        0, intervals[0][0], 0, intervals[-1][1],
                        index_off, 512, 0)
    rtree += struct.pack("<BBH", 1, 0, 1)
    rtree += struct.pack("<IIIIQQ", 0, intervals[0][0], 0,
                         intervals[-1][1], data_off + 8, len(comp))
    hdr = struct.pack("<IHHQQQHHQQIQ", 0x888FFC26, 4, 0, chrom_off,
                      data_off, index_off, 0, 0, 0, 0, 1 << 15, 0)
    assert len(hdr) == 64
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(chrom_tree)
        f.write(data)
        f.write(rtree)


def test_bigwig_reader_and_sketch(tmp_path):
    p = tmp_path / "t.bw"
    _write_minimal_bigwig(str(p), intervals=((0, 100, 2.0), (200, 300, 1.0)))
    from dashing2_tpu.io.bigwig import read_bigwig
    bw = read_bigwig(str(p))
    assert bw.chrom_sizes == {"chr1": 1000000}
    assert bw.intervals["chr1"] == [(0, 100, 2.0), (200, 300, 1.0)]
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--bigwig", "--multiset", "-S", "64",
                  "--binary-output", "--cmpout", str(out), str(p), str(p)])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    assert vals[0] == 1.0


# ----------------------------------------------------------------------
# LeafCutter
# ----------------------------------------------------------------------

def test_leafcutter_sketch(tmp_path):
    lf = tmp_path / "x_perind.counts"
    lf.write_text(
        "chrom s1 s2\n"
        "chr1:100:200:clu_1 5/10 0/10\n"
        "chr1:300:400:clu_1 3/10 3/10\n"
        "chr2:100:150:clu_2 0/5 7/9\n")
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--leafcutter", "--prob", "-S", "64",
                  "--binary-output", "--cmpout", str(out), str(lf)])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    # s1 and s2 share one splice site of three -> similarity in (0, 1)
    assert 0.0 < vals[0] < 1.0


def test_bigwig_by_chrom(tmp_path):
    """--by-chrom: one sketch entry per chromosome (sketch_core.cpp:65-94)."""
    from dashing2_tpu.sketch import intervals as I
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.enums import DataType

    p = str(tmp_path / "x.bw")
    _write_bigwig_multi(p, {"chr1": [(0, 50, 2.0), (100, 150, 1.0)],
                            "chr2": [(10, 60, 3.0)]})
    opts = Dashing2Options(sketchsize=64, dtype=DataType.BIGWIG,
                           sspace=1, kmer_result=1, by_chrom=True)
    res = I.sketch_bigwig(opts, [p])
    assert res.n == 2
    assert res.names[0].endswith(":chr1") and res.names[1].endswith(":chr2")
    assert (res.cardinalities > 0).all()
    opts2 = Dashing2Options(sketchsize=64, dtype=DataType.BIGWIG,
                            sspace=1, kmer_result=1, by_chrom=False)
    res2 = I.sketch_bigwig(opts2, [p])
    assert res2.n == 1


def test_bigwig_streaming_reader_matches_eager(tmp_path):
    """BigWigReader block iteration (whole-file and per-chrom) agrees
    with the eager read_bigwig view; per-chrom iteration touches only
    that chromosome's blocks."""
    from dashing2_tpu.io.bigwig import BigWigReader, read_bigwig

    p = str(tmp_path / "m.bw")
    ivs = {"chr1": [(0, 10, 1.0), (20, 30, 2.5)],
           "chr2": [(5, 9, 4.0)],
           "chrX": [(100, 200, 0.5), (300, 301, 7.0)]}
    _write_bigwig_multi(p, ivs)
    eager = read_bigwig(p)
    assert {k: v for k, v in eager.intervals.items()} == ivs
    with BigWigReader(p) as r:
        got = {}
        for cid, starts, ends, vals in r.iter_blocks():
            got.setdefault(r.chroms[cid], []).extend(
                zip(starts.tolist(), ends.tolist(),
                    vals.astype(np.float64).tolist()))
        assert got == ivs
        # per-chrom query returns exactly that chromosome's intervals
        cid2 = {v: k for k, v in r.chroms.items()}
        for name, want in ivs.items():
            only = []
            for cid, starts, ends, vals in r.iter_blocks(
                    chrom_id=cid2[name]):
                assert cid == cid2[name]
                only.extend(zip(starts.tolist(), ends.tolist(),
                                vals.astype(np.float64).tolist()))
            assert only == want


def test_hp_compress_mmer_seq(fixtures, tmp_path):
    """--hp-compress collapses consecutive identical minimizers in
    --seq output (fastxsketchbyseq.cpp homopolymer compression)."""
    o1 = tmp_path / "plain.mmers"
    o2 = tmp_path / "hp.mmers"
    base = ["sketch", "-k", "13", "-w", "40", "--seq"]
    run_cli(base + ["-o", str(o1)] + fixtures[:1])
    run_cli(base + ["--hp-compress", "-o", str(o2)] + fixtures[:1])
    from dashing2_tpu.io import formats
    s1 = formats.read_mmer_sequences(str(o1))["seqs"][0]
    s2 = formats.read_mmer_sequences(str(o2))["seqs"][0]
    # hp output = s1 with adjacent duplicates collapsed
    import numpy as np
    keep = np.concatenate([[True], s1[1:] != s1[:-1]])
    np.testing.assert_array_equal(s1[keep], s2)


def test_presketched_panel_stacked(fixtures, tmp_path):
    """cmp --presketched with -Q: queries are the ITEMS in the query
    stacked file, not one per file (cmp_main.cpp panel semantics)."""
    refs = tmp_path / "refs.bin"
    qs = tmp_path / "qs.bin"
    run_cli(["sketch", "-k", "21", "-S", "128", "-o", str(refs)]
            + fixtures[:3])
    run_cli(["sketch", "-k", "21", "-S", "128", "-o", str(qs)]
            + fixtures[3:4] + fixtures[:1])
    qlist = tmp_path / "q.txt"
    qlist.write_text(f"{qs}\n")
    out = tmp_path / "panel.bin"
    rc = run_cli(["cmp", "--presketched", "-k", "21", "--binary-output",
                  "--cmpout", str(out), "-Q", str(qlist), str(refs)])
    assert rc == 0
    import numpy as np
    mat = np.fromfile(out, np.float32).reshape(3, 2)  # 3 refs x 2 queries
    # second query IS fixtures[0] == first reference -> similarity 1
    assert mat[0, 1] == 1.0


def test_contain_native_hash_matches_device(fixtures, tmp_path,
                                            monkeypatch):
    """The native host screening hash path (hash_rows_native) produces
    byte-identical contain output to the device hashing path."""
    sk = tmp_path / "cdb"
    assert run_cli(["sketch", "-k", "21", "-S", "128", "--save-kmers",
                    "-o", str(sk)] + fixtures) == 0
    outs = []
    for knob in ("1", "0"):
        monkeypatch.setenv("DASHING2_TPU_CONTAIN_NATIVE", knob)
        out = tmp_path / f"c{knob}.bin"
        assert run_cli(["contain", "--binary-output", "--cmpout",
                        str(out), str(sk) + ".kmer64", fixtures[0],
                        fixtures[2]]) == 0
        outs.append(open(out, "rb").read())
    assert outs[0] == outs[1]
