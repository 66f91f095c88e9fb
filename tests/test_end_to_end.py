import subprocess
import sys

import numpy as np
import pytest

from make_fixtures import make, write_fasta
from dashing2_tpu.io import formats


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fa")
    return make(str(d), n_genomes=6, length=20000)


def run_cli(args):
    from dashing2_tpu.cli import main
    return main(args)


def true_jaccard(pa, pb, k=31):
    from dashing2_tpu.io.fastx import read_fastx

    def kset(path):
        out = set()
        for _, seq in read_fastx(path):
            s = seq.decode()
            for i in range(len(s) - k + 1):
                sub = s[i:i + k]
                rc = sub[::-1].translate(str.maketrans("ACGT", "TGCA"))
                out.add(min(sub, rc))
        return out
    A, B = kset(pa), kset(pb)
    return len(A & B) / len(A | B)


def test_sketch_cmp_oph_binary(fixtures, tmp_path):
    out = tmp_path / "dist.bin"
    sk = tmp_path / "sig.bin"
    rc = run_cli(["sketch", "-k", "31", "-S", "512", "--binary-output",
                  "--cmpout", str(out), "-o", str(sk)] + fixtures)
    assert rc == 0
    n = len(fixtures)
    vals = np.fromfile(out, dtype=np.float32)
    assert len(vals) == n * (n - 1) // 2
    # reconstruct square
    mat = np.zeros((n, n), np.float32)
    idx = 0
    for i in range(n):
        for j in range(i + 1, n):
            mat[i, j] = mat[j, i] = vals[idx]
            idx += 1
    # check against true Jaccard for a few pairs
    for (i, j) in [(0, 1), (0, 5), (2, 4)]:
        t = true_jaccard(fixtures[i], fixtures[j])
        assert abs(mat[i, j] - t) < 0.06, (i, j, mat[i, j], t)
    # identical genome to itself would be 1; g0 vs g1 (0.2% mutations) high
    assert mat[0, 1] > 0.7
    # monotone decreasing similarity with divergence from g0
    sims = [mat[0, j] for j in range(1, n)]
    assert all(sims[a] >= sims[a + 1] - 0.05 for a in range(len(sims) - 1))
    # stacked signature file round-trips
    cards, sigs = formats.read_stacked_signatures(str(sk))
    assert sigs.shape == (n, 512)
    names, cards2 = formats.read_names_file(str(sk) + ".names.txt")
    assert names == fixtures
    np.testing.assert_allclose(cards, cards2, rtol=1e-18)


def test_cmp_presketched_matches(fixtures, tmp_path):
    out1 = tmp_path / "d1.bin"
    sk = tmp_path / "sig.bin"
    run_cli(["sketch", "-k", "21", "-S", "256", "--binary-output",
             "--cmpout", str(out1), "-o", str(sk)] + fixtures)
    out2 = tmp_path / "d2.bin"
    rc = run_cli(["cmp", "--presketched", "-k", "21", "-S", "256",
                  "--binary-output", "--cmpout", str(out2), str(sk)])
    assert rc == 0
    a = np.fromfile(out1, np.float32)
    b = np.fromfile(out2, np.float32)
    np.testing.assert_array_equal(a, b)


def test_full_setsketch_cli(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--full", "-k", "31", "-S", "256",
                  "--binary-output", "--cmpout", str(out)] + fixtures[:4])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    t = true_jaccard(fixtures[0], fixtures[1])
    assert abs(vals[0] - t) < 0.09, (vals[0], t)


def test_phylip_output(fixtures, tmp_path):
    out = tmp_path / "d.phylip"
    run_cli(["sketch", "-k", "31", "-S", "256", "--phylip",
             "--cmpout", str(out)] + fixtures[:3])
    lines = out.read_text().splitlines()
    assert lines[0] == "3"
    assert len(lines) == 4
    # row 0 has 2 values, row 1 has 1, row 2 has 0
    assert len(lines[1].split("\t")) == 3
    assert len(lines[2].split("\t")) == 2
    name0 = lines[1].split("\t")[0].rstrip()
    assert name0 == fixtures[0]


def test_mash_distance_measure(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    run_cli(["sketch", "-k", "31", "-S", "512", "--binary-output",
             "--mash-distance", "--cmpout", str(out)] + fixtures[:3])
    vals = np.fromfile(out, np.float32)
    # mash distance for ~0.2% divergence should be near 0.002
    assert 0.0005 < vals[0] < 0.006, vals


def test_panel_mode(fixtures, tmp_path):
    qf = tmp_path / "q.txt"
    qf.write_text("\n".join(fixtures[:2]) + "\n")
    ff = tmp_path / "f.txt"
    ff.write_text("\n".join(fixtures) + "\n")
    out = tmp_path / "panel.bin"
    rc = run_cli(["cmp", "-k", "31", "-S", "256", "--binary-output",
                  "-F", str(ff), "-Q", str(qf), "--cmpout", str(out)])
    assert rc == 0
    vals = np.fromfile(out, np.float32).reshape(len(fixtures), 2)
    # query 0 == ref 0 -> similarity ~1
    assert vals[0, 0] > 0.99


def test_mmer_set_exact(fixtures, tmp_path):
    out = tmp_path / "d.bin"
    rc = run_cli(["sketch", "--set", "-k", "31", "--binary-output",
                  "--cmpout", str(out)] + fixtures[:3])
    assert rc == 0
    vals = np.fromfile(out, np.float32)
    t = true_jaccard(fixtures[0], fixtures[1])
    # exact mode: tight agreement
    assert abs(vals[0] - t) < 1e-5, (vals[0], t)


def test_multiset_and_prob(fixtures, tmp_path):
    for flag in ("--multiset", "--prob"):
        out = tmp_path / f"d{flag[2]}.bin"
        rc = run_cli(["sketch", flag, "-k", "31", "-S", "256",
                      "--binary-output", "--cmpout", str(out)]
                     + fixtures[:3])
        assert rc == 0
        vals = np.fromfile(out, np.float32)
        t = true_jaccard(fixtures[0], fixtures[1])
        # genome k-mers are mostly unique -> J_W ~ J_P ~ plain Jaccard
        assert abs(vals[0] - t) < 0.1, (flag, vals[0], t)


def test_upper_only_trapezoid_routes(tmp_path, monkeypatch):
    """pairwise_matrix(upper_only=True) pulls only the upper trapezoids
    (half the device->host bytes on symmetric jobs); the emitted bytes
    must equal the full-width route for every symmetric consumer, on
    BOTH the fused self path (DASHING2_TPU_UPPER=force on CPU) and the
    N > SELF_MAX block path (device engine forced)."""
    import io as _io

    from dashing2_tpu.cmp import core as C
    from dashing2_tpu.config import Dashing2DistOptions
    from dashing2_tpu.enums import OutputFormat, OutputKind
    from dashing2_tpu.io.emitters import emit_rectangular
    from dashing2_tpu.result import SketchingResult

    n, m = 150, 96
    rng = np.random.default_rng(31)

    def mk():
        res = SketchingResult(names=[f"s{i}" for i in range(n)])
        res.signatures = np.abs(rng.normal(size=(n, m))) + 1e-9
        res.cardinalities = rng.uniform(1e3, 1e5, size=n)
        return res

    def emit_bytes(okind, ofmt, upper, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        try:
            rng2 = np.random.default_rng(31)  # same data every call
            res = SketchingResult(names=[f"s{i}" for i in range(n)])
            res.signatures = np.abs(rng2.normal(size=(n, m))) + 1e-9
            res.cardinalities = rng2.uniform(1e3, 1e5, size=n)
            opts = Dashing2DistOptions(
                k=21, sketchsize=m, output_kind=okind, output_format=ofmt,
                outfile_path=str(tmp_path / "u.bin"))
            emit_rectangular(opts, res,
                             C.pairwise_matrix(opts, res,
                                               upper_only=upper))
            return (tmp_path / "u.bin").read_bytes()
        finally:
            for k in env:
                monkeypatch.delenv(k)

    for okind, ofmt in [
            (OutputKind.SYMMETRIC_ALL_PAIRS, OutputFormat.MACHINE_READABLE),
            (OutputKind.PHYLIP, OutputFormat.MACHINE_READABLE),
            (OutputKind.SYMMETRIC_ALL_PAIRS, OutputFormat.HUMAN_READABLE)]:
        # fused self path: trapezoid slicing forced on the CPU backend
        full = emit_bytes(okind, ofmt, False, {})
        trap = emit_bytes(okind, ofmt, True,
                          {"DASHING2_TPU_UPPER": "force"})
        assert trap == full and len(full) > 0, (okind, ofmt, "self")
        # multi-stream pulls (4 transfer threads) must not reorder bytes
        trap4 = emit_bytes(okind, ofmt, True,
                           {"DASHING2_TPU_UPPER": "force",
                            "DASHING2_TPU_PULL_STREAMS": "4"})
        assert trap4 == full, (okind, ofmt, "streams")
        # block path (N > SELF_MAX), fused device engine
        benv = {"DASHING2_TPU_SELF_MAX": "0",
                "DASHING2_TPU_PAIR_DEVICE": "force"}
        bfull = emit_bytes(okind, ofmt, False, benv)
        btrap = emit_bytes(okind, ofmt, True, benv)
        assert btrap == bfull and bfull == full, (okind, ofmt, "block")
