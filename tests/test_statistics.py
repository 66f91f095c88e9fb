"""Statistical accuracy of end-to-end estimates with asserted tolerances
(the SURVEY §4 upgrade of the reference's eyeball harness test/oph.cpp):
Mash distance vs true mutation rate, containment on true subsets,
intersection/union sizes vs exact k-mer arithmetic, cardinality."""

import numpy as np
import pytest

from make_fixtures import mutate, random_genome, write_fasta


def run_cli(args):
    from dashing2_tpu.cli import main
    return main(args)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("stats")
    rng = np.random.default_rng(23)
    base = random_genome(rng, 60000)
    paths = {}
    for name, seq in [
        ("base", base),
        ("mut01", mutate(rng, base, 0.01)),
        ("mut05", mutate(rng, base, 0.05)),
        ("half", base[:30000]),              # strict subset of base
        ("other", random_genome(rng, 60000)),
    ]:
        p = f"{d}/{name}.fa"
        write_fasta(p, [(name, seq)])
        paths[name] = p
    return paths


def _matrix(out, n):
    flat = np.fromfile(out, np.float32)
    m = np.zeros((n, n), np.float32)
    iu = np.triu_indices(n, 1)
    m[iu] = flat
    m += m.T
    return m


def _distinct_kmers(path, k=21):
    import sys
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.sketch.core import _sketch_fastx_core
    from dashing2_tpu.enums import KmerSketchResultType
    opts = Dashing2Options(k=k, kmer_result=KmerSketchResultType.FULL_MMER_SET)
    res = _sketch_fastx_core(opts, [path])
    return res.kmer_sets[0]


def test_mash_distance_tracks_mutation_rate(corpus, tmp_path):
    out = tmp_path / "mash.bin"
    order = ["base", "mut01", "mut05"]
    run_cli(["sketch", "-k", "21", "-S", "4096", "--binary-output",
             "--mash-distance", "--cmpout", str(out)]
            + [corpus[x] for x in order])
    m = _matrix(out, 3)
    d01, d05 = m[0, 1], m[0, 2]
    assert abs(d01 - 0.01) < 0.004, d01
    assert abs(d05 - 0.05) < 0.012, d05
    assert d01 < d05


def test_containment_of_true_subset(corpus, tmp_path):
    out = tmp_path / "contain.bin"
    # asymmetric containment C(row, col) with half (subset) and base
    run_cli(["sketch", "-k", "21", "-S", "4096", "--binary-output",
             "--containment", "--asymmetric-all-pairs",
             "--cmpout", str(out), corpus["half"], corpus["base"]])
    m = np.fromfile(out, np.float32).reshape(2, 2)
    # reference divides the intersection by the COLUMN cardinality in the
    # full-register path (cmp_core.cpp:484): m[0,1] = isz/|base|,
    # m[1,0] = isz/|half|; the subset's side should be ~1
    assert abs(m[1, 0] - 1.0) < 0.08 or abs(m[0, 1] - 1.0) < 0.08, m
    assert m.min() >= 0.4  # half the genome is shared at least


def test_intersection_union_sizes(corpus, tmp_path):
    ka = _distinct_kmers(corpus["base"])
    kb = _distinct_kmers(corpus["mut01"])
    true_isz = len(np.intersect1d(ka, kb))
    true_union = len(np.union1d(ka, kb))
    out1 = tmp_path / "isz.bin"
    out2 = tmp_path / "usz.bin"
    args = ["sketch", "-k", "21", "-S", "4096", "--binary-output"]
    run_cli(args + ["--intersection", "--cmpout", str(out1),
                    corpus["base"], corpus["mut01"]])
    run_cli(args + ["--union-size", "--cmpout", str(out2),
                    corpus["base"], corpus["mut01"]])
    isz = float(np.fromfile(out1, np.float32)[0])
    usz = float(np.fromfile(out2, np.float32)[0])
    assert abs(isz - true_isz) / true_isz < 0.05, (isz, true_isz)
    assert abs(usz - true_union) / true_union < 0.05, (usz, true_union)


def test_cardinality_accuracy_end_to_end(corpus, tmp_path):
    out = tmp_path / "sk.bin"
    run_cli(["sketch", "-k", "21", "-S", "4096", "-o", str(out),
             corpus["base"], corpus["other"]])
    from dashing2_tpu import parse
    sig = parse.parse_binary_signatures(str(out))
    for i, name in enumerate(["base", "other"]):
        truth = len(_distinct_kmers(corpus[name]))
        est = sig.cardinalities[i]
        assert abs(est - truth) / truth < 0.05, (name, est, truth)


def test_unrelated_genomes_near_zero(corpus, tmp_path):
    out = tmp_path / "zero.bin"
    run_cli(["sketch", "-k", "21", "-S", "4096", "--binary-output",
             "--cmpout", str(out), corpus["base"], corpus["other"]])
    sim = float(np.fromfile(out, np.float32)[0])
    assert sim < 0.01, sim
