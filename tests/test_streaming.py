"""Streaming ingest (lazy items + finalize-on-advance) must produce
results identical to the eager path for every representation."""

import os

import numpy as np
import pytest

from make_fixtures import make
from dashing2_tpu.config import Dashing2Options
from dashing2_tpu.enums import KmerSketchResultType as KR
from dashing2_tpu.enums import SketchSpace
from dashing2_tpu.sketch.core import sketch_fastx


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("fa_stream")
    return make(str(d), n_genomes=6, length=5000)


def _run(opts, groups, stream):
    os.environ["DASHING2_TPU_STREAM"] = "1" if stream else "0"
    try:
        return sketch_fastx(opts, groups)
    finally:
        del os.environ["DASHING2_TPU_STREAM"]


@pytest.mark.parametrize("kres,space", [
    (KR.ONE_PERM, SketchSpace.SPACE_SET),
    (KR.FULL_SETSKETCH, SketchSpace.SPACE_SET),
    (KR.FULL_MMER_SET, SketchSpace.SPACE_SET),
    (KR.FULL_MMER_COUNTDICT, SketchSpace.SPACE_SET),
    (KR.FULL_MMER_SEQUENCE, SketchSpace.SPACE_SET),
    (KR.FULL_SETSKETCH, SketchSpace.SPACE_MULTISET),
    (KR.FULL_SETSKETCH, SketchSpace.SPACE_PSET),
])
def test_stream_matches_eager(fixtures, kres, space):
    opts = Dashing2Options(k=17, sketchsize=128, kmer_result=kres,
                           sspace=space, w=21 if kres == KR.FULL_MMER_SEQUENCE
                           else 17)
    r1 = _run(opts, fixtures, stream=False)
    r2 = _run(opts, fixtures, stream=True)
    assert r1.names == r2.names
    assert np.array_equal(r1.cardinalities, r2.cardinalities)
    if r1.signatures is not None:
        assert np.array_equal(np.asarray(r1.signatures),
                              np.asarray(r2.signatures))
    if r1.kmer_sets is not None:
        for a, b in zip(r1.kmer_sets, r2.kmer_sets):
            assert np.array_equal(a, b)
    if r1.kmer_set_counts is not None:
        for a, b in zip(r1.kmer_set_counts, r2.kmer_set_counts):
            assert np.array_equal(a, b)
    if r1.mmer_sequences is not None:
        for a, b in zip(r1.mmer_sequences, r2.mmer_sequences):
            assert np.array_equal(a, b)


def test_stream_parse_by_seq(fixtures):
    opts = Dashing2Options(k=17, sketchsize=128, parse_by_seq=True)
    r1 = _run(opts, fixtures[:3], stream=False)
    r2 = _run(opts, fixtures[:3], stream=True)
    assert r1.names == r2.names
    assert np.array_equal(np.asarray(r1.signatures),
                          np.asarray(r2.signatures))


def test_stream_threaded_counting(fixtures):
    opts = Dashing2Options(k=17, sketchsize=128,
                           kmer_result=KR.FULL_MMER_COUNTDICT,
                           nthreads=4)
    r1 = _run(opts, fixtures, stream=False)
    r2 = _run(opts, fixtures, stream=True)
    for a, b in zip(r1.kmer_sets, r2.kmer_sets):
        assert np.array_equal(a, b)
    for a, b in zip(r1.kmer_set_counts, r2.kmer_set_counts):
        assert np.array_equal(a, b)
