"""Compare-program warm-up (cmp.core.warm_pairwise_cache): the
synthetic pre-compile must land in the SAME jit executable cache the
production compare later hits, for every fused representation, and must
never change output (CLI identity is covered by forcing
DASHING2_TPU_WARM=1 on the CPU backend)."""

import os

import numpy as np
import pytest

from make_fixtures import make


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("warm")
    return make(str(d), n_genomes=72, length=6000)


def _opts(extra, paths):
    import dashing2_tpu.cli as cli
    cap = {}
    orig = cli._run
    cli._run = lambda a, top, opts, groups, *r: cap.update(
        opts=opts, groups=groups) or 0
    try:
        rc = cli.main(["sketch", "-k", "31", "-S", "256",
                       "--cmpout", "/dev/null"] + extra + list(paths))
        assert rc == 0
    finally:
        cli._run = orig
    return cap["opts"], cap["groups"]


@pytest.mark.parametrize("extra", [
    [],                                    # default full f64 registers
    ["--fastcmp", "1", "--bbit-sigs"],     # u8 b-bit
    ["--fastcmp", "0.5", "--bbit-sigs"],   # nibble
    ["--fastcmp", "1"],                    # u8 ab setsketch
])
def test_warm_hits_production_cache(corpus, extra, monkeypatch):
    monkeypatch.setenv("DASHING2_TPU_KERNEL", "swar")
    # pin the single-device route: under the 8-device CPU mesh both warm
    # and production ride the sharded engine instead of _self_matrix_fn
    monkeypatch.setenv("DASHING2_TPU_MULTICHIP", "0")
    import dashing2_tpu.cmp.core as C
    opts, groups = _opts(extra, corpus)
    n = len(groups)
    assert C.warm_pairwise_cache(opts, n) is True

    # the production fast path must now have a compiled entry for the
    # exact production shapes: sketch for real, snapshot the jitted
    # callable's cache size, run the real compare, and require no growth
    from dashing2_tpu.cli import _do_sketch
    result = _do_sketch(opts, groups, 0)
    creps, result = C._prep(opts, result)
    kind, data = C._representation(opts, result, creps)
    fn = C._self_matrix_fn(kind, opts.sketchsize, opts.measure, opts.k,
                           opts.fd_level)
    before = fn._cache_size()
    assert before >= 1, "warm-up compiled nothing"
    mat = C._self_pairs_matrix(opts, result, creps)
    assert mat is not None and mat.shape == (n, n)
    assert fn._cache_size() == before, \
        "production compare recompiled despite warm-up"


def test_warm_declines_out_of_range(corpus):
    import dashing2_tpu.cmp.core as C
    opts, groups = _opts([], corpus)
    assert C.warm_pairwise_cache(opts, 8) is False        # n < 64
    big = int(os.environ.get("DASHING2_TPU_WARM_MAX", 65536)) + 1
    assert C.warm_pairwise_cache(opts, big) is False      # > warm cap
    # between SELF_MAX and the warm cap the BLOCK program warms — but
    # only where the device block engine runs (not the CPU backend)
    mid = int(os.environ.get("DASHING2_TPU_SELF_MAX", 16384)) + 1
    assert C.warm_pairwise_cache(opts, mid) is False


def test_warm_block_program(corpus, monkeypatch):
    """N > SELF_MAX: the warm must compile the fused row-block program
    (_block_measures_swar_fn) for the production (block, n) shape so
    the job's first block doesn't pay the compile (measured ~189 s at
    n=32768 on the remote chip)."""
    monkeypatch.setenv("DASHING2_TPU_PAIR_DEVICE", "force")
    monkeypatch.setenv("DASHING2_TPU_SELF_MAX", "64")
    import dashing2_tpu.cmp.core as C
    opts, groups = _opts([], corpus)
    n = len(groups)
    assert n > 64
    assert C.warm_pairwise_cache(opts, n) is True

    from dashing2_tpu.cli import _do_sketch
    result = _do_sketch(opts, groups, 0)
    creps, result = C._prep(opts, result)
    kind, _ = C._representation(opts, result, creps)
    # production block shapes: full rows block (warmed) — the partial
    # tail block compiles separately
    blocks = dict(C.pairwise_matrix(opts, result))
    assert sum(b.shape[0] for b in blocks.values()) == n


def test_warm_panel(corpus, monkeypatch):
    monkeypatch.setenv("DASHING2_TPU_KERNEL", "swar")
    import dashing2_tpu.cmp.core as C
    opts, groups = _opts([], corpus)
    n = len(groups)
    assert C.warm_pairwise_cache(opts, n, nq=4) is True
