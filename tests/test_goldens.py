"""Byte-exact regression pins for every major output mode.

The goldens encode the replicated scalar semantics (hash chain, OPH
bucket math, estimator forms incl. the documented deviations in
README/PARITY.md). Any byte diff here is either a regression or a NEW
deviation that must be documented and the goldens regenerated
(tests/gen_goldens.py)."""

import os

import pytest

import golden_configs

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "goldens")


@pytest.mark.skipif(not os.path.isdir(GOLD), reason="no goldens committed")
def test_outputs_match_goldens(tmp_path):
    produced = golden_configs.run_all(str(tmp_path))
    mismatches = []
    for rel in produced:
        with open(tmp_path / rel, "rb") as f:
            got = f.read()
        gp = os.path.join(GOLD, rel)
        assert os.path.isfile(gp), f"golden missing: {rel}"
        with open(gp, "rb") as f:
            want = f.read()
        if got != want:
            mismatches.append((rel, len(got), len(want)))
    assert not mismatches, mismatches
