"""Statistical accuracy of the weighted sketch estimators (the asserted
version of the reference's eyeball harness test/oph.cpp, extended to the
weighted spaces)."""

import numpy as np

from dashing2_tpu.sketch.weighted import bagminhash_many, probminhash_many


def _weighted_sets(rng, n_items=600, overlap=0.6):
    ids = rng.choice(1 << 62, size=n_items, replace=False).astype(np.uint64)
    wa = rng.gamma(2.0, 2.0, size=n_items)
    wb = wa.copy()
    flip = rng.random(n_items) > overlap
    wb[flip] = rng.gamma(2.0, 2.0, size=int(flip.sum()))
    keep_a = rng.random(n_items) < 0.9
    keep_b = rng.random(n_items) < 0.9
    a, ca = ids[keep_a], wa[keep_a]
    b, cb = ids[keep_b], wb[keep_b]
    # ground truths over the union
    awm = {int(i): w for i, w in zip(a, ca)}
    bwm = {int(i): w for i, w in zip(b, cb)}
    keys = set(awm) | set(bwm)
    mins = sum(min(awm.get(k, 0.0), bwm.get(k, 0.0)) for k in keys)
    maxs = sum(max(awm.get(k, 0.0), bwm.get(k, 0.0)) for k in keys)
    jw = mins / maxs
    return (a, ca, b, cb, jw)


def test_weighted_jaccard_accuracy():
    rng = np.random.default_rng(3)
    m = 2048
    a, ca, b, cb, jw = _weighted_sets(rng)
    sigs, cards = bagminhash_many([a, b], [ca, cb], m)
    est = (sigs[0] == sigs[1]).mean()
    tol = 4 * np.sqrt(jw * (1 - jw) / m) + 1e-3
    assert abs(est - jw) < tol, (est, jw, tol)
    # total weights come back as cardinalities
    np.testing.assert_allclose(cards, [ca.sum(), cb.sum()], rtol=1e-6)


def test_probminhash_probability_jaccard_accuracy():
    rng = np.random.default_rng(4)
    m = 2048
    a, ca, b, cb, _ = _weighted_sets(rng)
    awm = {int(i): w for i, w in zip(a, ca)}
    bwm = {int(i): w for i, w in zip(b, cb)}
    keys = set(awm) & set(bwm)
    jp = 0.0
    for d in keys:
        denom = sum(max(awm.get(q, 0.0) / awm[d], bwm.get(q, 0.0) / bwm[d])
                    for q in set(awm) | set(bwm))
        jp += 1.0 / denom
    sigs, _ = probminhash_many([a, b], [ca, cb], m)
    est = (sigs[0] == sigs[1]).mean()
    tol = 4 * np.sqrt(jp * (1 - jp) / m) + 1e-3
    assert abs(est - jp) < tol, (est, jp, tol)


def test_disjoint_and_identical_sets():
    rng = np.random.default_rng(5)
    m = 512
    ids1 = rng.choice(1 << 62, size=100, replace=False).astype(np.uint64)
    ids2 = (ids1 + np.uint64(1 << 62)).astype(np.uint64)
    w = rng.gamma(2.0, 1.0, size=100)
    sigs, _ = bagminhash_many([ids1, ids1, ids2], [w, w, w], m)
    assert (sigs[0] == sigs[1]).all()          # identical weighted sets
    assert (sigs[0] == sigs[2]).mean() < 0.05  # disjoint
    psigs, _ = probminhash_many([ids1, ids1, ids2], [w, w, w], m)
    assert (psigs[0] == psigs[1]).all()
    assert (psigs[0] == psigs[2]).mean() < 0.05
