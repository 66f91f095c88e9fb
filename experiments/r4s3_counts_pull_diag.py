"""Which (kind, measure) pairs survive the counts-pull route BIT-EXACTLY
on the real chip? The CPU backend matched everywhere (XLA:CPU divide is
IEEE); on the TPU the CONTAINMENT epilogue diverged — suspect the TPU
f32 divide lowering. This prints max-ulp / mismatch counts per cell so
the route's default gate is set by measurement, not assumption."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import dashing2_tpu  # noqa: F401,E402
from dashing2_tpu.cmp import core as C  # noqa: E402
from dashing2_tpu.config import Dashing2DistOptions  # noqa: E402
from dashing2_tpu.enums import Measure  # noqa: E402
from dashing2_tpu.result import SketchingResult  # noqa: E402


def ulpdiff(a, b):
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # map to monotone integer line (sign-magnitude -> two's complement)
    ai = np.where(ai < 0, np.int64(-(1 << 31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(1 << 31)) - bi, bi)
    d = np.abs(ai - bi)
    both_nan = np.isnan(a) & np.isnan(b)
    return np.where(both_nan, 0, d)


def run(kind_label, res, opts):
    creps, res_p = C._prep(opts, res)
    kind_label = C._representation(opts, res_p, creps)[0]
    os.environ["DASHING2_TPU_PULL_COUNTS"] = "0"
    if hasattr(res, "_pair_dev_cache"):
        del res._pair_dev_cache
    ref = {s: np.asarray(b).copy()
           for s, b in C.pairwise_matrix(opts, res, upper_only=True)}
    os.environ["DASHING2_TPU_PULL_COUNTS"] = "1"
    if hasattr(res, "_pair_dev_cache"):
        del res._pair_dev_cache
    got = {s: np.asarray(b).copy()
           for s, b in C.pairwise_matrix(opts, res, upper_only=True)}
    os.environ.pop("DASHING2_TPU_PULL_COUNTS", None)
    mx, cnt, tot = 0, 0, 0
    for s in ref:
        d = ulpdiff(ref[s], got[s])
        mx = max(mx, int(d.max()))
        cnt += int((d > 0).sum())
        tot += d.size
    print(f"{kind_label:12s} {opts.measure.name:22s} max_ulp={mx} "
          f"mismatches={cnt}/{tot}", flush=True)


rng = np.random.default_rng(7)
n, m = 512, 1024
MEAS = [Measure.SIMILARITY, Measure.CONTAINMENT, Measure.INTERSECTION,
        Measure.SYMMETRIC_CONTAINMENT, Measure.UNION_SIZE]

# full kind (ordered f64 signatures)
res = SketchingResult(names=[f"g{i}" for i in range(n)])
res.signatures = rng.random((n, m)) + 0.5
res.cardinalities = rng.random(n) * 1e5 + 10.0
for msr in MEAS:
    run("full", res, Dashing2DistOptions(k=31, sketchsize=m, measure=msr))

# bbit u8 kind (fastcmp 1): creps.data u8 via truncation
from dashing2_tpu.cmp.core import make_compressed  # noqa: E402,F401
res2 = SketchingResult(names=[f"g{i}" for i in range(n)])
res2.signatures = rng.random((n, m)) + 0.5
res2.cardinalities = rng.random(n) * 1e5 + 10.0
for msr in MEAS:
    o = Dashing2DistOptions(k=31, sketchsize=m, measure=msr)
    o.fd_level = 1.0
    o.truncation_method = 1      # b-bit signature truncation
    run("bbit-u8", res2, o)

# nibble-bbit (fastcmp 0.5 --bbit-sigs)
res3 = SketchingResult(names=[f"g{i}" for i in range(n)])
res3.signatures = rng.random((n, m)) + 0.5
res3.cardinalities = rng.random(n) * 1e5 + 10.0
for msr in MEAS:
    o = Dashing2DistOptions(k=31, sketchsize=m, measure=msr)
    o.fd_level = 0.5
    o.truncation_method = 1
    run("nibble-bbit", res3, o)
