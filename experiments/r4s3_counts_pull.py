"""Round-4 session-3: counts-pull route validation + walls on the chip.

1. Byte-identity of the u16 counts-pull route vs the fused f32 route on
   the REAL device (small n, both routes run).
2. North-star repeat walls (10240 x 50 kb corpus pre-generated in
   /tmp/d2_ns_fixtures) with the route on (default) — compare against
   the 18.3-21.2 s f32-route warm walls.
3. blockpath-32k warm wall with the route on (f32 route measured 65 s).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import dashing2_tpu  # noqa: F401,E402
from dashing2_tpu.cmp import core as C  # noqa: E402
from dashing2_tpu.config import Dashing2DistOptions  # noqa: E402
from dashing2_tpu.enums import Measure  # noqa: E402
from dashing2_tpu.result import SketchingResult  # noqa: E402


def collect(opts, res, upper_only=True):
    if hasattr(res, "_pair_dev_cache"):
        del res._pair_dev_cache
    out = {}
    for start, blk in C.pairwise_matrix(opts, res, upper_only=upper_only):
        out[start] = np.asarray(blk).copy()
    return out


# 1. byte identity on device (self route, full kind)
rng = np.random.default_rng(3)
n, m = 2048, 1024
res = SketchingResult(names=[f"g{i}" for i in range(n)])
res.signatures = rng.random((n, m)) + 0.5
res.cardinalities = rng.random(n) * 1e5 + 10.0
for msr in (Measure.SIMILARITY,):
    # SIMILARITY only engages the route (sim-table epilogue); the
    # card-dependent measures keep the f32 route by measurement
    # (r4s3_counts_pull_diag.py: TPU divide is not IEEE-identical)
    opts = Dashing2DistOptions(k=31, sketchsize=m, measure=msr)
    os.environ["DASHING2_TPU_PULL_COUNTS"] = "0"
    ref = collect(opts, res)
    os.environ["DASHING2_TPU_PULL_COUNTS"] = "1"
    got = collect(opts, res)
    same = all(np.array_equal(ref[k], got[k], equal_nan=True)
               for k in ref)
    print(f"self route byte-identical on chip ({msr.name}): {same}",
          flush=True)
    assert same
os.environ.pop("DASHING2_TPU_PULL_COUNTS", None)

# 2. north-star walls (route on by default)
FIX = "/tmp/d2_ns_fixtures"
if os.path.exists(os.path.join(FIX, ".complete")):
    from dashing2_tpu.cli import main as climain
    with open(os.path.join(FIX, ".complete")) as f:
        fas = f.read().split()
    lst = os.path.join(FIX, "ns.txt")
    with open(lst, "w") as f:
        f.write("\n".join(fas) + "\n")
    ref_out = os.path.join(FIX, "ns_warm.bin")  # f32-route output
    for label in ("cold", "warm"):
        out = os.path.join(FIX, f"ns_cp_{label}.bin")
        t0 = time.perf_counter()
        rc = climain(["sketch", "-k", "31", "-S", "1024", "--fastcmp",
                      "0.5", "--bbit-sigs", "--binary-output",
                      "--cmpout", out, "-v", "-F", lst])
        dt = time.perf_counter() - t0
        assert rc == 0
        print(f"northstar counts-pull {label}: {dt:.2f}s", flush=True)
    if os.path.exists(ref_out):
        with open(ref_out, "rb") as f1, open(out, "rb") as f2:
            print("northstar output == f32-route output:",
                  f1.read() == f2.read(), flush=True)

# 3. blockpath-32k warm wall
nb = int(os.environ.get("DASHING2_TPU_BENCH_BLOCK_N", 32768))
rngb = np.random.default_rng(0xb10c)
resb = SketchingResult(names=[f"g{i}" for i in range(nb)])
resb.signatures = rngb.random((nb, 1024)) + 0.5
resb.cardinalities = rngb.random(nb) * 1e6 + 10.0
optsb = Dashing2DistOptions(k=31, sketchsize=1024)
walls = []
for _ in range(2):
    t0 = time.perf_counter()
    total = 0
    checksum = 0.0
    for lo, blk in C.pairwise_matrix(optsb, resb, upper_only=True):
        total += blk.size
        checksum += float(np.asarray(blk[:, -1:]).sum())
    walls.append(time.perf_counter() - t0)
print(f"blockpath-32k counts-pull: cold {walls[0]:.1f}s warm "
      f"{walls[1]:.1f}s checksum {checksum:.3f}", flush=True)
