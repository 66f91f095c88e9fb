"""Round-4 session-3: phase decomposition of the north-star warm wall.

bench_e2e.bench_northstar measures 18.3 s WARM for the 10240 x 50 kb
`--fastcmp 0.5 --bbit-sigs` job; the known parts are ~4.2 s native host
sketch (512 Mbase at 121 Mbase/s on this 1-core host) and ~5.7 s f32
condensed-matrix pull (210 MB at the measured ~37 MB/s 4-stream tunnel
aggregate), leaving ~8 s unattributed. This run adds -v so the CLI
phase timers (timing.phase) print per-phase walls for cold + warm, and
keeps the fixtures in /tmp/d2_ns_fixtures for re-use across profiling
runs (bench_e2e regenerates its 520 MB corpus every invocation)."""
import os
import sys
import time

FIX = "/tmp/d2_ns_fixtures"
N, LENGTH = 10240, 50000

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from make_fixtures import make  # noqa: E402

t0 = time.perf_counter()
os.makedirs(FIX, exist_ok=True)
marker = os.path.join(FIX, ".complete")
if not os.path.exists(marker):
    fas = make(os.path.join(FIX, "ns"), n_genomes=N, length=LENGTH,
               seed=11)
    with open(marker, "w") as f:
        f.write("\n".join(fas) + "\n")
with open(marker) as f:
    fas = f.read().split()
print(f"fixtures ready ({time.perf_counter() - t0:.1f}s)", flush=True)

lst = os.path.join(FIX, "ns.txt")
with open(lst, "w") as f:
    f.write("\n".join(fas) + "\n")

from dashing2_tpu.cli import main as climain  # noqa: E402

for label in ("cold", "warm"):
    out = os.path.join(FIX, f"ns_{label}.bin")
    t0 = time.perf_counter()
    rc = climain(["sketch", "-k", "31", "-S", "1024", "--fastcmp", "0.5",
                  "--bbit-sigs", "--binary-output", "--cmpout", out,
                  "-v", "-F", lst])
    dt = time.perf_counter() - t0
    assert rc == 0
    print(f"northstar {label}: {dt:.2f}s", flush=True)
