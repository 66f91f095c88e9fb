"""Round-5: native OPH file-driver phase split on the north-star corpus.

Measures, on one host core:
  1. pure read+encode wall (fastx reader, LUT, no sketching)
  2. full file-driver sketch wall (read+encode+hash+bucket-min)
  3. chunk-batched native engine wall (the pre-round-5 route)
The difference (2)-(1) isolates the hash+bucket-min kernel cost; the
per-base rates bound what further C++ kernel work could buy the
north-star sketch phase.

Run AFTER any chip work is idle (1 core; contention inflates 3x):
    python experiments/r5_oph_kernel.py [n]
"""

import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    length = 50000
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from make_fixtures import make
    import numpy as np
    import dashing2_tpu  # noqa: F401
    from dashing2_tpu import native as NAT
    from dashing2_tpu.io import fastx
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.sketch import core as SC
    from dashing2_tpu.ops.kmers import alphabet_lut
    from dashing2_tpu.enums import Alphabet

    d = os.environ.get("NS_FIXDIR", f"/tmp/nsfix_{n}")
    fas = make(d, n_genomes=n, length=length, seed=11)
    gbase = n * length / 1e9

    # 1. pure read+encode through the native reader
    lib = NAT.load_fastx_lib()
    lut = alphabet_lut(Alphabet.DNA).tobytes()
    t0 = time.perf_counter()
    tot = 0
    for p in fas:
        h = lib.fxr_open(p.encode(), lut)
        name_p = ctypes.c_char_p()
        seq_p = ctypes.POINTER(ctypes.c_ubyte)()
        while True:
            ln = lib.fxr_next(h, ctypes.byref(name_p),
                              ctypes.byref(seq_p))
            if ln < 0:
                break
            tot += ln
        lib.fxr_close(h)
    t_read = time.perf_counter() - t0
    print(f"read+encode only: {t_read:.2f} s = "
          f"{gbase / t_read:.3f} Gbase/s ({tot / 1e9:.3f} Gbase)")

    # 2. full file-driver sketch
    opts = Dashing2Options(k=31, sketchsize=1024, cache_sketches=False)
    for env, tag in (("force", "file-driver"), ("0", "chunk-batched")):
        os.environ["DASHING2_TPU_NATIVE_FILES"] = env
        if env == "0":
            os.environ["DASHING2_TPU_OPH_ENGINE"] = "native"
        t0 = time.perf_counter()
        res = SC.sketch_fastx(opts, fas)
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.2f} s = {gbase / dt:.3f} Gbase/s "
              f"(kernel-only ~= {gbase / max(dt - t_read, 1e-9):.3f} "
              f"Gbase/s)")
        os.environ.pop("DASHING2_TPU_OPH_ENGINE", None)
    os.environ.pop("DASHING2_TPU_NATIVE_FILES", None)
    del res, np


if __name__ == "__main__":
    main()
