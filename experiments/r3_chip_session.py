"""One-process chip measurement session for the pending round-3 items.

The axon tunnel pays ~80-300 s of per-process compile time (the
persistent compile cache is written but never read back — CLAUDE.md),
so every pending experiment runs in ONE process:

  1. chip health probe (int8 matmul TOPS; numbers only meaningful when
     healthy ~317)
  2. r3_pack10     — pack10 gtlt vs pack16 halves (ab-u8 route)
  3. r3_oph_scatter — OPH update-engine shootout at production shape
                      (decides the TPU default engine)

Usage: python experiments/r3_chip_session.py [pack10|oph|all]
"""
import sys
import time

import numpy as np

import dashing2_tpu  # noqa: F401


def health():
    import jax
    import jax.numpy as jnp
    a = jnp.asarray(np.random.default_rng(0).integers(
        -100, 100, size=(4096, 4096), dtype=np.int32).astype(np.int8))

    @jax.jit
    def f(a):
        def body(c, _):
            d = jax.lax.dot_general(c, c, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (d & 127).astype(jnp.int8), None
        c, _ = jax.lax.scan(body, a, None, length=8)
        return c[0, 0].astype(jnp.int32)
    np.asarray(f(a))
    t0 = time.perf_counter()
    np.asarray(f(a))
    tops = 8 * 2 * 4096 ** 3 / (time.perf_counter() - t0) / 1e12
    print(f"== chip health: {tops:.0f} TOPS int8 (healthy ~317) ==",
          flush=True)
    return tops


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    print(f"backend: {jax.default_backend()}", flush=True)
    h = health()
    if h < 200:
        print("!! chip degraded — numbers below are not meaningful",
              flush=True)
    if which in ("pack10", "all"):
        print("-- r3_pack10 --", flush=True)
        import r3_pack10
        r3_pack10.main()
        health()
    if which in ("oph", "all"):
        print("-- r3_oph_scatter --", flush=True)
        import r3_oph_scatter
        r3_oph_scatter.main()
        health()


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
