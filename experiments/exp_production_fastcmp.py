"""Measure the PRODUCTION fused --fastcmp 0.5 self-pairs path at
N=10240 m=1024: nibble-packed registers -> tri counts -> f64 ab
epilogue -> f32 similarity matrix, all in the _self_matrix_fn jit.
Also times the epilogue-free counts and the bbit (eq-only) variant.
"""
import time

import numpy as np
import dashing2_tpu  # noqa  (x64)
import jax
import jax.numpy as jnp

from dashing2_tpu.cmp.core import _self_matrix_fn, _gb_args
from dashing2_tpu.enums import Measure


def timed_chain(make_fn, args, reps=3, K=4):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def main():
    n, m = 10240, 1024
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, size=(n, m // 2),
                                      dtype=np.uint16).astype(np.uint8))
    cards = jnp.asarray(rng.uniform(1e5, 1e7, size=n))
    b = jnp.float64(1.001)
    gbt, gbinv = _gb_args(1.001, m)
    gbt = jnp.asarray(gbt)
    up = n * (n - 1) / 2

    for kind, msr in (("nibble-ab", Measure.SIMILARITY),
                      ("nibble-bbit", Measure.SIMILARITY),
                      ("nibble-ab", Measure.POISSON_LLR)):
        fn = _self_matrix_fn(kind, m, msr, 31, 0.5)

        def mk(KK):
            @jax.jit
            def run(x, cards, b):
                def body(c, _):
                    mat = fn(c, cards, b, gbt, gbinv)
                    return c ^ (mat[0, 1].astype(jnp.int32) & 15
                                ).astype(jnp.uint8), mat.sum()
                c, s = jax.lax.scan(body, x, None, length=KK)
                return c[0, 0].astype(jnp.float32) + s.sum()
            return run
        t = timed_chain(mk, (packed, cards, b))
        print(f"{kind}/{msr.name}: {t*1e3:.2f} ms  {up/t/1e9:.2f} G "
              f"unique-pairs/s", flush=True)


if __name__ == "__main__":
    main()
