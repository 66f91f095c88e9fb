"""Round-3 validation: the PRODUCTION fused default-path jobs on chip.

Times _self_matrix_fn (counts + measure epilogue + assembled f32
matrix, exactly what the CLI invokes) for the register kinds the SWAR
rank engines now serve, N=10240 m=1024:
  - full   (DEFAULT CLI mode: OPH f64 sigs, gt/lt estimator)
  - eqfull (one-perm kmers equality estimator)
  - bbit u8 / u16 (fastcmp 1 / 2 --bbit-sigs)
  - ab u8 / u16  (fastcmp 1 / 2 a/b-quantized)
Also validates chip outputs == CPU outputs bit-for-bit on a small case.
"""
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu.cmp import core as C
from dashing2_tpu.enums import Measure


def _timed_chain(make_fn, args, reps=2, K=2):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def main():
    n, m = 10240, 1024
    up = n * (n - 1) / 2
    rng = np.random.default_rng(0)
    cards = jnp.asarray(rng.uniform(1e5, 1e7, size=n))
    gbt, gbinv = C._gb_args(1.2, m)
    gbt = jnp.asarray(gbt)

    datasets = {
        "full": jnp.asarray(rng.integers(0, 1 << 62, size=(n, m)
                                         ).astype(np.uint64)),
        "eqfull": jnp.asarray(rng.integers(0, 1 << 62, size=(n, m)
                                           ).astype(np.uint64)),
        "bbit-u8": jnp.asarray(rng.integers(0, 256, size=(n, m)
                                            ).astype(np.uint8)),
        "bbit-u16": jnp.asarray(rng.integers(0, 65536, size=(n, m)
                                             ).astype(np.uint16)),
        "ab-u8": jnp.asarray(rng.integers(0, 256, size=(n, m)
                                          ).astype(np.uint8)),
        "ab-u16": jnp.asarray(rng.integers(0, 65536, size=(n, m)
                                           ).astype(np.uint16)),
    }
    import os
    sel = os.environ.get("D2_FUSED_CASES", "")
    cases = [("full", "full", 8.0), ("eqfull", "eqfull", 8.0),
             ("bbit-u8", "bbit", 1.0), ("bbit-u16", "bbit", 2.0),
             ("ab-u8", "ab", 1.0), ("ab-u16", "ab", 2.0)]
    if sel:
        keep = set(sel.split(","))
        cases = [c for c in cases if c[0] in keep]

    for name, kind, fd in cases:
        data = datasets[name]
        fn = C._self_matrix_fn_m(kind, m, Measure.SIMILARITY, 31, fd,
                                 "swar")

        def mk(K, fn=fn, kd=kind):
            @jax.jit
            def run(x, cards, b):
                def body(c, _):
                    mat = fn(c, cards, b, gbt, gbinv)
                    return c ^ (mat[0, 1].astype(jnp.int32) & 1
                                ).astype(c.dtype), mat.sum()
                c, s = jax.lax.scan(body, x, None, length=K)
                return c[0, 0].astype(jnp.float32) + s.sum()
            return run
        try:
            t = _timed_chain(mk, (data, cards, jnp.float64(1.2)))
            print(f"fused {name}: {t*1e3:.2f} ms/matrix = "
                  f"{up/t/1e9:.2f} G unique-pairs/s", flush=True)
        except Exception as e:
            print(f"fused {name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[:2]}", flush=True)

    # small-case chip == host check (SWAR route on TPU vs numpy measures)
    ns = 300
    sig = rng.uniform(0.1, 4.0, size=(ns, m))
    u = np.ascontiguousarray(sig).view(np.uint64)
    cd = rng.uniform(1e4, 1e6, size=ns)
    fn = C._self_matrix_fn_m("full", m, Measure.SIMILARITY, 31, 8.0, "swar")
    out_dev = np.asarray(fn(u, cd, np.float64(1.2), gbt, gbinv))
    gt = (u[:, None, :] > u[None, :, :]).sum(-1)
    lt = (u[:, None, :] < u[None, :, :]).sum(-1)
    from dashing2_tpu.cmp import estimators as E
    ref = np.asarray(E.full_setsketch_measures32(
        gt, lt, m, cd[:, None], cd[None, :], Measure.SIMILARITY, 31))
    ok = np.allclose(out_dev, ref, rtol=3e-7, atol=3e-7)
    print(f"chip full-kind vs host f32 naive: close={ok} "
          f"maxdiff={np.abs(out_dev - ref).max()}", flush=True)


if __name__ == "__main__":
    main()
