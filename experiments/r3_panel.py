"""Round-3 panel benchmark: 10240 refs x 1024 queries through the fused
rectangular engine (VERDICT round-2 item 9: within 2x of the symmetric
per-pair rate). Pairs = nf * nq (every ref-query pair once)."""
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu.cmp import core as C
from dashing2_tpu.enums import Measure


def _timed_chain(make_fn, args, reps=3, K=3):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def main():
    nf, nq, m = 10240, 1024, 1024
    n = nf + nq
    pairs = nf * nq
    rng = np.random.default_rng(0)
    cards = jnp.asarray(rng.uniform(1e5, 1e7, size=n))
    gbt, gbinv = C._gb_args(1.2, m)
    gbt = jnp.asarray(gbt)
    u64 = jnp.asarray(rng.integers(0, 1 << 62, size=(n, m)
                                   ).astype(np.uint64))
    u8 = jnp.asarray(rng.integers(0, 256, size=(n, m)).astype(np.uint8))
    for name, kind, fd, data in [("full", "full", 8.0, u64),
                                 ("bbit-u8", "bbit", 1.0, u8)]:
        fn = C._panel_matrix_fn_m(kind, m, Measure.SIMILARITY, 31, fd,
                                  nf, "swar")

        def mk(K, fn=fn):
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
            print(f"fused panel {name} ({nf}x{nq}): {t*1e3:.2f} ms = "
                  f"{pairs/t/1e9:.2f} G pairs/s", flush=True)
        except Exception as e:
            print(f"panel {name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[:2]}", flush=True)


if __name__ == "__main__":
    main()
