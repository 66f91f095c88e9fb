"""Round-4 sketch-engine shootout on the chip: production engines at
the production batch shape (256, 32768), m=1024 — dense (default),
dense2, rot (NEW subtract-trick), sort — with and without counts; plus
an HBM streaming-copy probe (the roofline denominator)."""
import time
import numpy as np
import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from dashing2_tpu import hashing as H
from dashing2_tpu.ops import sketch_kernels as SK

rng = np.random.default_rng(0)
R, NK, M = 256, 32768, 1024
hashed = jnp.asarray(rng.integers(1, 1 << 63, size=(R, NK)).astype(np.uint64))
valid = jnp.asarray(rng.random((R, NK)) < 0.97)

def timed(mk, args, reps=3, K1=2, K2=8):
    f1, f2 = mk(K1), mk(K2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*args)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    return best

def bench(name, fn, wc):
    def mk(K):
        @jax.jit
        def f(h, v):
            def body(c, _):
                r, cts = fn(c, v, m=M, seed=H.OPH_DEFAULT_SEED,
                            want_counts=wc)
                x = r[0, 0] & jnp.uint64(3)
                if wc:
                    x = x ^ cts[0, 0].astype(jnp.uint64)
                return c ^ x, None
            c, _ = jax.lax.scan(body, h, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    try:
        t = timed(mk, (hashed, valid))
        print(f"{name} (counts={wc}): {t*1e3:.2f} ms = "
              f"{R*NK/t/1e9:.3f} Gbase/s", flush=True)
    except Exception as e:
        print(f"{name} (counts={wc}): failed {type(e).__name__} {e}",
              flush=True)

for wc in (False, True):
    bench("rot", SK.oph_sketch_rows_rot, wc)
    bench("dense", SK.oph_sketch_rows_dense, wc)
    bench("dense2", SK.oph_sketch_rows_dense2, wc)
    bench("sort", SK.oph_sketch_rows_sort, wc)

# correctness on chip (small)
r1, c1 = SK.oph_sketch_rows_dense(hashed[:8, :4096], valid[:8, :4096], m=M)
r2, c2 = SK.oph_sketch_rows_rot(hashed[:8, :4096], valid[:8, :4096], m=M)
print("rot == dense on chip:", bool(jnp.array_equal(r1, r2) & jnp.array_equal(c1, c2)), flush=True)

# HBM streaming copy probe
big = jnp.asarray(rng.integers(0, 1 << 31, size=(8192, 8192), dtype=np.int64).astype(np.uint32))  # 256 MB
def mkc(K):
    @jax.jit
    def f(x):
        def body(c, _):
            return c + jnp.uint32(1), None
        c, _ = jax.lax.scan(body, x, None, length=K)
        return c[0, 0].astype(jnp.int32)
    return f
t = timed(mkc, (big,), K1=4, K2=32)
print(f"HBM rw chain (256 MB +1): {t*1e3:.3f} ms = {2*big.size*4/t/1e9:.0f} GB/s", flush=True)
