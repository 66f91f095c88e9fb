"""Linearity check for the int8 4096^3 MXU probe (r4_probes2 measured
736.7 TOPS, ABOVE the 394 TOPS v5e datasheet number — either the chip's
int8 path is 4x bf16 here, or the differential chain undercounts).
Chain K data-dependent matmuls and check t(K) is affine in K with a
slope that gives a consistent TOPS."""
import time
import numpy as np
import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
n = 4096
a = jnp.asarray(rng.integers(-100, 100, size=(n, n), dtype=np.int32)).astype(jnp.int8)
b = jnp.asarray(rng.integers(-100, 100, size=(n, n), dtype=np.int32)).astype(jnp.int8)

def mk(K):
    @jax.jit
    def f(a, b):
        def body(c, _):
            d = jax.lax.dot_general(c, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            s = (d.sum(axis=1, dtype=jnp.int32) & 1).astype(jnp.int8)
            return c ^ s[:, None], None
        c, _ = jax.lax.scan(body, a, None, length=K)
        return c.sum(dtype=jnp.int32)
    return f

ts = {}
for K in (64, 128, 256):
    f = mk(K)
    np.asarray(f(a, b))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f(a, b)); best = min(best, time.perf_counter() - t0)
    ts[K] = best
    print(f"K={K}: {best*1e3:.2f} ms", flush=True)
for (k1, k2) in ((64, 128), (128, 256), (64, 256)):
    dt = (ts[k2] - ts[k1]) / (k2 - k1)
    print(f"slope {k1}->{k2}: {dt*1e3:.3f} ms/matmul = {2*n**3/dt/1e12:.1f} TOPS", flush=True)
