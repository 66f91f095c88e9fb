"""dense_ranks cost variants (the panel jobs' 77% — R4_ROOFLINE §2).

Shape: (N, m) u64 -> per-column dense ranks, N=11264 (panel refs+
queries), m=1024. Variants:
  A. current: (hi, lo, iota) num_keys=2 sort + packed unpermute sort
  B. u64 single-key + iota payload (emulated u64 comparator)
  C. (hi, lo, iota) num_keys=2, is_stable=True
  D. rank via ONE sort + in-sorted-order eq tiles? (not a rank at all:
     measure the sort alone = lower bound)
"""
import time
import numpy as np
import dashing2_tpu  # noqa
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N, M = 11264, 1024
x = jnp.asarray(rng.integers(0, 1 << 63, size=(N, M)).astype(np.uint64))

def timed(mk, args, reps=3, K1=1, K2=5):
    f1, f2 = mk(K1), mk(K2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*args)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    return best

def chain(fn):
    def mk(K):
        @jax.jit
        def f(x):
            def body(c, _):
                r = fn(c)
                return c ^ (r[:1, :1].astype(jnp.uint64)), r[0, 0]
            c, s = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32) + s.sum()
        return f
    return mk

from dashing2_tpu.ops.cmp_kernels import dense_ranks, _split_u64

def ranks_u64key(x):
    n = x.shape[0]
    xt = x.T
    iota = jax.lax.broadcasted_iota(jnp.int32, xt.shape, 1)
    sk, si = jax.lax.sort((xt, iota), dimension=1, num_keys=1, is_stable=False)
    neq = sk[:, 1:] != sk[:, :-1]
    r = jnp.concatenate([jnp.zeros((neq.shape[0], 1), jnp.int32),
                         jnp.cumsum(neq.astype(jnp.int32), axis=1)], axis=1)
    packed = (si << 15) | r
    out = jax.lax.sort(packed, dimension=1, is_stable=False)
    return (out & jnp.int32(0x7FFF)).T

def sort_only(x):
    hi, lo = _split_u64(x)
    o = jax.lax.sort((hi.T, lo.T), dimension=1, num_keys=2, is_stable=False)
    return o[0].T.astype(jnp.int32)

for name, fn in [("A current dense_ranks", dense_ranks),
                 ("B u64-key", ranks_u64key),
                 ("D 2key sort only (bound)", sort_only)]:
    try:
        t = timed(chain(fn), (x,))
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: failed {type(e).__name__} {e}", flush=True)

# correctness of B vs A
a = np.asarray(dense_ranks(x[:512, :64]))
bv = np.asarray(ranks_u64key(x[:512, :64]))
print("B == A:", np.array_equal(a, bv), flush=True)
