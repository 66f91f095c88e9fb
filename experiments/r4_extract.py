"""Pair-value extraction variants from a resident (N, N) u32 count
matrix (the memoized pair-list route's second half). bench r4 measured
flat jnp.take of 1M elements at 13.4 ms (75 M/s, scalar-unit bound) —
SLOWER per pair than the 4 KB/pair row-gather engine (126 M/s).
Variants probed here:
  A flat take, random idx       (baseline)
  B flat take, SORTED idx       (locality?)
  C take_along_axis (Q, K) grouped rows
  D row-take block + local flat take (VMEM-sized source)
  E one-hot lane contraction per query block (no gather at all)
"""
import time
import numpy as np
import dashing2_tpu  # noqa
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N = 10240
P = 1 << 20
mat = jnp.asarray(rng.integers(0, 1 << 31, size=(N, N), dtype=np.int64).astype(np.uint32))
matf = mat.reshape(-1)
ia = rng.integers(0, N, size=P).astype(np.int32)
ib = rng.integers(0, N, size=P).astype(np.int32)
idx = jnp.asarray(ia.astype(np.int64) * N + ib)
idx_sorted = jnp.asarray(np.sort(ia.astype(np.int64) * N + ib))
K = P // N  # 102 per query, grouped
Q = N
cand = jnp.asarray(rng.integers(0, N, size=(Q, K)).astype(np.int32))

def timed(mk, args, reps=3, K1=1, K2=4):
    f1, f2 = mk(K1), mk(K2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*args)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    return best

def bench(name, fn, args, npairs=P):
    def mk(KN):
        @jax.jit
        def f(*a):
            def body(c, _):
                v = fn(*a, c)
                return c ^ (v.reshape(-1)[:1] & 1).astype(c.dtype), v.sum(dtype=jnp.uint32)
            c, s = jax.lax.scan(body, a[-1] if False else jnp.uint32(0) * 0 + args[-1], None, length=KN)
            return (c.reshape(-1)[0] + s.sum()).astype(jnp.int32)
        return f
    try:
        t = timed(mk, args)
        print(f"{name}: {t*1e3:.2f} ms = {npairs/t/1e6:.0f} M pairs/s", flush=True)
    except Exception as e:
        print(f"{name}: failed {type(e).__name__}: {e}", flush=True)

# A/B flat takes: carry = idx (xored trivially to keep data dependence)
def mkA(idxv):
    def mk(KN):
        @jax.jit
        def f(mf, ix):
            def body(c, _):
                v = jnp.take(mf, c)
                return c ^ (v[:1] & 1).astype(c.dtype), v.sum(dtype=jnp.uint32)
            c, s = jax.lax.scan(body, ix, None, length=KN)
            return (c[0] + s.sum()).astype(jnp.int32)
        return f
    return mk

for name, ixv in (("A flat random", idx.astype(jnp.int32)),
                  ("B flat sorted", idx_sorted.astype(jnp.int32))):
    t = timed(mkA(None), (matf, ixv))
    print(f"{name}: {t*1e3:.2f} ms = {P/t/1e6:.0f} M pairs/s", flush=True)

# C take_along_axis grouped: rows q = arange(Q), take row then along-axis
def mkC(KN):
    @jax.jit
    def f(mat, cand):
        def body(c, _):
            v = jnp.take_along_axis(mat, c, axis=1)
            return c ^ (v[:1, :1] & 1).astype(c.dtype), v.sum(dtype=jnp.uint32)
        c, s = jax.lax.scan(body, cand, None, length=KN)
        return (c[0, 0] + s.sum()).astype(jnp.int32)
    return f
t = timed(mkC, (mat, cand))
print(f"C take_along (Q,K) grouped: {t*1e3:.2f} ms = {Q*K/t/1e6:.0f} M pairs/s", flush=True)

# D: block scan: 1024-row blocks; pairs grouped by block, local flat take
B = 1024
perm = np.argsort(ia >> 10, kind="stable")
ia_b, ib_b = ia[perm], ib[perm]
# pad each block's pairs to equal PB
PB = -(-P // (N // B))
loc = np.full((N // B, PB), 0, np.int32)
cnt = np.zeros(N // B, np.int64)
for q, c in zip(ia_b, ib_b):
    blk = q >> 10
    loc[blk, cnt[blk] % PB] = (q & 1023) * N + c
    cnt[blk] += 1
locj = jnp.asarray(loc)
def mkD(KN):
    @jax.jit
    def f(mat, loc):
        m3 = mat.reshape(N // B, B * N)
        def body(c, xs):
            blk, lx = xs
            v = jnp.take(blk, lx)
            return c + v.sum(dtype=jnp.uint32), None
        c, _ = jax.lax.scan(body, jnp.uint32(0), (m3, loc))
        return c.astype(jnp.int32)
    def g(mat, loc):
        def body(c, _):
            r = f(mat, loc)
            return c + r, None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=KN)
        return c
    return jax.jit(g)
t = timed(mkD, (mat, locj))
print(f"D block-local take: {t*1e3:.2f} ms = {P/t/1e6:.0f} M pairs/s", flush=True)

# E: one-hot lane contraction, scan over K columns of cand
def mkE(KN):
    @jax.jit
    def f(mat, cand):
        iot = jnp.arange(N, dtype=jnp.int32)[None, :]
        def body(c, ck):
            on = iot == ck[:, None]
            v = jnp.where(on, mat, jnp.uint32(0)).sum(1, dtype=jnp.uint32)
            return c + v.sum(dtype=jnp.uint32), None
        c, _ = jax.lax.scan(body, jnp.uint32(0), cand.T[:, :, None].squeeze(-1))
        return c.astype(jnp.int32)
    def g(mat, cand):
        def body(c, _):
            return c + f(mat, cand), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=KN)
        return c
    return jax.jit(g)
t = timed(mkE, (mat, cand))
print(f"E one-hot contraction: {t*1e3:.2f} ms = {Q*K/t/1e6:.0f} M pairs/s", flush=True)
