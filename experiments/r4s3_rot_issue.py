"""Round-4 session-3: close the rot-engine issue-efficiency gap.

The subtract-trick rot OPH engine (ops/sketch_kernels.py:355) measures
19.1 ms/batch at (256, 32768, m=1024) against an 11.2 ms op-count
floor (5 vops per position-bucket at 4 vops/cycle — R4_ROOFLINE.md §3),
i.e. ~2.3/4 vops/cycle achieved.  Hypothesis: the per-(row-tile, bucket)
min ACCUMULATOR is a serial dependency chain (acc = min(acc, d_i)), so
the VPU stalls on min latency instead of issuing back-to-back.  Breaking
the chain with U independent accumulators (reshape the position axis to
(U, chunk/U), reduce each independently, combine at the end) should
recover issue slots.  Variants:

  p1_base       pass-1 as shipped: scan over nc chunks, d.min(axis=1)
  p1_acc{U}     pass-1 with U independent accumulator trees
  p1_chunk{C}   pass-1 at other chunk widths (scan granularity)
  p2_base       pass-2 as shipped (eq + select + min)
  p2_acc{U}     pass-2 with U accumulator trees
  full_base / full_best   end-to-end rot engine old vs new

All variants are timed with the chained-scan differential (K=2 vs K=8)
because single calls over the axon tunnel carry a ~30 ms dispatch floor.
"""
import time

import numpy as np

import dashing2_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
R, NK, M = 256, 32768, 1024
LGM = 10
S = 32 - LGM
U32MAX = jnp.uint32(0xFFFFFFFF)
hi_np = rng.integers(0, 1 << 32, size=(R, NK)).astype(np.uint32)
lo_np = rng.integers(0, 1 << 32, size=(R, NK)).astype(np.uint32)
hi_all = jnp.asarray(hi_np)
lo_all = jnp.asarray(lo_np)
colbase = (jnp.arange(M, dtype=jnp.uint32) << jnp.uint32(S))


def timed(mk, args, reps=3, K1=2, K2=8):
    f1, f2 = mk(K1), mk(K2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f2(*args)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    return best


def chunked(x, chunk):
    r, nc = x.shape[0], x.shape[1] // chunk
    return jnp.moveaxis(x.reshape(r, nc, chunk), 1, 0)


def p1_scan(chunk, accs):
    """Pass-1 hi min with `accs` independent accumulator trees."""
    def run(hi):
        hi_t = chunked(hi, chunk)

        def body(dmin, chi):
            if accs == 1:
                d = chi[:, :, None] - colbase[None, None, :]
                return jnp.minimum(dmin, d.min(axis=1)), None
            sub = chi.reshape(chi.shape[0], accs, chunk // accs)
            d = sub[:, :, :, None] - colbase[None, None, None, :]
            return jnp.minimum(dmin, d.min(axis=2).min(axis=1)), None

        dmin, _ = jax.lax.scan(body, jnp.full((hi.shape[0], M), U32MAX,
                                              jnp.uint32), hi_t)
        return dmin
    return run


def p2_scan(chunk, accs):
    """Pass-2 lo recovery given min_hi, with accumulator trees."""
    def run(hi, lo, min_hi):
        hi_t, lo_t = chunked(hi, chunk), chunked(lo, chunk)

        def body(lmin, xs):
            chi, clo = xs
            if accs == 1:
                on = chi[:, :, None] == min_hi[:, None, :]
                cmin = jnp.min(jnp.where(on, clo[:, :, None], U32MAX),
                               axis=1)
                return jnp.minimum(lmin, cmin), None
            shi = chi.reshape(chi.shape[0], accs, chunk // accs)
            slo = clo.reshape(chi.shape[0], accs, chunk // accs)
            on = shi[:, :, :, None] == min_hi[:, None, None, :]
            cmin = jnp.min(jnp.where(on, slo[:, :, :, None], U32MAX),
                           axis=2).min(axis=1)
            return jnp.minimum(lmin, cmin), None

        lmin, _ = jax.lax.scan(body, jnp.full((hi.shape[0], M), U32MAX,
                                              jnp.uint32), (hi_t, lo_t))
        return lmin
    return run


def bench_p1(name, chunk, accs):
    def mk(K):
        fn = p1_scan(chunk, accs)

        @jax.jit
        def f(hi):
            def body(c, _):
                d = fn(c)
                return c ^ d[:, :1], None
            c, _ = jax.lax.scan(body, hi, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    try:
        t = timed(mk, (hi_all,))
        print(f"{name}: {t*1e3:.2f} ms  ({R*NK/t/1e9:.3f} Gbase/s-equiv)",
              flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        return None


def bench_p2(name, chunk, accs, min_hi):
    def mk(K):
        fn = p2_scan(chunk, accs)

        @jax.jit
        def f(hi, lo):
            def body(c, _):
                l = fn(hi, c, min_hi)
                return c ^ l[:, :1], None
            c, _ = jax.lax.scan(body, lo, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    try:
        t = timed(mk, (hi_all, lo_all))
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        return None


# correctness of the acc variants vs base (small shape, on chip)
small_hi = hi_all[:4, :4096]
small_lo = lo_all[:4, :4096]
base1 = jax.jit(p1_scan(1024, 1))(small_hi)
for a in (2, 4, 8):
    v = jax.jit(p1_scan(1024, a))(small_hi)
    assert bool(jnp.array_equal(base1, v)), f"p1 acc{a} mismatch"
base2 = jax.jit(p2_scan(1024, 1))(small_hi, small_lo, base1)
for a in (2, 4, 8):
    v = jax.jit(p2_scan(1024, a))(small_hi, small_lo, base1)
    assert bool(jnp.array_equal(base2, v)), f"p2 acc{a} mismatch"
print("acc variants bit-identical on chip", flush=True)

bench_p1("p1_base   (chunk 4096, 1 acc)", 4096, 1)
bench_p1("p1_acc4   (chunk 4096, 4 acc)", 4096, 4)
bench_p1("p1_acc8   (chunk 4096, 8 acc)", 4096, 8)
bench_p1("p1_c8192  (chunk 8192, 1 acc)", 8192, 1)
bench_p1("p1_c8192a8(chunk 8192, 8 acc)", 8192, 8)
bench_p1("p1_c2048  (chunk 2048, 1 acc)", 2048, 1)

mh = jax.jit(p1_scan(4096, 1))(hi_all)
bench_p2("p2_base   (chunk 4096, 1 acc)", 4096, 1, mh)
bench_p2("p2_acc4   (chunk 4096, 4 acc)", 4096, 4, mh)
bench_p2("p2_acc8   (chunk 4096, 8 acc)", 4096, 8, mh)
