"""Round-4 probes, take 2: DCE-proof VPU/MXU/gather measurements.

The take-1 probes fed only d[0, 0] back into the chain, which lets XLA
slice the matmul/elementwise work to a single element (measured
"137438953 TOPS"). Every probe here consumes a FULL reduction of each
step's output inside the data dependence.

Goals:
  * real VPU lane-op rate (the SWAR engine denominator);
  * real MXU TOPS by shape — and WHY the round-3 health probe reads
    37.8/394 while the production counts kernel sustains 137 TOPS;
  * blocked row-gather bandwidth (the pair-list floor: the production
    engine gathers in 8192-row blocks inside a scan).
"""

import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def timed_chain(make_fn, args, reps=4, K=3):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    base = min(t1s)
    return min(max((t - base) / K, 1e-9) for t in tks)


def p(msg):
    print(msg, flush=True)


p("== VPU lane-op rate (full-consume) ==")
try:
    x0 = jnp.asarray(rng.integers(0, 1 << 31, size=(4096, 4096),
                                  dtype=np.int64).astype(np.uint32))

    def mk_vpu(K):
        @jax.jit
        def f(x):
            def body(c, _):
                for _ in range(4):
                    c = (c + jnp.uint32(2654435761)) ^ (c >> jnp.uint32(7))
                # full reduction feeds the carry: no element slicing
                s = c.sum(dtype=jnp.uint32)
                return c + s, None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c.sum(dtype=jnp.uint32).astype(jnp.int32)
        return f
    t = timed_chain(mk_vpu, (x0,), K=8)
    # 8 shift/add/xor ops + 1 reduce + 1 broadcast-add per elem per iter
    p(f"u32 chain 8ops+reduce: {t*1e3:.3f} ms = "
      f"{x0.size*10/t/1e12:.2f} T lane-ops/s (10 ops/elem accounting)")

    def mk_pc(K):
        @jax.jit
        def f(x):
            def body(c, _):
                c = c ^ jax.lax.population_count(c + jnp.uint32(1))
                return c + c.sum(dtype=jnp.uint32), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c.sum(dtype=jnp.uint32).astype(jnp.int32)
        return f
    t = timed_chain(mk_pc, (x0,), K=8)
    p(f"popcount chain: {t*1e3:.3f} ms = {x0.size*5/t/1e12:.2f} T "
      f"lane-ops/s (5 ops/elem accounting: pc,add,xor,reduce,bcast)")
except Exception as e:
    p(f"vpu probe failed: {e}")

p("== MXU TOPS by shape (full-consume) ==")


def mxu_probe(n, k, kind, steps=4, square_chain=False):
    """square_chain=True reproduces the round-3 health-probe shape:
    c <- (c @ c & 127).astype(int8)."""
    if kind == "int8":
        a = jnp.asarray(rng.integers(-100, 100, size=(n, k),
                                     dtype=np.int32)).astype(jnp.int8)
        b = jnp.asarray(rng.integers(-100, 100, size=(k, n),
                                     dtype=np.int32)).astype(jnp.int8)
        pref = jnp.int32
    else:
        a = jnp.asarray(rng.standard_normal((n, k)),
                        dtype=jnp.float32).astype(jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)),
                        dtype=jnp.float32).astype(jnp.bfloat16)
        pref = jnp.float32

    def mk(K):
        @jax.jit
        def f(a, b):
            def body(c, _):
                if square_chain:
                    d = jax.lax.dot_general(
                        c, c, (((1,), (0,)), ((), ())),
                        preferred_element_type=pref)
                    return (d & 127).astype(jnp.int8), None
                d = jax.lax.dot_general(c, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=pref)
                # full-row reduction -> (n, 1) broadcast back over (n, k)
                if kind == "int8":
                    s = (d.sum(axis=1, dtype=jnp.int32) & 1).astype(
                        jnp.int8)
                    return c ^ s[:, None], None
                s = (d.sum(axis=1) * 0).astype(jnp.bfloat16)
                return c + s[:, None], None
            c, _ = jax.lax.scan(body, a, None, length=K * steps)
            return c.sum().astype(jnp.float32) if kind != "int8" \
                else c.sum(dtype=jnp.int32)
        return f
    t = timed_chain(mk, (a if not square_chain else a[:, :n],
                         b), reps=3, K=2) / steps
    return 2 * n * n * k / t / 1e12


for (n, k, kd, sq, name) in [
        (4096, 4096, "int8", True, "int8 c@c&cast chain (r3 health probe shape)"),
        (4096, 4096, "int8", False, "int8 4096x4096x4096 a@b"),
        (8192, 8192, "int8", False, "int8 8192^3 a@b"),
        (1024, 16384, "int8", False, "int8 1024x1024xK16384 (counts tile)"),
        (1024, 262144, "int8", False, "int8 1024x1024xK262144 (256-level)"),
        (8192, 8192, "bf16", False, "bf16 8192^3 a@b")]:
    try:
        p(f"{name}: {mxu_probe(n, k, kd, square_chain=sq):.1f} TOPS")
    except Exception as e:
        p(f"{name}: failed {e}")

p("== blocked row-gather bandwidth (pair-list floor) ==")
try:
    big = jnp.asarray(rng.integers(0, 1 << 31, size=(10240, 512),
                                   dtype=np.int64).astype(np.uint32))
    P = 1 << 20
    ia_np = rng.integers(0, 10240, size=P).astype(np.int32)
    for block in (8192, 32768, 131072):
        ia = jnp.asarray(ia_np)

        def mk(K):
            @jax.jit
            def f(x, idx):
                nb = idx.shape[0] // block

                def body(c, ib):
                    g = jnp.take(x, ib, axis=0)
                    return c + g.sum(dtype=jnp.uint32), None
                def outer(c, _):
                    c2, _ = jax.lax.scan(body, c,
                                         idx.reshape(nb, block))
                    return c2, None
                c, _ = jax.lax.scan(outer, jnp.uint32(0), None, length=K)
                return c.astype(jnp.int32)
            return f
        t = timed_chain(mk, (big, ia), reps=3, K=2)
        p(f"blocked gather 1M x 2KB (block {block}): {t*1e3:.2f} ms = "
          f"{P*2048/t/1e9:.0f} GB/s effective")
except Exception as e:
    p(f"gather probe failed: {e}")

p("done")
