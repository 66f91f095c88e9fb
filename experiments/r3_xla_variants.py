"""Round-3 experiment 2: XLA circulant engine variants for the default
(full-register) path after rank reduction.

Context (r3_word_kernels results): Pallas row-loop VPU kernels lose to
XLA codegen (i32 eq+gt 194 ms vs XLA u32 97 ms); Mosaic cannot row-load
packed i16/i8. The default estimator needs ONLY eq counts (alpha+beta
enters every measure as a sum; exact for pow2 m), so eq-only engines
are the production candidates. Question set, N=10240 m=1024:
  1. eq-only circulant: u64 limbs (current) vs u32 ranks vs u16 ranks
     -> does narrow-word compare run faster in XLA? (i16 packing)
  2. gt+eq circulant u16 ranks (the fastcmp-2 / non-pow2-m engine)
  3. fused dense_ranks + eq-only (the real default-path pipeline)
  4. tile-size sensitivity t=64/128/256 on the best variant
"""
import sys
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu.ops.cmp_kernels import (_circ_seg_index, _circ_self_eq,
                                          _circ_self_counts, dense_ranks)


def _timed_chain(make_fn, args, reps=3, K=4):
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

    def report(name, t):
        print(f"{name}: {t*1e3:.2f} ms = {up/t/1e9:.2f} G unique-pairs/s",
              flush=True)

    ranks = rng.integers(0, n, size=(n, m))
    data = {
        "u64": jnp.asarray(rng.integers(0, 1 << 62, size=(n, m)
                                        ).astype(np.uint64)),
        "u32": jnp.asarray(ranks.astype(np.uint32)),
        "u16": jnp.asarray(ranks.astype(np.uint16)),
    }

    def mk_eq(K, x, t):
        seg = jnp.asarray(_circ_seg_index(n, t))

        @jax.jit
        def run(a):
            def body(c, _):
                eq = _circ_self_eq(c, seg, t=t)
                return c ^ eq[0, 1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run

    def mk_gt(K, x, t):
        seg = jnp.asarray(_circ_seg_index(n, t))

        @jax.jit
        def run(a):
            def body(c, _):
                gt = _circ_self_counts(c, seg, t=t)
                return c ^ gt[0, 1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run

    for name in ("u64", "u32", "u16"):
        t = _timed_chain(lambda K, d=data[name]: mk_eq(K, d, 128), (data[name],))
        report(f"eq-only circulant {name} t=128", t)

    t = _timed_chain(lambda K: mk_gt(K, data["u16"], 128), (data["u16"],))
    report("gt+eq circulant u16 t=128", t)
    t = _timed_chain(lambda K: mk_gt(K, data["u32"], 128), (data["u32"],))
    report("gt+eq circulant u32 t=128", t)

    # fused: ranks + eq-only (default-path pipeline candidate)
    def mk_fused(K):
        seg = jnp.asarray(_circ_seg_index(n, 128))

        @jax.jit
        def run(a):
            def body(c, _):
                r = dense_ranks(c).astype(jnp.uint32)
                eq = _circ_self_eq(r, seg, t=128)
                return c ^ eq[0, 1].astype(jnp.uint64), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    t = _timed_chain(mk_fused, (data["u64"],))
    report("fused dense_ranks+eq-only u32 t=128", t)

    # tile sensitivity on u32 eq-only
    for tt in (64, 256):
        t = _timed_chain(lambda K, tt=tt: mk_eq(K, data["u32"], tt),
                         (data["u32"],))
        report(f"eq-only circulant u32 t={tt}", t)


if __name__ == "__main__":
    main()
