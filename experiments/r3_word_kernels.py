"""Round-3 experiment: single-word triangular VPU engines for the
DEFAULT (full-register) and fastcmp 1/2 comparison paths.

Times, at N=10240 m=1024 on the real chip (chained-scan differential
timing per CLAUDE.md):
  1. dense_ranks on u64 registers (the once-per-matrix rank reduction)
  2. tri word i32 eq+gt tile delivery      (default full/ab paths)
  3. tri word i32 eq-only tile delivery    (eqfull/bbit paths)
  4. tri word i16 eq+gt                    (ranks < 32768: N <= 32767)
  5. tri word i8  eq+gt                    (fastcmp 1 u8 values ^ 0x80)
  6. XLA circulant on u32 ranks (existing single-limb engine)
  7. tri word i32 eq+gt at bm=512
Reference points (round 1/2): u64 circulant ~164 ms at this shape
(0.32 G pairs/s); nibble MXU comb 15 ms; target >= 1.5 G (35 ms).
"""
import sys
import time

import numpy as np

import dashing2_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from dashing2_tpu.ops.cmp_kernels import (_circ_seg_index,
                                          _circ_self_counts, dense_ranks)
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tri_word_engine import _tri_word_call


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
    T = -(-n // 1024)
    T += T % 2

    def report(name, t):
        print(f"{name}: {t*1e3:.2f} ms = {up/t/1e9:.2f} G unique-pairs/s",
              flush=True)

    # --- 1. rank reduction cost --------------------------------------
    u64 = jnp.asarray(rng.integers(0, 1 << 62, size=(n, m)).astype(np.uint64))

    def mk_ranks(K):
        @jax.jit
        def run(x):
            def body(c, _):
                r = dense_ranks(c)
                return c ^ (r[0, 0] & 1).astype(jnp.uint64), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    t = _timed_chain(mk_ranks, (u64,))
    print(f"dense_ranks u64 (N={n}, m={m}): {t*1e3:.2f} ms", flush=True)

    # --- word tri kernels --------------------------------------------
    ranks32 = jnp.asarray(rng.integers(0, n, size=(n, m)).astype(np.int32))
    ranks16 = jnp.asarray(np.asarray(ranks32).astype(np.int16))
    vals8 = jnp.asarray(
        (rng.integers(0, 256, size=(n, m)).astype(np.uint8) ^ 0x80
         ).view(np.int8))

    def mk_tri(K, data, want_gtlt, bm=1024):
        TT = -(-n // bm)
        TT += TT % 2

        @jax.jit
        def run(x):
            def body(c, _):
                with jax.enable_x64(False):
                    out = _tri_word_call(c, bm=bm, T=TT,
                                         want_gtlt=want_gtlt,
                                         interpret=False)
                s = sum(o.sum() for o in out) + out[0][0, 0, 1]
                return c ^ (s & 1).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run

    for name, data, wg, bm in [
        ("tri word i32 eq+gt bm=1024", ranks32, True, 1024),
        ("tri word i32 eq-only bm=1024", ranks32, False, 1024),
        ("tri word i16 eq+gt bm=1024", ranks16, True, 1024),
        ("tri word i8  eq+gt bm=1024", vals8, True, 1024),
        ("tri word i32 eq+gt bm=512", ranks32, True, 512),
    ]:
        try:
            t = _timed_chain(lambda K, d=data, w=wg, b=bm: mk_tri(K, d, w, b),
                             (data,))
            report(name, t)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # --- 6. XLA circulant on u32 ranks -------------------------------
    ru32 = jnp.asarray(np.asarray(ranks32).astype(np.uint32))
    seg = jnp.asarray(_circ_seg_index(n, 128))

    def mk_circ(K):
        @jax.jit
        def run(x):
            def body(c, _):
                gt = _circ_self_counts(c, seg, t=128)
                return c ^ gt[0, 1].astype(jnp.uint32), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    try:
        t = _timed_chain(mk_circ, (ru32,))
        report("XLA circulant u32 ranks t=128", t)
    except Exception as e:
        print(f"XLA circulant u32: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
