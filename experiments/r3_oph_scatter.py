"""Round-3 experiment: OPH update-engine alternatives at production
shape (R=256 rows x C=32768 kmers -> m=1024 buckets per row).

The dense bucket-one-hot engine costs 33 ms/batch (0.25 Gbase/s,
93% of the fused sketch step). Candidates:
  1. jax.ops.segment_min on flat (row*m + bucket) segments, u64 ids
     (XLA TPU scatter = scalar-unit serial loop; if ~1 update/cycle
     this is ~9 ms = 0.94 Gbase/s)
  2. same with 2x u32 passes (hi then tie-broken lo) - avoids u64
     emulation inside the scatter
  3. .at[seg].min(ids) scatter form
  4. dense engine reference timing (current production)
"""
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu import hashing as H
from dashing2_tpu.ops import sketch_kernels as SK


def _timed_chain(make_fn, args, reps=3, K=3):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def main():
    import os
    R = int(os.environ.get("D2_R", 256))
    C = int(os.environ.get("D2_C", 32768))
    m = int(os.environ.get("D2_MBUCK", 1024))
    bases = R * C
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1 << 63, size=(R, C)
                                   ).astype(np.uint64))
    valid = jnp.asarray(rng.random((R, C)) < 0.97)

    def report(name, t):
        print(f"{name}: {t*1e3:.2f} ms/batch = {bases/t/1e9:.3f} Gbase/s",
              flush=True)

    U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)

    def mk_seg(K):
        @jax.jit
        def run(ids, valid):
            def body(c, _):
                idx = (c % jnp.uint64(m)).astype(jnp.int32)
                row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
                seg = jnp.where(valid, row * m + idx, R * m)
                regs = jax.ops.segment_min(
                    c.reshape(-1), seg.reshape(-1),
                    num_segments=R * m + 1)[:R * m].reshape(R, m)
                return c ^ (regs[0, 0] & jnp.uint64(1)), None
            c, _ = jax.lax.scan(body, ids, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    try:
        t = _timed_chain(mk_seg, (ids, valid))
        report("segment_min u64 flat", t)
    except Exception as e:
        print(f"segment_min u64: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[:2]}", flush=True)

    def mk_seg2(K):
        """2x u32 segment_min passes: hi first, then lo tie-broken by a
        per-element gather of the hi winners (avoids u64 emulation
        INSIDE the scatter at the cost of one element gather)."""
        U32MAX = jnp.uint32(0xFFFFFFFF)

        @jax.jit
        def run(ids, valid):
            def body(c, _):
                idx = (c % jnp.uint64(m)).astype(jnp.int32)
                row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
                seg = jnp.where(valid, row * m + idx, R * m).reshape(-1)
                hi = (c >> jnp.uint64(32)).astype(jnp.uint32).reshape(-1)
                lo = c.astype(jnp.uint32).reshape(-1)
                min_hi = jax.ops.segment_min(
                    jnp.where(valid.reshape(-1), hi, U32MAX), seg,
                    num_segments=R * m + 1)
                cand = hi == jnp.take(min_hi, seg)
                min_lo = jax.ops.segment_min(
                    jnp.where(valid.reshape(-1) & cand, lo, U32MAX), seg,
                    num_segments=R * m + 1)
                regs = ((min_hi[:R * m].astype(jnp.uint64)
                         << jnp.uint64(32))
                        | min_lo[:R * m].astype(jnp.uint64)
                        ).reshape(R, m)
                return c ^ (regs[0, 0] & jnp.uint64(1)), None
            c, _ = jax.lax.scan(body, ids, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    # parity: the 2-pass formulation must reproduce the per-(row,
    # bucket) u64 min on a small slice (numpy oracle over raw ids)
    U32M = jnp.uint32(0xFFFFFFFF)

    @jax.jit
    def seg2_regs(c, valid):
        idx = (c % jnp.uint64(m)).astype(jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
        seg = jnp.where(valid, row * m + idx, R * m).reshape(-1)
        hi = (c >> jnp.uint64(32)).astype(jnp.uint32).reshape(-1)
        lo = c.astype(jnp.uint32).reshape(-1)
        vf = valid.reshape(-1)
        min_hi = jax.ops.segment_min(jnp.where(vf, hi, U32M), seg,
                                     num_segments=R * m + 1)
        cand = hi == jnp.take(min_hi, seg)
        min_lo = jax.ops.segment_min(jnp.where(vf & cand, lo, U32M), seg,
                                     num_segments=R * m + 1)
        return ((min_hi[:R * m].astype(jnp.uint64) << jnp.uint64(32))
                | min_lo[:R * m].astype(jnp.uint64)).reshape(R, m)

    sl = min(R, 4)
    got = np.asarray(seg2_regs(ids[:sl], valid[:sl]))[:sl]
    idn, vn = np.asarray(ids[:sl]), np.asarray(valid[:sl])
    ref = np.full((sl, m), 0xFFFFFFFFFFFFFFFF, np.uint64)
    for r in range(sl):
        for j in range(idn.shape[1]):
            if vn[r, j]:
                b = int(idn[r, j] % m)
                ref[r, b] = min(ref[r, b], idn[r, j])
    assert np.array_equal(got, ref), "2-pass u32 parity FAILED"
    print("2-pass u32 parity vs numpy: OK", flush=True)

    try:
        t = _timed_chain(mk_seg2, (ids, valid))
        report("segment_min 2x u32 passes", t)
    except Exception as e:
        print(f"segment_min 2xu32: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[:2]}", flush=True)

    def mk_at(K):
        @jax.jit
        def run(ids, valid):
            def body(c, _):
                idx = (c % jnp.uint64(m)).astype(jnp.int32)
                row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
                seg = jnp.where(valid, row * m + idx, R * m)
                regs = jnp.full(R * m + 1, U64MAX).at[
                    seg.reshape(-1)].min(c.reshape(-1))
                return c ^ (regs[0] & jnp.uint64(1)), None
            c, _ = jax.lax.scan(body, ids, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    try:
        t = _timed_chain(mk_at, (ids, valid))
        report(".at[].min scatter u64", t)
    except Exception as e:
        print(f".at[].min: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[:2]}", flush=True)

    for wc in (False, True):
        def mk_sort(K, wc=wc):
            @jax.jit
            def run(ids, valid):
                def body(c, _):
                    r, _cnt = SK.oph_sketch_rows_sort(
                        c, valid, m=m, seed=H.OPH_DEFAULT_SEED,
                        want_counts=wc)
                    return c ^ (r[:, :1] & jnp.uint64(1)), None
                c, _ = jax.lax.scan(body, ids, None, length=K)
                return c[0, 0].astype(jnp.int32)
            return run
        try:
            t = _timed_chain(mk_sort, (ids, valid))
            report(f"rotation-sort rows want_counts={wc}", t)
        except Exception as e:
            print(f"sort wc={wc}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[:2]}", flush=True)

    def mk_dense(K):
        @jax.jit
        def run(ids, valid):
            def body(c, _):
                r, _cnt = SK.oph_sketch_rows(c, valid, m=m,
                                             seed=H.OPH_DEFAULT_SEED,
                                             want_counts=False)
                return c ^ (r[:, :1] & jnp.uint64(1)), None
            c, _ = jax.lax.scan(body, ids, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    t = _timed_chain(mk_dense, (ids, valid))
    report("dense one-hot rows (current)", t)

    def mk_dense2(K):
        @jax.jit
        def run(ids, valid):
            def body(c, _):
                r, _cnt = SK.oph_sketch_rows_dense2(
                    c, valid, m=m, seed=H.OPH_DEFAULT_SEED,
                    want_counts=False)
                return c ^ (r[:, :1] & jnp.uint64(1)), None
            c, _ = jax.lax.scan(body, ids, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    t = _timed_chain(mk_dense2, (ids, valid))
    report("dense split-u32 2-pass rows", t)


if __name__ == "__main__":
    main()
