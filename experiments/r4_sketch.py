"""Round-4 sketch-phase engine variants (one v5e).

The dense OPH engine is the sketch phase's 93% (r3_sketch): an
O(nk*m) one-hot select/min. Round-3 alternatives (scatter 803 ms,
rotation-sort 28.9 ms == dense 28.8 ms) didn't move it. This probes
op-count reductions of the dense formulation itself:

  dense      (u64 min, idx compare)            ~8-9 ops/position
  dense2     (split u32 passes, idx compare)   ~7-8
  dense-rot  (NEW: rotate the bucket into the TOP bits of the id —
              rot = rotr(id, lg m) — so pass 1 compares the bucket
              directly on the rotated hi word ((hi >> s) == col,
              shift amortized over columns) and pass 2's bucket test
              is IMPLIED by hi-word equality: 3 ops per pass)
  dense-rot + bigger chunks, and the encode+hash fused variants.

Floor math: nk*m positions * ops / VPU lane rate (measured 4.3 T
lane-ops/s in r4_probes2) -> 3-op pass pairs bound the dense family at
~12 ms/batch = 0.7 Gbase/s for (256, 32768) batches at m=1024.
"""

import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu import hashing as H
from dashing2_tpu.ops import hashes as DH

R, NK, M = 256, 32768, 1024
U32MAX = jnp.uint32(0xFFFFFFFF)
U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)
rng = np.random.default_rng(0)


def timed(mk, args, reps=3, K=2):
    f1, fk = mk(1), mk(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return min(max((t - min(t1s)) / K, 1e-9) for t in tks)


def p(msg):
    print(msg, flush=True)


hashed0 = jnp.asarray(rng.integers(0, 1 << 63, size=(R, NK)).astype(np.uint64))
valid0 = jnp.asarray(rng.random((R, NK)) < 0.97)


def bench(name, regfn, gbase=R * NK):
    def mk(K):
        @jax.jit
        def f(h, v):
            def body(c, _):
                regs = regfn(c, v)
                return c ^ (regs[0, 0] & jnp.uint64(3)), None
            c, _ = jax.lax.scan(body, h, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    try:
        t = timed(mk, (hashed0, valid0))
        p(f"{name}: {t*1e3:.2f} ms = {gbase/t/1e9:.3f} Gbase/s")
        return t
    except Exception as e:
        p(f"{name}: failed {e}")


def dense_current(h, v):
    from dashing2_tpu.ops.sketch_kernels import oph_sketch_rows_dense
    r, _ = oph_sketch_rows_dense(h, v, m=M, want_counts=False)
    return r


def dense2_current(h, v):
    from dashing2_tpu.ops.sketch_kernels import oph_sketch_rows_dense2
    r, _ = oph_sketch_rows_dense2(h, v, m=M, want_counts=False)
    return r


def dense_rot(h, v, chunk=4096, m=M):
    """Rotation dense engine: bucket in the TOP lg(m) bits."""
    ids = DH.oph_hash(h, H.OPH_DEFAULT_SEED)
    lgm = m.bit_length() - 1
    rot = (ids >> jnp.uint64(lgm)) | (ids << jnp.uint64(64 - lgm))
    rot = jnp.where(v, rot, U64MAX)
    hi = (rot >> jnp.uint64(32)).astype(jnp.uint32)
    lo = rot.astype(jnp.uint32)
    nc = NK // chunk
    hi_t = jnp.moveaxis(hi.reshape(R, nc, chunk), 1, 0)
    lo_t = jnp.moveaxis(lo.reshape(R, nc, chunk), 1, 0)
    s = jnp.uint32(32 - lgm)
    cols = jnp.arange(m, dtype=jnp.uint32)

    def body_hi(regs, chi):
        on = (chi >> s)[:, :, None] == cols[None, None, :]
        cmin = jnp.min(jnp.where(on, chi[:, :, None], U32MAX), axis=1)
        return jnp.minimum(regs, cmin), None

    min_hi, _ = jax.lax.scan(body_hi, jnp.full((R, m), U32MAX, jnp.uint32),
                             hi_t)

    def body_lo(regs, xs):
        chi, clo = xs
        on = chi[:, :, None] == min_hi[:, None, :]
        cmin = jnp.min(jnp.where(on, clo[:, :, None], U32MAX), axis=1)
        return jnp.minimum(regs, cmin), None

    min_lo, _ = jax.lax.scan(body_lo, jnp.full((R, m), U32MAX, jnp.uint32),
                             (hi_t, lo_t))
    rr = (min_hi.astype(jnp.uint64) << jnp.uint64(32)) \
        | min_lo.astype(jnp.uint64)
    out = (rr << jnp.uint64(lgm)) | (rr >> jnp.uint64(64 - lgm))
    # empty-bucket guard: a nonempty bucket's min_hi carries its own
    # bucket id in the top bits; an empty one holds U32MAX (which
    # decodes to bucket m-1, where pass 2 resolves correctly anyway)
    ok = (min_hi >> s) == cols[None, :]
    return jnp.where(ok, out, U64MAX)


t0 = bench("dense u64 (current default)", dense_current)
bench("dense2 split-u32 (current alt)", dense2_current)
for ch in (2048, 4096, 8192):
    bench(f"dense-rot chunk={ch}", lambda h, v, c=ch: dense_rot(h, v, c))

# correctness: dense-rot == dense on a small shape
from dashing2_tpu.ops.sketch_kernels import oph_sketch_rows_dense  # noqa
hs = hashed0[:8, :4096]
vs = valid0[:8, :4096]
want, _ = oph_sketch_rows_dense(hs, vs, m=M, want_counts=False)


def dense_rot_small(h, v, m=M):
    ids = DH.oph_hash(h, H.OPH_DEFAULT_SEED)
    lgm = m.bit_length() - 1
    rot = (ids >> jnp.uint64(lgm)) | (ids << jnp.uint64(64 - lgm))
    rot = jnp.where(v, rot, U64MAX)
    hi = (rot >> jnp.uint64(32)).astype(jnp.uint32)
    lo = rot.astype(jnp.uint32)
    s = jnp.uint32(32 - lgm)
    cols = jnp.arange(m, dtype=jnp.uint32)
    on1 = (hi >> s)[:, :, None] == cols[None, None, :]
    min_hi = jnp.min(jnp.where(on1, hi[:, :, None], U32MAX), axis=1)
    on2 = hi[:, :, None] == min_hi[:, None, :]
    min_lo = jnp.min(jnp.where(on2, lo[:, :, None], U32MAX), axis=1)
    rr = (min_hi.astype(jnp.uint64) << jnp.uint64(32)) \
        | min_lo.astype(jnp.uint64)
    out = (rr << jnp.uint64(lgm)) | (rr >> jnp.uint64(64 - lgm))
    ok = (min_hi >> s) == cols[None, :]
    return jnp.where(ok, out, U64MAX)


got = dense_rot_small(hs, vs)
p(f"dense-rot == dense: {bool(jnp.array_equal(got, want))}")
p("done")
