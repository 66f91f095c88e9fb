"""Round-4 roofline probes + ab-u8 engine variants (one v5e).

Sections (each guarded, prints incrementally):
  1. HBM bandwidth: streaming copy + row-gather (the pair-list floor).
  2. VPU lane-op peak (u32 elementwise chain).
  3. MXU TOPS under several shapes — resolves the round-3 contradiction
     where the chained 4096^3 int8 probe reads ~37 TOPS while the
     production counts kernel sustains 35% MFU of 394 TOPS.
  4. ab-u8 (fastcmp 1 a/b) SWAR count-engine variants at N=10240:
     current gtlt16 two-tile vs gt+eq (lt by trichotomy) vs
     shift-accumulate (no popcount) vs byte-packed single sweep.
  5. eq15 shift-accumulate variant (the DEFAULT mode's count engine).
  6. The 256-level one-hot MXU decomposition for exact u8 gt/lt
     (VERDICT round-3 task 2), measured at N=2048 and extrapolated:
     exact [a>b] over 256 levels is a rank-255 bilinear form, so the
     one-hot contraction K is 256*m — 16x the nibble engines' MACs.

Run on the chip:  python experiments/r4_probes.py
"""

import time

import numpy as np

import dashing2_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

N, M = 10240, 1024
UP = N * (N - 1) / 2
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


# ----------------------------------------------------------------------
p("== 1. HBM bandwidth probes ==")
try:
    big = jnp.asarray(rng.integers(0, 1 << 31, size=(10240, 512),
                                   dtype=np.int64).astype(np.uint32))

    def mk_copy(K):
        @jax.jit
        def f(x):
            def body(c, _):
                return c + jnp.uint32(1), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    t = timed_chain(mk_copy, (big,))
    bw = 2 * big.size * 4 / t
    p(f"stream add (r+w {2*big.size*4/1e6:.0f} MB): {t*1e3:.3f} ms = "
      f"{bw/1e9:.0f} GB/s")

    big2 = jnp.asarray(rng.integers(0, 1 << 31, size=(65536, 2048),
                                    dtype=np.int64).astype(np.uint32))
    t = timed_chain(mk_copy, (big2,), reps=3, K=2)
    p(f"stream add (r+w {2*big2.size*4/1e6:.0f} MB): {t*1e3:.3f} ms = "
      f"{2*big2.size*4/t/1e9:.0f} GB/s")

    P = 1 << 20
    ia = jnp.asarray(rng.integers(0, 10240, size=P).astype(np.int32))

    def mk_gather(K):
        @jax.jit
        def f(x, idx):
            def body(c, _):
                g = jnp.take(x, c, axis=0)          # (P, 512) gather
                s = g.sum(dtype=jnp.uint32)
                return c ^ (s & 1).astype(c.dtype), None
            c, _ = jax.lax.scan(body, idx, None, length=K)
            return c[0].astype(jnp.int32)
        return f
    t = timed_chain(mk_gather, (big, ia), reps=3, K=2)
    p(f"row gather 1M x 2KB from 20MB: {t*1e3:.2f} ms = "
      f"{P*2048/t/1e9:.0f} GB/s effective")

    ias = jnp.sort(ia)

    def mk_gather_sorted(K):
        return mk_gather(K)
    t = timed_chain(mk_gather_sorted, (big, ias), reps=3, K=2)
    p(f"row gather 1M x 2KB SORTED indices: {t*1e3:.2f} ms = "
      f"{P*2048/t/1e9:.0f} GB/s effective")
except Exception as e:
    p(f"bw probes failed: {e}")

# ----------------------------------------------------------------------
p("== 2. VPU lane-op peak ==")
try:
    x0 = jnp.asarray(rng.integers(0, 1 << 31, size=(4096, 4096),
                                  dtype=np.int64).astype(np.uint32))

    def mk_vpu(K):
        @jax.jit
        def f(x):
            def body(c, _):
                for _ in range(4):
                    c = (c + jnp.uint32(2654435761)) ^ (c >> jnp.uint32(7))
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    t = timed_chain(mk_vpu, (x0,), K=8)
    rate = x0.size * 8 / t
    p(f"u32 add/xor/shift chain (8 ops/elem/iter): {t*1e3:.3f} ms = "
      f"{rate/1e12:.2f} T lane-ops/s")

    def mk_pc(K):
        @jax.jit
        def f(x):
            def body(c, _):
                c = c ^ jax.lax.population_count(c + jnp.uint32(1))
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    t = timed_chain(mk_pc, (x0,), K=8)
    p(f"popcount+add+xor chain: {t*1e3:.3f} ms = "
      f"{x0.size*3/t/1e12:.2f} T lane-ops/s (as 3 ops/elem/iter)")
except Exception as e:
    p(f"vpu probe failed: {e}")

# ----------------------------------------------------------------------
p("== 3. MXU TOPS shapes ==")


def mxu_probe(n, k, kind, steps=4):
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
                d = jax.lax.dot_general(c, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=pref)
                # cheap data dependence back into the (n, k) operand
                if kind == "int8":
                    c2 = c ^ (d[0, 0] & 1).astype(jnp.int8)
                else:
                    c2 = c + (d[0, 0] * 0).astype(jnp.bfloat16)
                return c2, None
            c, _ = jax.lax.scan(body, a, None, length=K * steps)
            return c[0, 0].astype(jnp.float32)
        return f
    t = timed_chain(mk, (a, b), reps=3, K=2) / steps
    return 2 * n * n * k / t / 1e12


for (n, k, kd, name) in [
        (4096, 4096, "int8", "int8 4096x4096x4096"),
        (8192, 8192, "int8", "int8 8192^3"),
        (1024, 16384, "int8", "int8 1024x1024xK16384 (counts tile shape)"),
        (1024, 262144, "int8", "int8 1024x1024xK262144 (256-level shape)"),
        (8192, 8192, "bf16", "bf16 8192^3")]:
    try:
        p(f"{name}: {mxu_probe(n, k, kd):.1f} TOPS")
    except Exception as e:
        p(f"{name}: failed {e}")

# ----------------------------------------------------------------------
p("== 4. ab-u8 SWAR count-engine variants (N=10240, m=1024) ==")
H16 = jnp.uint32(0x80008000)
L15 = jnp.uint32(0x7FFF7FFF)
H8 = jnp.uint32(0x80808080)
L7 = jnp.uint32(0x7F7F7F7F)


def gt16_pc(a, b):
    return jax.lax.population_count(~((b | H16) - a) & H16).sum(
        -1, dtype=jnp.int32)


def ngt16_shift(a, b):
    # bit15 per half set iff a <= b; halves accumulate in u32, split once
    t = ((b | H16) - a) & H16
    s = (t >> jnp.uint32(15)).sum(-1, dtype=jnp.uint32)
    return ((s & jnp.uint32(0xFFFF)) + (s >> jnp.uint32(16))).astype(jnp.int32)


def eq16_pc(a, b):
    x = a ^ b
    t7 = ((x & L15) + L15) | x
    return jax.lax.population_count(t7 & H16).sum(-1, dtype=jnp.int32)


def eq15_pc(a, b):
    return jax.lax.population_count(((a ^ b) + L15) & H16).sum(
        -1, dtype=jnp.int32)


def neq15_shift(a, b):
    # halves < 2^15 (u8 values / dense ranks): count NONEQUAL halves
    x = a ^ b
    t = ((x + L15) & H16) >> jnp.uint32(15)
    s = t.sum(-1, dtype=jnp.uint32)
    return ((s & jnp.uint32(0xFFFF)) + (s >> jnp.uint32(16))).astype(jnp.int32)


def gt8_pc(x, y):
    # u8 fields 4/word, derived guard (no spare bit):
    # gt = (x7 & ~y7) | (x7==y7 & xl>yl)
    t = ~(((y & L7) | H8) - (x & L7)) & H8        # xl > yl at bit7
    xor7 = x ^ y
    gthi = x & ~y
    flags = (gthi | (~xor7 & t)) & H8
    return jax.lax.population_count(flags).sum(-1, dtype=jnp.int32)


def neq8_shift(x, y):
    z = x ^ y
    t7 = ((((z & L7) + L7) | z) & H8) >> jnp.uint32(7)
    s = t7.sum(-1, dtype=jnp.uint32)
    s = (s & jnp.uint32(0x00FF00FF)) + ((s >> jnp.uint32(8))
                                        & jnp.uint32(0x00FF00FF))
    return ((s & jnp.uint32(0xFFFF)) + (s >> jnp.uint32(16))).astype(jnp.int32)


def bench_banded(name, vals, packfn, tilefns, t=512):
    try:
        def mk(K):
            @jax.jit
            def f(v):
                def body(c, _):
                    pk = packfn(c)
                    npad = pk.shape[0]
                    nt = npad // t
                    nd = nt // 2 + 1
                    p3 = pk.reshape(nt, t, -1)
                    p6 = jnp.concatenate([p3, p3])

                    def bd(_, d):
                        ro = jax.lax.dynamic_slice(
                            p6, (d, jnp.int32(0), jnp.int32(0)),
                            (nt, t, p3.shape[2]))
                        a = p3[:, :, None, :]
                        b = ro[:, None, :, :]
                        return None, tuple(fn(a, b) for fn in tilefns)
                    _, outs = jax.lax.scan(
                        bd, None, jnp.arange(nd, dtype=jnp.int32))
                    s = sum(o.sum() for o in outs)
                    return c ^ (s & 255).astype(c.dtype), None
                c, _ = jax.lax.scan(body, v, None, length=K)
                return c[0, 0].astype(jnp.int32)
            return f
        tt = timed_chain(mk, (vals,), reps=3, K=2)
        p(f"{name}: {tt*1e3:.2f} ms = {UP/tt/1e9:.2f} G pairs/s")
        return tt
    except Exception as e:
        p(f"{name}: failed {e}")
        return None


from dashing2_tpu.ops.cmp_kernels import pack16, pack8  # noqa: E402

u8 = jnp.asarray(rng.integers(0, 256, size=(N, M)).astype(np.uint8))

bench_banded("gtlt16 two-tile (current ab-u8)", u8, pack16,
             (lambda a, b: gt16_pc(a, b), lambda a, b: gt16_pc(b, a)))
bench_banded("gt16 + eq16 (lt by trichotomy)", u8, pack16,
             (gt16_pc, eq16_pc))
bench_banded("gt16 + eq15 (u8-bounded detect)", u8, pack16,
             (gt16_pc, eq15_pc))
bench_banded("ngt16 + neq15 shift-accum", u8, pack16,
             (ngt16_shift, neq15_shift))
bench_banded("byte-pack gt8 + neq8 (4/word)", u8, pack8,
             (gt8_pc, neq8_shift))
bench_banded("byte-pack gt8 only (direction cost)", u8, pack8,
             (gt8_pc,))

p("== 5. eq15 variants (DEFAULT mode count engine) ==")
r16 = jnp.asarray(rng.integers(0, N, size=(N, M)).astype(np.uint16))
bench_banded("eq15 popcount (current)", r16, pack16, (eq15_pc,))
bench_banded("neq15 shift-accum", r16, pack16, (neq15_shift,))
bench_banded("gt16-only popcount (reference)", r16, pack16, (gt16_pc,))
bench_banded("ngt16-only shift-accum", r16, pack16, (ngt16_shift,))

# ----------------------------------------------------------------------
p("== 6. 256-level one-hot MXU for exact u8 gt (N=2048 scale probe) ==")
try:
    N2 = 2048
    u8s = jnp.asarray(rng.integers(0, 256, size=(N2, M)).astype(np.uint8))

    @jax.jit
    def enc256(a):
        # (256m, N) int8 combined [b==v] - 128*[b<v], register-major
        lv = jnp.arange(256, dtype=jnp.uint8)
        at = a.T
        eq = (at[:, None, :] == lv[None, :, None]).astype(jnp.int8)
        lt = (at[:, None, :] < lv[None, :, None]).astype(jnp.int8)
        return (eq + lt * jnp.int8(-128)).reshape(256 * M, N2)

    @jax.jit
    def oh256(a):
        lv = jnp.arange(256, dtype=jnp.uint8)
        at = a.T
        return (at[:, None, :] == lv[None, :, None]).astype(
            jnp.int8).reshape(256 * M, N2)

    def mk_mxu256(K):
        @jax.jit
        def f(a):
            def body(c, _):
                oh = oh256(c)
                ct = enc256(c)
                # combined matmul in 64-reg k-chunks (decode bound:
                # eq_chunk <= 64 < 128, same trick as the nibble tri)
                nk = 256 * M // (64 * 256)
                ohc = oh.reshape(nk, 64 * 256, N2)
                ctc = ct.reshape(nk, 64 * 256, N2)

                def kb(acc, xs):
                    o, t = xs
                    partial = jax.lax.dot_general(
                        o, t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    g = (jnp.int32(127) - partial) >> 7
                    return (acc[0] + partial + (g << 7), acc[1] + g), None
                (eq, gt), _ = jax.lax.scan(
                    kb, (jnp.zeros((N2, N2), jnp.int32),
                         jnp.zeros((N2, N2), jnp.int32)), (ohc, ctc))
                s = eq.sum() + gt.sum()
                return c ^ (s & 15).astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return f
    t = timed_chain(mk_mxu256, (u8s,), reps=2, K=1)
    up2 = N2 * N2  # full square here
    macs = N2 * N2 * 256 * M
    p(f"256-level combined MXU (full square, N=2048): {t*1e3:.1f} ms = "
      f"{up2/t/1e9:.2f} G pairs/s, {macs/t/1e12:.0f} TOPS achieved; "
      f"extrapolated N=10240 half-square: {t*1e3 * (UP/up2):.0f} ms")
except Exception as e:
    p(f"mxu256 failed: {e}")

p("done")
