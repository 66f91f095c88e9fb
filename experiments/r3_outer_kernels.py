"""Round-3 experiment 3: outer-product-accumulate Pallas kernels.

The XLA circulant engines sit at ~14% of VPU lane peak regardless of
mask-op count (97-125 ms at N=10240 m=1024 for anything single-word) —
the broadcast-compare materialization + cross-lane reduction dominates.
This formulation keeps a (bm, bm) accumulator in vector registers
across a fori over registers r:  acc[i, j] += (a[i, r] OP b[r, j]),
with the B operand pre-transposed so its r-row is lane-contiguous.
No cross-lane reduction ever happens.

Variants:
  1. outer eq-only i32, bm=128 / 256
  2. outer eq+gt i32, bm=128
  3. lax.population_count microbench (SWAR viability on this toolchain)
  4. SWAR u8-packed eq (4 regs/word, exact zero-byte detect + popcount)
     as an XLA circulant drop-in
"""
import functools
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed_chain(make_fn, args, reps=3, K=4):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def _outer_kernel_eqgt(a_ref, bt_ref, eq_ref, gt_ref):
    bm = a_ref.shape[0]
    m = a_ref.shape[1]

    def body(r, acc):
        eqa, gta = acc
        ac = a_ref[:, pl.ds(r, 1)]
        br = bt_ref[pl.ds(r, 1), :]
        eqa = eqa + (ac == br).astype(jnp.int32)
        gta = gta + (ac > br).astype(jnp.int32)
        return (eqa, gta)

    z = jnp.zeros((bm, bm), jnp.int32)
    eqa, gta = jax.lax.fori_loop(0, m, body, (z, z))
    eq_ref[0] = eqa
    gt_ref[0] = gta


def _outer_kernel_eq(a_ref, bt_ref, eq_ref):
    bm = a_ref.shape[0]
    m = a_ref.shape[1]

    def body(r, eqa):
        ac = a_ref[:, pl.ds(r, 1)]
        br = bt_ref[pl.ds(r, 1), :]
        return eqa + (ac == br).astype(jnp.int32)

    eq_ref[0] = jax.lax.fori_loop(
        0, m, body, jnp.zeros((bm, bm), jnp.int32))


@functools.partial(jax.jit, static_argnames=("bm", "T", "want_gtlt"))
def _outer_call(a, at, *, bm, T, want_gtlt):
    npad, m = a.shape
    H = T // 2
    P = H * (T + 1)

    def row(u, v):
        return jax.lax.select(v <= u, u, T - 1 - u)

    def col(u, v):
        return jax.lax.select(v <= u, v, v - u - 1)

    nout = 2 if want_gtlt else 1
    return pl.pallas_call(
        _outer_kernel_eqgt if want_gtlt else _outer_kernel_eq,
        grid=(H, T + 1),
        in_specs=[
            pl.BlockSpec((bm, m), lambda u, v: (row(u, v), 0)),
            pl.BlockSpec((m, bm), lambda u, v: (0, col(u, v))),
        ],
        out_specs=[pl.BlockSpec((1, bm, bm),
                                lambda u, v: (u * (T + 1) + v, 0, 0))] * nout,
        out_shape=[jax.ShapeDtypeStruct((P, bm, bm), jnp.int32)] * nout,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(a, at)


def main():
    n, m = 10240, 1024
    up = n * (n - 1) / 2
    rng = np.random.default_rng(0)

    def report(name, t):
        print(f"{name}: {t*1e3:.2f} ms = {up/t/1e9:.2f} G unique-pairs/s",
              flush=True)

    ranks = jnp.asarray(rng.integers(0, n, size=(n, m)).astype(np.int32))

    def mk_outer(K, want_gtlt, bm):
        T = -(-n // bm)
        T += T % 2

        @jax.jit
        def run(x):
            def body(c, _):
                xp = jnp.concatenate(
                    [c, jnp.zeros((T * bm - n, m), c.dtype)])
                with jax.enable_x64(False):
                    out = _outer_call(xp, xp.T, bm=bm, T=T,
                                      want_gtlt=want_gtlt)
                s = sum(o.sum() for o in out) + out[0][0, 0, 1]
                return c ^ (s & 1).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0]
        return run

    for name, wg, bm in [
        ("outer eq-only i32 bm=128", False, 128),
        ("outer eq-only i32 bm=256", False, 256),
        ("outer eq+gt  i32 bm=128", True, 128),
        ("outer eq+gt  i32 bm=256", True, 256),
    ]:
        try:
            t = _timed_chain(lambda K, w=wg, b=bm: mk_outer(K, w, b),
                             (ranks,))
            report(name, t)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[:3]}", flush=True)

    # --- XLA circulant tile sweep (t=256 was 2x faster than t=128) ----
    from dashing2_tpu.ops.cmp_kernels import (_circ_seg_index, _circ_self_eq,
                                              _circ_self_counts)
    ranks_u32 = jnp.asarray(np.asarray(ranks).astype(np.uint32))

    def mk_eq_xla(K, t):
        seg = jnp.asarray(_circ_seg_index(n, t))

        @jax.jit
        def run(a):
            def body(c, _):
                eq = _circ_self_eq(c, seg, t=t)
                return c ^ eq[0, 1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run

    def mk_gt_xla(K, t):
        seg = jnp.asarray(_circ_seg_index(n, t))

        @jax.jit
        def run(a):
            def body(c, _):
                gt = _circ_self_counts(c, seg, t=t)
                return c ^ gt[0, 1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run

    for t_ in (512, 1024):
        t = _timed_chain(lambda K, tt=t_: mk_eq_xla(K, tt), (ranks_u32,))
        report(f"eq-only circulant u32 t={t_}", t)
    for t_ in (256, 512):
        t = _timed_chain(lambda K, tt=t_: mk_gt_xla(K, tt), (ranks_u32,))
        report(f"gt+eq circulant u32 t={t_}", t)

    # --- popcount + SWAR u8 eq as XLA drop-in -------------------------
    packed = jnp.asarray(
        rng.integers(0, 1 << 32, size=(n, m // 4), dtype=np.uint64
                     ).astype(np.uint32))

    def mk_swar(K):
        from dashing2_tpu.ops.cmp_kernels import _circ_seg_index
        t_ = 128
        seg = jnp.asarray(_circ_seg_index(n, t_))

        @jax.jit
        def run(a):
            def body(c, _):
                nt = n // t_
                nd = nt // 2 + 1
                p3 = c.reshape(nt, t_, -1)
                p6 = jnp.concatenate([p3, p3])

                def band(_, d):
                    rolled = jax.lax.dynamic_slice(
                        p6, (d, jnp.int32(0), jnp.int32(0)),
                        (nt, t_, p3.shape[-1]))
                    x = p3[:, :, None, :] ^ rolled[:, None, :, :]
                    t7 = ((x & jnp.uint32(0x7F7F7F7F))
                          + jnp.uint32(0x7F7F7F7F)) | x
                    nz = jax.lax.population_count(
                        t7 & jnp.uint32(0x80808080))
                    eq = (jnp.uint32(4) * p3.shape[-1]
                          - nz.sum(-1, dtype=jnp.uint32))
                    return None, eq.astype(jnp.int32)

                _, eqs = jax.lax.scan(band, None,
                                      jnp.arange(nd, dtype=jnp.int32))
                return c ^ eqs[0, 0, 0, 1].astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    try:
        t = _timed_chain(mk_swar, (packed,))
        report("SWAR u8-packed eq XLA circulant (half-square bands)", t)
    except Exception as e:
        print(f"SWAR u8: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[:3]}", flush=True)


if __name__ == "__main__":
    main()
