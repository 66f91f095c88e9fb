"""Pallas triangular matmul, round 3.

1. HONEST int8 vs bf16 Mosaic matmul rate (carry feeds back into operand).
2. tri_comb v2: bm=1024 bk=512, combined bf16 encoding, f32 accumulation
   directly in the output block (VMEM-resident across the k grid dim),
   decode outside. Traffic 3.7GB ~= compute 4.8ms -> expect ~5-7ms.
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_chain(make_fn, arg, reps=3, K=4):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(arg)); np.asarray(fk(arg))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(arg)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(arg)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def _mm_kernel(a_ref, b_ref, o_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=o_ref.dtype)


def pallas_mm(a, b, bm=512, bn=512, bk=1024, acc_dtype=jnp.int32):
    M, K = a.shape
    _, N = b.shape
    return pl.pallas_call(
        _mm_kernel,
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )(a, b)


def rate_probe():
    M = N = 4096
    K = 8192
    rng = np.random.default_rng(0)
    for dt, acc, peak, nm in [(jnp.int8, jnp.int32, 394e12, "int8"),
                              (jnp.bfloat16, jnp.float32, 197e12, "bf16")]:
        a0 = jnp.asarray(rng.integers(0, 2, (M, K)).astype(np.int8)).astype(dt)
        b = jnp.asarray(rng.integers(0, 2, (K, N)).astype(np.int8)).astype(dt)

        def make(KK):
            @jax.jit
            def run(x):
                def body(c, _):
                    o = pallas_mm(c, b, acc_dtype=acc)
                    # real feedback: perturb one operand entry from the output
                    d = (o[0, 0].astype(jnp.int32) & 1).astype(c.dtype)
                    c = c.at[0, 0].set((c[0, 0] + d) % 2 if c.dtype == jnp.int8
                                       else d)
                    return c, o.astype(jnp.float32)[0, 0]
                c, ys = jax.lax.scan(body, x, None, length=KK)
                return ys.sum() + c.astype(jnp.float32)[0, 0]
            return run
        t = timed_chain(make, a0)
        tops = 2 * M * N * K / t
        print(f"pallas mm {nm}: {t*1e3:.2f} ms  {tops/1e12:.0f} TOPS "
              f"({tops/peak*100:.0f}% of {nm} peak)", flush=True)


# --------------------------------------------------- tri comb v2
def _tri2_kernel(ii_ref, jj_ref, ce_ref, oh_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])
    o_ref[0] += jax.lax.dot_general(
        ce_ref[:], oh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bm", "bk"))
def tri_comb2(ii, jj, ce, oh, *, bm, bk):
    N, K = ce.shape
    P = ii.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda p, k, ii, jj: (ii[p], k)),
            pl.BlockSpec((bm, bk), lambda p, k, ii, jj: (jj[p], k)),
        ],
        out_specs=pl.BlockSpec((1, bm, bm), lambda p, k, ii, jj: (p, 0, 0)),
    )
    return pl.pallas_call(
        _tri2_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, bm, bm), jnp.float32),
    )(ii, jj, ce, oh)


def enc_comb(a):
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    gt = (a[:, :, None] > lv).astype(jnp.bfloat16) * jnp.bfloat16(2048.0)
    eq = (a[:, :, None] == lv).astype(jnp.bfloat16)
    return (gt + eq).reshape(n, m * 16)


def enc_oh(a):
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    return (a[:, :, None] == lv).astype(jnp.bfloat16).reshape(n, m * 16)


def tri_main():
    n, m = 10240, 1024
    bm, bk = 1024, 512
    T = n // bm
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, (n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    iis, jjs = np.tril_indices(T)
    o = np.lexsort((jjs, iis))  # by i then j: lhs constant within runs
    ii = jnp.asarray(iis[o].astype(np.int32))
    jj = jnp.asarray(jjs[o].astype(np.int32))
    P = len(iis)
    up = n * (n - 1) / 2

    # correctness (small)
    sn, sT = 512, 4
    sa = a_np[:sn]
    sii, sjj = np.tril_indices(sT)
    with jax.enable_x64(False):
        comb = np.asarray(tri_comb2(
            jnp.asarray(sii.astype(np.int32)), jnp.asarray(sjj.astype(np.int32)),
            enc_comb(jnp.asarray(sa)), enc_oh(jnp.asarray(sa)),
            bm=sn // sT, bk=512))
    gt_t = np.floor(comb / 2048).astype(np.int32)
    eq_t = (comb - 2048 * gt_t).astype(np.int32)
    gt_ref = (sa[:, None, :] > sa[None, :, :]).sum(2)
    eq_ref = (sa[:, None, :] == sa[None, :, :]).sum(2)
    B = sn // sT
    for p, (bi, bj) in enumerate(zip(sii, sjj)):
        assert (gt_t[p] == gt_ref[bi*B:(bi+1)*B, bj*B:(bj+1)*B]).all()
        assert (eq_t[p] == eq_ref[bi*B:(bi+1)*B, bj*B:(bj+1)*B]).all()
    print("tri_comb2 correctness OK", flush=True)

    def make(KK):
        @jax.jit
        def run(x):
            def body(c, _):
                ce = enc_comb(c)
                oh = enc_oh(c)
                with jax.enable_x64(False):
                    comb = tri_comb2(ii, jj, ce, oh, bm=bm, bk=bk)
                s = comb.sum()
                return c ^ (s.astype(jnp.int32) & 15).astype(jnp.uint8), None
            c, _ = jax.lax.scan(body, x, None, length=KK)
            return c[0, 0]
        return run

    t = timed_chain(make, a)
    macs = P * bm * bm * 16 * m
    print(f"tri_comb2 bm={bm} (P={P}): {t*1e3:.2f} ms  {up/t/1e9:.2f} G pairs/s"
          f"  MFU {macs/197e12/t*100:.0f}% of bf16 peak", flush=True)


if __name__ == "__main__":
    rate_probe()
    tri_main()
