"""Pallas tri round 7: static rectangle-packed triangle grid (no scalar
prefetch): pair block-rows u and T-1-u -> grid (T/2, T+1, K/bk) covers
each lower-triangle pair exactly once with arithmetic index maps.
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo/experiments")
from exp_pallas_tri5 import (timed_chain, enc_oh, enc_oh_T, enc_lt_T)


def _k(ii_unused):
    pass


def _tri_i8_kernel(oh_ref, oht_ref, ltt_ref, eq_ref, gt_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        eq_ref[0] = jnp.zeros_like(eq_ref[0])
        gt_ref[0] = jnp.zeros_like(gt_ref[0])
    a = oh_ref[:]
    eq_ref[0] += jax.lax.dot_general(a, oht_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
    gt_ref[0] += jax.lax.dot_general(a, ltt_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "T"))
def tri_i8_static(oh, oht, ltt, *, bm, bk, T):
    N, K = oh.shape
    H = T // 2
    P = H * (T + 1)

    def row(u, v):
        return jax.lax.select(v <= u, u, T - 1 - u)

    def col(u, v):
        return jax.lax.select(v <= u, v, v - u - 1)

    grid = (H, T + 1, K // bk)
    return pl.pallas_call(
        _tri_i8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda u, v, k: (row(u, v), k)),
            pl.BlockSpec((bk, bm), lambda u, v, k: (k, col(u, v))),
            pl.BlockSpec((bk, bm), lambda u, v, k: (k, col(u, v))),
        ],
        out_specs=[pl.BlockSpec((1, bm, bm),
                                lambda u, v, k: (u * (T + 1) + v, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((P, bm, bm), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
    )(oh, oht, ltt)


def pair_table(T):
    """(P, 2) block (i, j) for out slot p = u*(T+1)+v."""
    H = T // 2
    out = np.empty((H * (T + 1), 2), np.int64)
    for u in range(H):
        for v in range(T + 1):
            p = u * (T + 1) + v
            if v <= u:
                out[p] = (u, v)
            else:
                out[p] = (T - 1 - u, v - u - 1)
    return out


def main():
    n, m, bm = 10240, 1024, 1024
    T = n // bm
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, (n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2
    P = (T // 2) * (T + 1)
    macs = P * bm * bm * 16 * m

    # correctness (small): T=4, n=512
    sa = a_np[:512]
    with jax.enable_x64(False):
        eqs, gts = tri_i8_static(enc_oh(jnp.asarray(sa), jnp.int8),
                                 enc_oh_T(jnp.asarray(sa)),
                                 enc_lt_T(jnp.asarray(sa)),
                                 bm=128, bk=1024, T=4)
    eqs, gts = np.asarray(eqs), np.asarray(gts)
    gt_ref = (sa[:, None, :] > sa[None, :, :]).sum(2)
    eq_ref = (sa[:, None, :] == sa[None, :, :]).sum(2)
    pt = pair_table(4)
    seen = set()
    for p, (bi, bj) in enumerate(pt):
        sl = np.s_[bi*128:(bi+1)*128, bj*128:(bj+1)*128]
        assert (gts[p] == gt_ref[sl]).all() and (eqs[p] == eq_ref[sl]).all(), p
        seen.add((bi, bj))
    assert len(seen) == 10, seen
    print("static tri correctness OK (all 10 pairs covered)", flush=True)

    oh8 = enc_oh(a, jnp.int8)
    oht = enc_oh_T(a)
    ltt = enc_lt_T(a)

    for bk in (512, 1024):
        def mk(KK):
            @jax.jit
            def run(x, oht, ltt):
                def body(c, _):
                    with jax.enable_x64(False):
                        eq, gt = tri_i8_static(c, oht, ltt, bm=bm, bk=bk, T=T)
                    s = (eq.sum() + gt.sum())
                    return c ^ (s & 1).astype(jnp.int8), None
                c, _ = jax.lax.scan(body, x, None, length=KK)
                return c[0, 0].astype(jnp.int32)
            return run
        try:
            t = timed_chain(mk, (oh8, oht, ltt))
            print(f"static int8 bk={bk}: {t*1e3:.2f} ms  "
                  f"{up/t/1e9:.2f} G pairs/s  "
                  f"MFU {2*macs/394e12/t*100:.0f}%", flush=True)
        except Exception as e:
            print(f"static bk={bk} failed: {str(e)[:150]}", flush=True)

    # production: encodes inside
    def mkD(KK):
        @jax.jit
        def run(x):
            def body(c, _):
                with jax.enable_x64(False):
                    eq, gt = tri_i8_static(enc_oh(c, jnp.int8), enc_oh_T(c),
                                           enc_lt_T(c), bm=bm, bk=512, T=T)
                s = (eq.sum() + gt.sum())
                return c ^ (s & 15).astype(jnp.uint8), None
            c, _ = jax.lax.scan(body, x, None, length=KK)
            return c[0, 0].astype(jnp.int32)
        return run
    t = timed_chain(mkD, a)
    print(f"static int8 enc+kernel: {t*1e3:.2f} ms  {up/t/1e9:.2f} G pairs/s",
          flush=True)


if __name__ == "__main__":
    main()
