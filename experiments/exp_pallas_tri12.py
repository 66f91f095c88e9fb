"""Round 12: bm=2048 single-matmul tri kernel (prefetch grid, T=5 odd).
Traffic halves vs bm=1024 (the bm=1024 kernel is HBM-BW-bound at
~4B/MAC-row). vmem 48MB: outs 2x16MB resident + in 2x2MBx2buf.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo/experiments")
from exp_pallas_tri5 import timed_chain
sys.path.insert(0, "/root/repo")
from dashing2_tpu.ops.pallas_cmp import enc_onehot_T, enc_combined_T


def _tri_pf_kernel(ii_ref, jj_ref, oht_ref, ct_ref, eq_ref, gt_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        eq_ref[0] = jnp.zeros_like(eq_ref[0])
        gt_ref[0] = jnp.zeros_like(gt_ref[0])
    partial = jax.lax.dot_general(oht_ref[:], ct_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    t = (jnp.int32(127) - partial) >> 7
    gt_ref[0] += t
    eq_ref[0] += partial + (t << 7)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "vmem"))
def tri_pf(ii, jj, oht, ct, *, bm, bk, vmem):
    K, N = oht.shape
    P = ii.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(P, K // bk),
        in_specs=[pl.BlockSpec((bk, bm), lambda p, k, ii, jj: (k, ii[p])),
                  pl.BlockSpec((bk, bm), lambda p, k, ii, jj: (k, jj[p]))],
        out_specs=[pl.BlockSpec((1, bm, bm), lambda p, k, ii, jj: (p, 0, 0))] * 2)
    return pl.pallas_call(
        _tri_pf_kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P, bm, bm), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem))(
            ii, jj, oht, ct)


def main():
    n, m = 10240, 1024
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, (n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2

    # correctness at bm=128 (prefetch form)
    sa = a_np[:512].copy()
    sa[7] = sa[3]; sa[100] = 0
    sii, sjj = np.tril_indices(4)
    with jax.enable_x64(False):
        eqs, gts = tri_pf(jnp.asarray(sii.astype(np.int32)),
                          jnp.asarray(sjj.astype(np.int32)),
                          enc_onehot_T(jnp.asarray(sa)),
                          enc_combined_T(jnp.asarray(sa)),
                          bm=128, bk=1024, vmem=32 << 20)
    eq_ref = (sa[:, None, :] == sa[None, :, :]).sum(2)
    gt_ref = (sa[:, None, :] > sa[None, :, :]).sum(2)
    for p, (bi, bj) in enumerate(zip(sii, sjj)):
        sl = np.s_[bi*128:(bi+1)*128, bj*128:(bj+1)*128]
        assert (np.asarray(eqs)[p] == eq_ref[sl]).all()
        assert (np.asarray(gts)[p] == gt_ref[sl]).all()
    print("pf correctness OK", flush=True)

    oht = enc_onehot_T(a)
    ct = enc_combined_T(a)
    for bm, vmem in ((2048, 100 << 20),):
        T = n // bm
        iis, jjs = np.tril_indices(T)
        o = np.lexsort((jjs, iis))
        ii = jnp.asarray(iis[o].astype(np.int32))
        jj = jnp.asarray(jjs[o].astype(np.int32))
        P = len(iis)
        macs = P * bm * bm * 16 * m

        def mk(KK):
            @jax.jit
            def run(x, ct):
                def body(c, _):
                    with jax.enable_x64(False):
                        eq, gt = tri_pf(ii, jj, c, ct, bm=bm, bk=1024,
                                        vmem=vmem)
                    s = (eq.sum() + gt.sum())
                    return c ^ (s & 1).astype(jnp.int8), None
                c, _ = jax.lax.scan(body, x, None, length=KK)
                return c[0, 0].astype(jnp.int32)
            return run
        try:
            t = timed_chain(mk, (oht, ct))
            print(f"bm={bm} vmem={vmem>>20}MB (P={P}): {t*1e3:.2f} ms  "
                  f"{up/t/1e9:.2f} G pairs/s  "
                  f"matmul-MFU {macs/394e12/t*100:.0f}%", flush=True)
        except Exception as e:
            print(f"bm={bm} vmem={vmem>>20} failed: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
