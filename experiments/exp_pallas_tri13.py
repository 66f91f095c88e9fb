"""Round 13: full-square LINEAR-map single-matmul comb kernel.
If this runs near BW/compute floor (~4.5ms for 2x the work), the
triangle's select/prefetch index maps are what break pipelining.
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


def _sq_kernel(oht_ref, ct_ref, eq_ref, gt_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        eq_ref[:] = jnp.zeros_like(eq_ref)
        gt_ref[:] = jnp.zeros_like(gt_ref)
    partial = jax.lax.dot_general(oht_ref[:], ct_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    t = (jnp.int32(127) - partial) >> 7
    gt_ref[:] += t
    eq_ref[:] += partial + (t << 7)


@functools.partial(jax.jit, static_argnames=("bm", "bk"))
def sq_comb(oht, ct, *, bm, bk):
    K, N = oht.shape
    T = N // bm
    return pl.pallas_call(
        _sq_kernel,
        grid=(T, T, K // bk),
        in_specs=[pl.BlockSpec((bk, bm), lambda i, j, k: (k, i)),
                  pl.BlockSpec((bk, bm), lambda i, j, k: (k, j))],
        out_specs=[pl.BlockSpec((bm, bm), lambda i, j, k: (i, j))] * 2,
        out_shape=[jax.ShapeDtypeStruct((N, N), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(oht, ct)


def main():
    n, m, bm = 10240, 1024, 1024
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, (n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2

    # correctness
    sa = a_np[:256].copy(); sa[7] = sa[3]
    with jax.enable_x64(False):
        eqs, gts = sq_comb(enc_onehot_T(jnp.asarray(sa)),
                           enc_combined_T(jnp.asarray(sa)), bm=128, bk=1024)
    assert (np.asarray(eqs) == (sa[:, None, :] == sa[None, :, :]).sum(2)).all()
    assert (np.asarray(gts) == (sa[:, None, :] > sa[None, :, :]).sum(2)).all()
    print("sq correctness OK", flush=True)

    oht = enc_onehot_T(a)
    ct = enc_combined_T(a)

    def mk(KK):
        @jax.jit
        def run(x, ct):
            def body(c, _):
                with jax.enable_x64(False):
                    eq, gt = sq_comb(c, ct, bm=bm, bk=1024)
                s = (eq.sum() + gt.sum())
                return c ^ (s & 1).astype(jnp.int8), None
            c, _ = jax.lax.scan(body, x, None, length=KK)
            return c[0, 0].astype(jnp.int32)
        return run
    t = timed_chain(mk, (oht, ct))
    macs = n * n * 16 * m
    print(f"sq linear-maps: {t*1e3:.2f} ms  {up/t/1e9:.2f} G pairs/s  "
          f"matmul-MFU {macs/394e12/t*100:.0f}%", flush=True)


if __name__ == "__main__":
    main()
