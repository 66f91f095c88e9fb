"""Round 14: two 64-register chunks per grid step for the combined gtlt
kernel (bk=2048 block, two dots + decodes in the body) — halves the
number of grid steps and their fixed overhead."""
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


def _tri2c_kernel(oht_ref, ct_ref, eq_ref, gt_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        eq_ref[0] = jnp.zeros_like(eq_ref[0])
        gt_ref[0] = jnp.zeros_like(gt_ref[0])
    for h in range(2):
        partial = jax.lax.dot_general(
            oht_ref[pl.ds(h * 1024, 1024), :],
            ct_ref[pl.ds(h * 1024, 1024), :],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        t = (jnp.int32(127) - partial) >> 7
        gt_ref[0] += t
        eq_ref[0] += partial + (t << 7)


@functools.partial(jax.jit, static_argnames=("bm", "T"))
def tri2c(oht, ct, *, bm, T):
    K, N = oht.shape
    H = T // 2
    P = H * (T + 1)
    bk = 2048

    def row(u, v):
        return jax.lax.select(v <= u, u, T - 1 - u)

    def col(u, v):
        return jax.lax.select(v <= u, v, v - u - 1)

    return pl.pallas_call(
        _tri2c_kernel,
        grid=(H, T + 1, K // bk),
        in_specs=[
            pl.BlockSpec((bk, bm), lambda u, v, k: (k, row(u, v))),
            pl.BlockSpec((bk, bm), lambda u, v, k: (k, col(u, v))),
        ],
        out_specs=[pl.BlockSpec((1, bm, bm),
                                lambda u, v, k: (u * (T + 1) + v, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((P, bm, bm), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
    )(oht, ct)


def main():
    n, m, bm = 10240, 1024, 1024
    T = n // bm
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, (n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2

    sa = a_np[:512].copy(); sa[7] = sa[3]; sa[50] = 0
    with jax.enable_x64(False):
        eqs, gts = tri2c(enc_onehot_T(jnp.asarray(sa)),
                         enc_combined_T(jnp.asarray(sa)), bm=128, T=4)
    eq_ref = (sa[:, None, :] == sa[None, :, :]).sum(2)
    gt_ref = (sa[:, None, :] > sa[None, :, :]).sum(2)
    assert (np.asarray(eqs)[0] == eq_ref[:128, :128]).all()
    assert (np.asarray(gts)[0] == gt_ref[:128, :128]).all()
    print("2-chunk correctness OK", flush=True)

    oht = enc_onehot_T(a)
    ct = enc_combined_T(a)

    def mk(KK):
        @jax.jit
        def run(x, ct):
            def body(c, _):
                with jax.enable_x64(False):
                    eq, gt = tri2c(c, ct, bm=bm, T=T)
                s = (eq.sum() + gt.sum())
                return c ^ (s & 1).astype(jnp.int8), None
            c, _ = jax.lax.scan(body, x, None, length=KK)
            return c[0, 0].astype(jnp.int32)
        return run
    t = timed_chain(mk, (oht, ct))
    print(f"2-chunk gtlt: {t*1e3:.2f} ms  {up/t/1e9:.2f} G pairs/s",
          flush=True)


if __name__ == "__main__":
    main()
