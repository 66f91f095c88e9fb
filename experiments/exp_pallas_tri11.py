"""Round 11: scratch-acc variant of the single-matmul tri kernel
(vmem_limit 48MB) vs out-accum; plus cost-estimate hint.
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


def _tri_scratch_kernel(oht_ref, ct_ref, eq_ref, gt_ref, eacc, gacc):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        eacc[:] = jnp.zeros_like(eacc)
        gacc[:] = jnp.zeros_like(gacc)
    partial = jax.lax.dot_general(oht_ref[:], ct_ref[:],
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    t = (jnp.int32(127) - partial) >> 7
    gacc[:] += t
    eacc[:] += partial + (t << 7)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        eq_ref[0] = eacc[:]
        gt_ref[0] = gacc[:]


@functools.partial(jax.jit, static_argnames=("bm", "bk", "T", "cost"))
def tri_scratch(oht, ct, *, bm, bk, T, cost=False):
    K, N = oht.shape
    H = T // 2
    P = H * (T + 1)

    def row(u, v):
        return jax.lax.select(v <= u, u, T - 1 - u)

    def col(u, v):
        return jax.lax.select(v <= u, v, v - u - 1)

    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * P * bm * bm * K,
            bytes_accessed=P * (K // bk) * 2 * bk * bm + P * bm * bm * 8,
            transcendentals=0)
    return pl.pallas_call(
        _tri_scratch_kernel,
        grid=(H, T + 1, K // bk),
        in_specs=[
            pl.BlockSpec((bk, bm), lambda u, v, k: (k, row(u, v))),
            pl.BlockSpec((bk, bm), lambda u, v, k: (k, col(u, v))),
        ],
        out_specs=[pl.BlockSpec((1, bm, bm),
                                lambda u, v, k: (u * (T + 1) + v, 0, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((P, bm, bm), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((bm, bm), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
        **kw,
    )(oht, ct)


def main():
    n, m, bm = 10240, 1024, 1024
    T = n // bm
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, (n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2
    P = (T // 2) * (T + 1)
    macs = P * bm * bm * 16 * m

    oht = enc_onehot_T(a)
    ct = enc_combined_T(a)

    # correctness small
    sa = jnp.asarray(a_np[:512])
    with jax.enable_x64(False):
        eqs, gts = tri_scratch(enc_onehot_T(sa).astype(jnp.int8),
                               enc_combined_T(sa), bm=128, bk=1024, T=4)
    eq_ref = (a_np[:512][:, None, :] == a_np[:512][None, :, :]).sum(2)
    p0 = np.asarray(eqs)[0]
    assert (p0 == eq_ref[:128, :128]).all()
    print("scratch correctness OK", flush=True)

    for label, cost in (("scratch", False), ("scratch+cost", True)):
        def mk(KK):
            @jax.jit
            def run(x, ct):
                def body(c, _):
                    with jax.enable_x64(False):
                        eq, gt = tri_scratch(c, ct, bm=bm, bk=1024, T=T,
                                             cost=cost)
                    s = (eq.sum() + gt.sum())
                    return c ^ (s & 1).astype(jnp.int8), None
                c, _ = jax.lax.scan(body, x, None, length=KK)
                return c[0, 0].astype(jnp.int32)
            return run
        t = timed_chain(mk, (oht, ct))
        print(f"{label}: {t*1e3:.2f} ms  {up/t/1e9:.2f} G pairs/s  "
              f"matmul-MFU {macs/394e12/t*100:.0f}%", flush=True)


if __name__ == "__main__":
    main()
