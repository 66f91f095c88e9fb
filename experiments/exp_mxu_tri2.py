"""Round 2 of the MXU experiment: honest probes (sum over ALL outputs so
XLA cannot DCE tiles), plus the combined bf16 single-matmul gtlt trick:

  A_enc[(r,v)] = 2048*[a_r > v] + [a_r == v]   (values {0,1,2048}: bf16-exact)
  B_oh [(r,v)] = [b_r == v]
  A_enc @ B_oh^T = 2048*gt + eq                (< 2^24: f32-exact)

Engines measured at N=10240, m=1024, T=8 bands:
  A  full-square 2x int8 matmul gtlt            (reference point)
  B  banded 2x int8 matmul gtlt                 (honest probe)
  C  banded 1x int8 eq-only                     (b-bit estimator path)
  E  banded 1x bf16 combined gtlt (decoded)
  F  banded 1x int4 eq-only
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_chain(make_fn, arg, reps=3, K=4):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(arg)); np.asarray(fk(arg))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(arg)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(arg)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def enc_oh(a, dtype):
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    return (a[:, :, None] == lv).astype(dtype).reshape(n, m * 16)


def enc_lt(a, dtype):
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    return (a[:, :, None] < lv).astype(dtype).reshape(n, m * 16)


def enc_comb(a):
    """2048*[a > v] + [a == v] as bf16."""
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    gt = (a[:, :, None] > lv).astype(jnp.bfloat16) * jnp.bfloat16(2048.0)
    eq = (a[:, :, None] == lv).astype(jnp.bfloat16)
    return (gt + eq).reshape(n, m * 16)


def bdot(L, R, pt):
    return jax.lax.dot_general(L, R, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=pt)


def run_banded(a, T, mode):
    """mode: gtlt_i8 | eq_i8 | comb_bf16 | eq_i4. Returns probe scalar
    that depends on every output element."""
    n, m = a.shape
    B = n // T
    acc = jnp.int32(0) if mode != "comb_bf16" else jnp.float32(0)
    if mode == "gtlt_i8":
        oh = enc_oh(a, jnp.int8).reshape(T, B, m * 16)
        lt = enc_lt(a, jnp.int8).reshape(T, B, m * 16)
        for d in range(T):
            eq = bdot(oh[d:], oh[:T - d], jnp.int32)
            gt = bdot(oh[d:], lt[:T - d], jnp.int32)
            acc = acc + eq.sum() + gt.sum()
    elif mode == "eq_i8":
        oh = enc_oh(a, jnp.int8).reshape(T, B, m * 16)
        for d in range(T):
            acc = acc + bdot(oh[d:], oh[:T - d], jnp.int32).sum()
    elif mode == "eq_i4":
        oh = enc_oh(a, jnp.int4).reshape(T, B, m * 16)
        for d in range(T):
            acc = acc + bdot(oh[d:], oh[:T - d], jnp.int32).sum()
    elif mode == "comb_bf16":
        ce = enc_comb(a).reshape(T, B, m * 16)
        oh = enc_oh(a, jnp.bfloat16).reshape(T, B, m * 16)
        for d in range(T):
            acc = acc + bdot(ce[d:], oh[:T - d], jnp.float32).sum()
    return acc


def main():
    n, m, T = 10240, 1024, 8
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, size=(n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2
    I8 = 394e12
    BF16 = 197e12

    # correctness of the combined bf16 decode on small data
    s = a_np[:256]
    ce = enc_comb(jnp.asarray(s))
    oh = enc_oh(jnp.asarray(s), jnp.bfloat16)
    out = np.asarray(jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    )(ce, oh))
    gt_dec = np.floor(out / 2048).astype(np.int32)
    eq_dec = (out - 2048 * gt_dec).astype(np.int32)
    gt_ref = (s[:, None, :] > s[None, :, :]).sum(2)
    eq_ref = (s[:, None, :] == s[None, :, :]).sum(2)
    assert (gt_dec == gt_ref).all() and (eq_dec == eq_ref).all(), "decode!"
    print("combined bf16 decode OK", flush=True)

    def mk(mode):
        def make(K):
            @jax.jit
            def run(x):
                def body(c, _):
                    p = run_banded(c, T, mode)
                    return c ^ (p.astype(jnp.int32) & 15).astype(jnp.uint8), None
                c, _ = jax.lax.scan(body, x, None, length=K)
                return c[0, 0]
            return run
        return make

    P = T * (T + 1) / 2
    B = n // T
    for mode, nm, peak in [("gtlt_i8", 2, I8), ("eq_i8", 1, I8),
                           ("comb_bf16", 1, BF16), ("eq_i4", 1, I8)]:
        try:
            t = timed_chain(mk(mode), a)
            macs = nm * P * B * B * 16 * m
            print(f"{mode:10s}: {t*1e3:7.2f} ms  {up/t/1e9:6.2f} G pairs/s  "
                  f"MFU {macs/peak/t*100:.0f}% (vs {'i8' if peak==I8 else 'bf16'} peak)",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
