"""Experiment: block-triangular MXU engines for nibble-register self-pairs.

Measures, at N=10240 m=1024 on the real chip (chained-scan differential
timing per CLAUDE.md):
  A. full-square 2-matmul gtlt (round-1 engine, reference point)
  B. block-triangular banded gtlt (2 matmuls per lower tile, assembled)
  C. block-triangular eq-only (b-bit estimator path, 1 matmul per tile)
  D. int4 variant of B (if s4 dot lowers on this chip)
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp


def timed_chain(make_fn, arg, reps=3, K=4):
    """per-iteration time via (T_{1+K} - T_1)/K, min over reps."""
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(arg)); np.asarray(fk(arg))  # compile+warm
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(arg)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(arg)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def onehot_enc(a, dtype):
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    return (a[:, :, None] == lv).astype(dtype).reshape(n, m * 16)


def ltcum_enc(a, dtype):
    n, m = a.shape
    lv = jnp.arange(16, dtype=jnp.uint8)
    return (a[:, :, None] < lv).astype(dtype).reshape(n, m * 16)


def full_gtlt(a, dtype=jnp.int8):
    n, m = a.shape
    oh = onehot_enc(a, dtype)
    lt = ltcum_enc(a, dtype)
    eq = jax.lax.dot_general(oh, oh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    gt = jax.lax.dot_general(oh, lt, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return eq, gt


def tri_bands(a, T, dtype=jnp.int8, eq_only=False):
    """banded block-triangular: returns list of (eq, gt) band tensors."""
    n, m = a.shape
    B = n // T
    oh = onehot_enc(a, dtype).reshape(T, B, m * 16)
    lt = None if eq_only else ltcum_enc(a, dtype).reshape(T, B, m * 16)
    outs = []
    for d in range(T):
        L = oh[d:]            # (T-d, B, K) block bi = d+t
        R = oh[:T - d]        # block bj = t
        eq = jax.lax.dot_general(L, R, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.int32)
        if eq_only:
            outs.append((eq,))
        else:
            gt = jax.lax.dot_general(L, lt[:T - d],
                                     (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.int32)
            outs.append((eq, gt))
    return outs


def tri_assemble_gt(bands, T, B, m):
    """full (n, n) gt from banded (eq, gt) tiles; lower = gt tile,
    upper(i<j) = m - eq - gt transposed (trichotomy). Row-block take."""
    # build tile tensor (T, T, B, B) virtually per row-block via concat
    rows = []
    for bi in range(T):
        cols = []
        for bj in range(T):
            if bi >= bj:
                d = bi - bj
                eq, gt = bands[d][0][bj], bands[d][1][bj]
                cols.append(gt)
            else:
                d = bj - bi
                eq, gt = bands[d][0][bi], bands[d][1][bi]
                cols.append((m - eq - gt).T)
        rows.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(rows, axis=0)


def main():
    n, m, T = 10240, 1024, 8
    if len(sys.argv) > 1:
        n = int(sys.argv[1])
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, 16, size=(n, m)).astype(np.uint8)
    a = jnp.asarray(a_np)
    up = n * (n - 1) / 2
    TOPS_I8 = 394e12

    # correctness of banded vs full on small
    s = jnp.asarray(a_np[:512])
    eqf, gtf = jax.jit(full_gtlt)(s)
    bands = jax.jit(functools.partial(tri_bands, T=4))(s)
    gt_asm = tri_assemble_gt(bands, 4, 128, m)
    ref_gt = np.asarray(gtf)
    got = np.asarray(gt_asm)
    assert (got == ref_gt).all(), "banded gt mismatch"
    print("banded correctness OK", flush=True)

    # A. full-square gtlt
    def mk_full(K):
        @jax.jit
        def run(x):
            def body(c, _):
                eq, gt = full_gtlt(c)
                return c ^ (gt[0, 0] & 15).astype(jnp.uint8), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0]
        return run

    tA = timed_chain(mk_full, a)
    print(f"A full-square gtlt: {tA*1e3:.2f} ms  {up/tA/1e9:.2f} G pairs/s  "
          f"MFU {2*n*n*16*m/TOPS_I8/tA*100:.0f}%", flush=True)

    # B. banded gtlt with assembly
    def mk_band(K, eq_only=False, dtype=jnp.int8):
        @jax.jit
        def run(x):
            def body(c, _):
                bands = tri_bands(c, T, dtype=dtype, eq_only=eq_only)
                if eq_only:
                    probe = bands[1][0][0, 0, 0]
                else:
                    gt = tri_assemble_gt(bands, T, n // T, m)
                    probe = gt[0, 0]
                return c ^ (probe & 15).astype(jnp.uint8), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0]
        return run

    tB = timed_chain(mk_band, a)
    macs_B = 2 * (T * (T + 1) / 2) * (n // T) ** 2 * 16 * m
    print(f"B banded gtlt+asm: {tB*1e3:.2f} ms  {up/tB/1e9:.2f} G pairs/s  "
          f"MFU {macs_B/TOPS_I8/tB*100:.0f}%", flush=True)

    # C. banded eq-only (no assembly, epilogue-free probe)
    tC = timed_chain(lambda K: mk_band(K, eq_only=True), a)
    macs_C = macs_B / 2
    print(f"C banded eq-only:  {tC*1e3:.2f} ms  {up/tC/1e9:.2f} G pairs/s  "
          f"MFU {macs_C/TOPS_I8/tC*100:.0f}%", flush=True)

    # D. int4
    try:
        tD = timed_chain(lambda K: mk_band(K, dtype=jnp.int4), a)
        print(f"D banded gtlt s4:  {tD*1e3:.2f} ms  {up/tD/1e9:.2f} G pairs/s",
              flush=True)
    except Exception as e:
        print(f"D int4 failed: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
