"""Round-4: memoized pair-matrix EXTRACTION variants.

The round-4 memoized count-matrix route builds the full (N, N) u32
gt|lt<<16 matrix once at tile rate, then serves each pair list by
`jnp.take(flat, i*N+j)` — a 1M-element gather from a 104M-element
array. Measured 14 ms/1M pairs (0.07 G pairs/s): element gathers are
scalar-unit bound (CLAUDE.md), so the "extraction is cheap" premise
failed. Variants here reshape the flat matrix into narrow ROWS so the
gather rides the fast whole-row path (jnp.take axis=0) and the lane is
selected with a one-hot mask on the VPU:

    row  = idx >> log2(L)     lane = idx & (L-1)
    rows = take(mat.reshape(-1, L), row, axis=0)      # (P, L)
    val  = sum(where(lane[:,None] == iota(L), rows, 0), axis=1)

Traffic = P * 4L bytes (512 B/pair at L=128). Run: python
experiments/r4_pairx.py on the chip.
"""

import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)

N = 10240
P = 1 << 20
BLOCK = 65536

mat = jnp.asarray(rng.integers(0, 1 << 31, size=(N, N),
                               dtype=np.int64).astype(np.uint32))
idx0 = jnp.asarray(rng.integers(0, N * N, size=P).astype(np.int32))


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


def chain_extract(extract_body):
    """Chained timing: each iteration perturbs idx by the previous
    iteration's value sum, so the gathers are data-dependent."""
    def mk(K):
        @jax.jit
        def f(mat, idx):
            def body(c, _):
                # XOR the low 16 bits with the carry: data-dependent,
                # stays within take's clamp range
                ix = idx ^ (c & jnp.uint32(0xFFFF)).astype(jnp.int32)
                v = extract_body(mat, ix)
                return v.sum(dtype=jnp.uint32), None
            c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
            return c.astype(jnp.int32)
        return f
    return mk


def flat_take(mat, ix):
    return jnp.take(mat.reshape(-1), ix)


def make_rowtake(L):
    nb = P // BLOCK

    def body(mat, ix):
        m2 = mat.reshape(-1, L)
        lanes = jax.lax.iota(jnp.int32, L)[None, :]

        def blk(c, ib):
            rows = jnp.take(m2, ib >> jnp.int32(L.bit_length() - 1),
                            axis=0)
            lane = (ib & jnp.int32(L - 1))[:, None]
            v = jnp.where(lane == lanes, rows, jnp.uint32(0)).sum(
                axis=1, dtype=jnp.uint32)
            return c + v.sum(dtype=jnp.uint32), None
        c, _ = jax.lax.scan(blk, jnp.uint32(0), ix.reshape(nb, BLOCK))
        return c.reshape(1)
    return body


p(f"== pair-matrix extraction, N={N}, P={P}, u32 matrix ==")
try:
    t = timed_chain(chain_extract(flat_take), (mat, idx0), K=3)
    p(f"flat element take: {t*1e3:.2f} ms = {P/t/1e9:.3f} G pairs/s")
except Exception as e:
    p(f"flat take failed: {e}")

for L in (128, 256, 512):
    try:
        t = timed_chain(chain_extract(make_rowtake(L)), (mat, idx0), K=3)
        p(f"row-take L={L} ({4*L} B/pair, blocked {BLOCK}): "
          f"{t*1e3:.2f} ms = {P/t/1e9:.3f} G pairs/s, "
          f"{P*4*L/t/1e9:.0f} GB/s")
    except Exception as e:
        p(f"row-take L={L} failed: {e}")

p("done")

# --- sorted-index variants: pair indices are host-known, so the
# production route can sort them (np.sort, ~ms) and unpermute results
# host-side; sorted gathers walk HBM nearly sequentially ---
p("== sorted-index variants ==")
idx_sorted = jnp.asarray(np.sort(np.asarray(idx0)))


def chain_extract_fixed(extract_body):
    """Sort-preserving data dep: shift EVERY index by carry & 1 —
    uniform, monotone, and impossible for XLA to hoist (the first
    attempt used `+ (c & 0)` and LICM moved the gather out of the scan:
    the unsorted control read 0.00 ms)."""
    def mk(K):
        @jax.jit
        def f(mat, idx):
            def body(c, _):
                ix = idx + (c & jnp.uint32(1)).astype(jnp.int32)
                v = extract_body(mat, ix)
                return c + v.sum(dtype=jnp.uint32), None
            c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
            return c.astype(jnp.int32)
        return f
    return mk


try:
    t = timed_chain(chain_extract_fixed(flat_take), (mat, idx_sorted), K=3)
    p(f"flat take SORTED: {t*1e3:.2f} ms = {P/t/1e9:.3f} G pairs/s")
except Exception as e:
    p(f"flat sorted failed: {e}")

for L in (128, 512):
    try:
        t = timed_chain(chain_extract_fixed(make_rowtake(L)),
                        (mat, idx_sorted), K=3)
        p(f"row-take L={L} SORTED: {t*1e3:.2f} ms = "
          f"{P/t/1e9:.3f} G pairs/s, {P*4*L/t/1e9:.0f} GB/s")
    except Exception as e:
        p(f"row-take L={L} sorted failed: {e}")

# control: unsorted through the same fixed chain (rules out the chain
# shape as the variable)
try:
    t = timed_chain(chain_extract_fixed(make_rowtake(128)), (mat, idx0),
                    K=3)
    p(f"row-take L=128 UNSORTED fixed-chain control: {t*1e3:.2f} ms")
except Exception as e:
    p(f"control failed: {e}")
p("done2")
