"""Pairwise register-comparison kernels: count_eq / count_gtlt.

This is the N^2 hot path of the framework (reference: sketch::eq::count_eq
and count_gtlt SIMD kernels, called from src/cmp_core.cpp:372-517 for every
pair). On TPU it becomes a matmul-shaped tiled reduction: tiles of rows of
the two register matrices are compared elementwise and reduced over the
register axis, with (TM, TN) integer accumulators.

Exactness for floating-point registers: every register value the framework
produces is non-negative (OPH signatures are -log-transformed, CSetSketch
registers are exponential draws), and for non-negative IEEE doubles the
total order of values equals the unsigned integer order of their bit
patterns. Signatures are therefore bitcast to uint64 once, and all
comparisons run in (hi, lo) uint32 limb pairs — no f64 emulation on TPU,
bit-exact eq/gt/lt.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def f64_to_ordered_u64(x: np.ndarray) -> np.ndarray:
    """Bitcast non-negative f64 -> u64 preserving order (host-side)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    if np.signbit(x).any():
        raise ValueError("ordered bitcast requires non-negative values")
    return x.view(np.uint64)


def _split_u64(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = x.astype(jnp.uint64)
    return (x >> jnp.uint64(32)).astype(jnp.uint32), x.astype(jnp.uint32)


def _pad_rows(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)


def _tile_counts_int(a, b, want_gtlt: bool):
    """a: (TM, m), b: (TN, m) same int dtype. Returns (eq, gt, lt) i32."""
    ae = a[:, None, :]
    be = b[None, :, :]
    eq = (ae == be).sum(-1, dtype=jnp.int32)
    if not want_gtlt:
        return eq, None, None
    gt = (ae > be).sum(-1, dtype=jnp.int32)
    lt = (ae < be).sum(-1, dtype=jnp.int32)
    return eq, gt, lt


def _tile_counts_u64(a_hi, a_lo, b_hi, b_lo, want_gtlt: bool):
    ah = a_hi[:, None, :]
    al = a_lo[:, None, :]
    bh = b_hi[None, :, :]
    bl = b_lo[None, :, :]
    hi_eq = ah == bh
    eq = (hi_eq & (al == bl)).sum(-1, dtype=jnp.int32)
    if not want_gtlt:
        return eq, None, None
    gt = ((ah > bh) | (hi_eq & (al > bl))).sum(-1, dtype=jnp.int32)
    lt = ((ah < bh) | (hi_eq & (al < bl))).sum(-1, dtype=jnp.int32)
    return eq, gt, lt


@functools.partial(jax.jit, static_argnames=("want_gtlt", "tm", "tn"))
def _pairwise_counts(a: jnp.ndarray, b: jnp.ndarray, *, want_gtlt: bool,
                     tm: int, tn: int):
    """Tiled all-pairs counts. a: (N, m), b: (M, m) of identical integer
    dtype (u8/u16/u32/u64). Returns (eq, gt, lt) int32 (N, M); gt/lt None
    when not requested (represented as zeros to keep a static pytree)."""
    N, m = a.shape
    M = b.shape[0]
    a = _pad_rows(a, tm)
    b = _pad_rows(b, tn)
    nA = a.shape[0] // tm
    nB = b.shape[0] // tn
    is64 = a.dtype == jnp.uint64
    if is64:
        ah, al = _split_u64(a)
        bh, bl = _split_u64(b)
        a_tiles = (ah.reshape(nA, tm, m), al.reshape(nA, tm, m))
        b_tiles = (bh.reshape(nB, tn, m), bl.reshape(nB, tn, m))
    else:
        a_tiles = (a.reshape(nA, tm, m),)
        b_tiles = (b.reshape(nB, tn, m),)

    def j_step(a_tile):
        def body(_, bt):
            if is64:
                eq, gt, lt = _tile_counts_u64(a_tile[0], a_tile[1],
                                              bt[0], bt[1], want_gtlt)
            else:
                eq, gt, lt = _tile_counts_int(a_tile[0], bt[0], want_gtlt)
            if not want_gtlt:
                z = jnp.zeros_like(eq)
                return None, (eq, z, z)
            return None, (eq, gt, lt)
        _, tiles = jax.lax.scan(body, None, b_tiles)
        # tiles: (nB, tm, tn) each
        return tuple(t.transpose(1, 0, 2).reshape(tm, nB * tn) for t in tiles)

    def i_body(_, at):
        return None, j_step(at)
    _, rows = jax.lax.scan(i_body, None, a_tiles)
    out = tuple(r.reshape(nA * tm, nB * tn)[:N, :M] for r in rows)
    return out


def count_eq(a, b, tm: int = 32, tn: int = 32) -> jnp.ndarray:
    """eq counts for all row pairs: out[i, j] = #{r : a[i,r] == b[j,r]}."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return _pairwise_counts(a, b, want_gtlt=False, tm=tm, tn=tn)[0]


def count_gtlt(a, b, tm: int = 32, tn: int = 32
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gt, lt) counts: gt[i,j] = #{r : a[i,r] > b[j,r]} (count_gtlt
    semantics from the reference's SIMD kernels; eq = m - gt - lt)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    _, gt, lt = _pairwise_counts(a, b, want_gtlt=True, tm=tm, tn=tn)
    return gt, lt


def count_eq_nibbles(a_packed, b_packed, tm: int = 32, tn: int = 32
                     ) -> jnp.ndarray:
    """eq counts over nibble-packed registers (two per byte;
    count_eq_nibbles semantics, cmp_core.cpp:381-385)."""
    a = jnp.asarray(a_packed, dtype=jnp.uint8)
    b = jnp.asarray(b_packed, dtype=jnp.uint8)
    lo_a = a & jnp.uint8(0xF)
    hi_a = a >> jnp.uint8(4)
    lo_b = b & jnp.uint8(0xF)
    hi_b = b >> jnp.uint8(4)
    ia = jnp.concatenate([lo_a, hi_a], axis=1)
    ib = jnp.concatenate([lo_b, hi_b], axis=1)
    return count_eq(ia, ib, tm, tn)


def count_gtlt_nibbles(a_packed, b_packed, tm: int = 32, tn: int = 32):
    a = jnp.asarray(a_packed, dtype=jnp.uint8)
    b = jnp.asarray(b_packed, dtype=jnp.uint8)
    lo_a = a & jnp.uint8(0xF)
    hi_a = a >> jnp.uint8(4)
    lo_b = b & jnp.uint8(0xF)
    hi_b = b >> jnp.uint8(4)
    ia = jnp.concatenate([lo_a, hi_a], axis=1)
    ib = jnp.concatenate([lo_b, hi_b], axis=1)
    return count_gtlt(ia, ib, tm, tn)
