"""Pallas TPU kernels for the N^2 register-comparison hot path.

Two engines:

* ``gtlt_pallas`` — VPU kernel for 64-bit registers held as (hi, lo) u32
  pairs. Grid tiles (TM, TN) of the output; each step holds an A-row tile
  and a B-row tile in VMEM and accumulates per-A-row (TN, m) compares with
  a lane reduction, avoiding the (TM, TN, m) broadcast intermediate the
  XLA fallback materializes.

* ``counts_nibble_mxu`` — MXU path for a/b-quantized nibble registers
  (--fastcmp 0.5): eq and gt counts become exact int8 one-hot matmuls,
    eq[i,j]  = onehot(A) . onehot(B)^T
    gt[i,j]  = onehot(A) . cumlt(B)^T   (cumlt[j, r, v] = [B[j,r] < v])
  putting the all-pairs reduction on the systolic array (~2 * N * M * 16m
  int8 MACs).

Both fall back to interpret mode off-TPU so the CPU test mesh exercises
identical code paths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _gtlt_kernel(ah_ref, al_ref, bh_ref, bl_ref, gt_ref, lt_ref):
    tm = ah_ref.shape[0]
    bh = bh_ref[:]          # (TN, m)
    bl = bl_ref[:]
    # static row unroll: per A-row one (TN, m) compare + lane reduction
    for i in range(tm):
        arh = ah_ref[i, :][None, :]    # (1, m)
        arl = al_ref[i, :][None, :]
        hi_eq = arh == bh
        gt = ((arh > bh) | (hi_eq & (arl > bl))).astype(jnp.int32)
        lt = ((arh < bh) | (hi_eq & (arl < bl))).astype(jnp.int32)
        gt_ref[i, :] = jnp.sum(gt, axis=1, dtype=jnp.int32)
        lt_ref[i, :] = jnp.sum(lt, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _gtlt_pallas_call(ah, al, bh, bl, *, tm: int, tn: int, interpret: bool):
    n, m = ah.shape
    mm = bh.shape[0]
    # grid: j outer, i inner -> the B tile stays VMEM-resident across the
    # whole inner sweep (pallas skips re-fetch when the block index map
    # yields the same block)
    grid = (mm // tn, n // tm)
    out_shape = [jax.ShapeDtypeStruct((n, mm), jnp.int32)] * 2
    return pl.pallas_call(
        _gtlt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, m), lambda j, i: (i, 0)),
            pl.BlockSpec((tm, m), lambda j, i: (i, 0)),
            pl.BlockSpec((tn, m), lambda j, i: (j, 0)),
            pl.BlockSpec((tn, m), lambda j, i: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda j, i: (i, j)),
            pl.BlockSpec((tm, tn), lambda j, i: (i, j)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(ah, al, bh, bl)


def _pad_rows(x: np.ndarray, mult: int):
    pad = (-x.shape[0]) % mult
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, pad


def gtlt_pallas(a_u64, b_u64, tm: int = 256, tn: int = 256
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gt, lt) i32 counts for u64 register matrices (N, m) x (M, m)."""
    a = np.asarray(a_u64, dtype=np.uint64)
    b = np.asarray(b_u64, dtype=np.uint64)
    n0, m0 = a.shape[0], b.shape[0]
    # Mosaic tiling: output blocks need (>=8, >=128); shrink tiles toward
    # the (padded) array sizes for small inputs.
    tm = max(8, min(tm, 1 << max(n0 - 1, 1).bit_length()))
    tn = max(128, min(tn, 1 << max(m0 - 1, 1).bit_length()))
    a, _ = _pad_rows(a, tm)
    b, _ = _pad_rows(b, tn)
    ah = (a >> np.uint64(32)).astype(np.uint32)
    al = a.astype(np.uint32)
    bh = (b >> np.uint64(32)).astype(np.uint32)
    bl = b.astype(np.uint32)
    # The kernel is pure u32/i32; disable x64 around the pallas call so
    # Mosaic's grid/loop indices stay 32-bit (x64 mode makes them i64,
    # which Mosaic cannot legalize).
    with jax.enable_x64(False):
        gt, lt = _gtlt_pallas_call(jnp.asarray(ah), jnp.asarray(al),
                                   jnp.asarray(bh), jnp.asarray(bl),
                                   tm=tm, tn=tn, interpret=not _on_tpu())
    return gt[:n0, :m0], lt[:n0, :m0]


# ----------------------------------------------------------------------
# single-word integer registers (compressed fastcmp paths)
# ----------------------------------------------------------------------

def _int_counts_kernel(a_ref, b_ref, eq_ref, gt_ref, lt_ref):
    tm = a_ref.shape[0]
    b = b_ref[:]
    for i in range(tm):
        ar = a_ref[i, :][None, :]
        eq_ref[i, :] = jnp.sum((ar == b).astype(jnp.int32), axis=1,
                               dtype=jnp.int32)
        gt_ref[i, :] = jnp.sum((ar > b).astype(jnp.int32), axis=1,
                               dtype=jnp.int32)
        lt_ref[i, :] = jnp.sum((ar < b).astype(jnp.int32), axis=1,
                               dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _int_counts_call(a, b, *, tm: int, tn: int, interpret: bool):
    n, m = a.shape
    mm = b.shape[0]
    grid = (mm // tn, n // tm)
    out_shape = [jax.ShapeDtypeStruct((n, mm), jnp.int32)] * 3
    return pl.pallas_call(
        _int_counts_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, m), lambda j, i: (i, 0)),
            pl.BlockSpec((tn, m), lambda j, i: (j, 0)),
        ],
        out_specs=[pl.BlockSpec((tm, tn), lambda j, i: (i, j))] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(a, b)


def counts_int_pallas(a, b, tm: int = 16, tn: int = 512):
    """(eq, gt, lt) i32 counts for single-word integer register matrices
    (u8/u16/u32), Pallas VPU kernel. Unsigned compares are done in a
    widened signed type so Mosaic's i8/i16 vector compares stay exact."""
    a = np.asarray(a)
    b = np.asarray(b)
    # widen u8 -> i16, u16/u32 -> i32 (order-preserving, Mosaic-friendly)
    wide = {np.dtype(np.uint8): np.int16, np.dtype(np.uint16): np.int32,
            np.dtype(np.uint32): np.int64}[a.dtype]
    if wide == np.int64:
        # u32 needs 64-bit signed to preserve order; route via the u64 path
        gt, lt = gtlt_pallas(a.astype(np.uint64), b.astype(np.uint64),
                             tm=tm, tn=tn)
        eq = a.shape[1] - gt - lt
        return eq, gt, lt
    n0, m0 = a.shape[0], b.shape[0]
    tm = max(8, min(tm, 1 << max(n0 - 1, 1).bit_length()))
    tn = max(128, min(tn, 1 << max(m0 - 1, 1).bit_length()))
    aw, _ = _pad_rows(a.astype(wide), tm)
    bw, _ = _pad_rows(b.astype(wide), tn)
    # padding rows are all-zero: they produce eq counts against real rows
    # but are sliced away below
    with jax.enable_x64(False):
        eq, gt, lt = _int_counts_call(jnp.asarray(aw), jnp.asarray(bw),
                                      tm=tm, tn=tn,
                                      interpret=not _on_tpu())
    return eq[:n0, :m0], gt[:n0, :m0], lt[:n0, :m0]


# ----------------------------------------------------------------------
# MXU one-hot path for nibble registers
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("want_gtlt",))
def _nibble_mxu(a_nib: jnp.ndarray, b_nib: jnp.ndarray, want_gtlt: bool):
    """a_nib/b_nib: (N, m) uint8 register values in [0, 16)."""
    n, m = a_nib.shape
    levels = jnp.arange(16, dtype=jnp.uint8)
    a_oh = (a_nib[:, :, None] == levels).astype(jnp.int8).reshape(n, m * 16)
    b_oh = (b_nib[:, :, None] == levels).astype(jnp.int8).reshape(-1, m * 16)
    eq = jax.lax.dot_general(
        a_oh, b_oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    if not want_gtlt:
        return eq, eq, eq
    # cumlt[j, r, v] = [b[j, r] < v]  ->  gt = A_onehot . cumlt^T
    b_lt = (b_nib[:, :, None] < levels).astype(jnp.int8).reshape(-1, m * 16)
    gt = jax.lax.dot_general(
        a_oh, b_lt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    lt = m - eq - gt
    return eq, gt, lt


def counts_nibble_mxu(a_nib, b_nib, want_gtlt: bool = True):
    """(eq, gt, lt) i32 counts for unpacked nibble registers via int8
    matmuls on the MXU (exact)."""
    eq, gt, lt = _nibble_mxu(jnp.asarray(a_nib, dtype=jnp.uint8),
                             jnp.asarray(b_nib, dtype=jnp.uint8),
                             want_gtlt)
    return eq, gt, lt
