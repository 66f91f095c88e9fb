"""REJECTED round-3 engine, kept for the measurement record: triangular
single-word Pallas VPU compare kernels for the default / fastcmp 1-2
comparison paths.

Measured at N=10240 m=1024 on one v5e (experiments/r3_word_kernels.py,
chained differential timing): the i32 eq+gt row-loop tile kernel runs
at 194 ms/matrix — LOSING to XLA's circulant (92-125 ms) and to the
SWAR packed engines that shipped instead (20-69 ms). Mosaic could not
express the packed row loads or fori-carried accumulators that a
competitive hand-written kernel needed. See experiments/R3_RESULTS.md
section 1 and the ceiling note in ops/pallas_cmp.py.

The code preserves the exact kernels that were measured; it shares the
rectangle-packed triangular grid helpers with the production nibble MXU
engines in dashing2_tpu.ops.pallas_cmp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dashing2_tpu.ops.pallas_cmp import (_on_tpu, _tri_assemble_counts,
                                         _tri_pair_slot)


def _tri_word_kernel(a_ref, b_ref, eq_ref, gt_ref):
    bm = a_ref.shape[0]
    b = b_ref[:]

    def body(i, _):
        ar = a_ref[pl.ds(i, 1), :]
        eq_ref[0, pl.ds(i, 1), :] = jnp.sum(
            (ar == b).astype(jnp.int32), axis=1, dtype=jnp.int32)[None, :]
        gt_ref[0, pl.ds(i, 1), :] = jnp.sum(
            (ar > b).astype(jnp.int32), axis=1, dtype=jnp.int32)[None, :]
        return 0

    jax.lax.fori_loop(0, bm, body, 0)


def _tri_word_eq_kernel(a_ref, b_ref, eq_ref):
    bm = a_ref.shape[0]
    b = b_ref[:]

    def body(i, _):
        ar = a_ref[pl.ds(i, 1), :]
        eq_ref[0, pl.ds(i, 1), :] = jnp.sum(
            (ar == b).astype(jnp.int32), axis=1, dtype=jnp.int32)[None, :]
        return 0

    jax.lax.fori_loop(0, bm, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("bm", "T", "want_gtlt", "interpret"))
def _tri_word_call(a, *, bm: int, T: int, want_gtlt: bool, interpret: bool):
    """a: (T*bm, m) signed single-word registers. Returns (P, bm, bm)
    i32 eq tiles (+ gt tiles when want_gtlt) over the rectangle-packed
    lower-triangle block-pair grid (same slot layout as the MXU tri
    engines)."""
    npad, m = a.shape
    H = T // 2
    P = H * (T + 1)

    def row(u, v):
        return jax.lax.select(v <= u, u, T - 1 - u)

    def col(u, v):
        return jax.lax.select(v <= u, v, v - u - 1)

    nout = 2 if want_gtlt else 1
    return pl.pallas_call(
        _tri_word_kernel if want_gtlt else _tri_word_eq_kernel,
        grid=(H, T + 1),
        in_specs=[
            pl.BlockSpec((bm, m), lambda u, v: (row(u, v), 0)),
            pl.BlockSpec((bm, m), lambda u, v: (col(u, v), 0)),
        ],
        out_specs=[pl.BlockSpec((1, bm, bm),
                                lambda u, v: (u * (T + 1) + v, 0, 0))] * nout,
        out_shape=[jax.ShapeDtypeStruct((P, bm, bm), jnp.int32)] * nout,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(a, a)


_TRI_W_BM = 1024


def tri_word_available(n: int, m: int, dtype=None) -> bool:
    """The word tri engine wants a TPU, enough rows to amortize the
    triangular grid, and operand blocks that fit VMEM (two (bm, m) i32
    blocks + two (bm, bm) i32 outputs under the 100 MB limit)."""
    return _on_tpu() and n > _TRI_W_BM and m <= 8192


def tri_counts_word_tiles(a_word: jnp.ndarray, want_gtlt: bool,
                          bm: int = 0, interpret: Optional[bool] = None):
    """Tile-level word engine: (eq_t, gt_t or None, T, bm, npad) for all
    self-pairs of one signed single-word register matrix (N, m). Input
    must be order-mapped to a SIGNED dtype (i32 ranks; u8^0x80 -> i8;
    u16 -> i16 via ^0x8000) — unsigned compares in signed vregs would
    wrap. Traceable (fixed pad shape per N)."""
    n, m = a_word.shape
    bm = bm or _TRI_W_BM
    T = -(-n // bm)
    if T % 2:
        T += 1
    npad = T * bm
    if npad != n:
        # pad with the dtype minimum: padding rows never exceed real
        # rows, keeping gt tiles' real-row halves exact (sliced anyway)
        a_word = jnp.concatenate(
            [a_word, jnp.full((npad - n, m),
                              jnp.iinfo(a_word.dtype).min, a_word.dtype)])
    if interpret is None:
        interpret = not _on_tpu()
    with jax.enable_x64(False):
        out = _tri_word_call(a_word, bm=bm, T=T, want_gtlt=want_gtlt,
                             interpret=interpret)
    if want_gtlt:
        eq_t, gt_t = out
    else:
        eq_t, gt_t = out[0], None
    return eq_t, gt_t, T, bm, npad


def counts_word_tri_self(a_word: jnp.ndarray, want_gtlt: bool = True,
                         bm: int = 0, interpret: Optional[bool] = None):
    """(eq, gt, lt) full count matrices for all self-pairs of a signed
    single-word register matrix via the triangular VPU engine."""
    n, m = a_word.shape
    eq_t, gt_t, T, bm, npad = tri_counts_word_tiles(
        a_word, want_gtlt, bm=bm, interpret=interpret)
    if not want_gtlt:
        slot = _tri_pair_slot(T)
        rows = []
        for bi in range(T):
            cols = []
            for bj in range(T):
                if bi >= bj:
                    cols.append(eq_t[int(slot[bi, bj])])
                else:
                    cols.append(eq_t[int(slot[bj, bi])].T)
            rows.append(jnp.concatenate(cols, axis=1))
        eq = jnp.concatenate(rows, axis=0)[:n, :n]
        return eq, None, None
    eq, gt = _tri_assemble_counts(eq_t, gt_t, T, m)
    eq = eq[:n, :n]
    gt = gt[:n, :n]
    return eq, gt, jnp.int32(m) - eq - gt
