"""Sketch orchestration: files/sequences -> SketchingResult.

TPU-native rework of fastx2sketch (/root/reference/src/fastxsketch.cpp:162-627)
and fastx2sketch_byseq (:102): instead of per-file OpenMP threads each
streaming k-mers through a private sketch, sequences are chunked into
fixed-shape code blocks (ops/kmers.chunk_codes) and whole *batches of
chunks from many items* flow through one jitted kernel:

    codes (B, L) --[k-mer + hash + minimizer select]--> (B, n) hashes
      --[OPH segment-min keyed by (item, bucket)]--> (nitems, m) registers

Partial registers from successive batches merge on the host by elementwise
min (the universal sketch merge operator, setsketch.h:432-448), with
min-count bookkeeping. The CSetSketch path uses the threshold-filtered
kernel per item (ops/sketch_kernels.css_sketch).

Deviations from the reference, by design:
* k-mer downsampling (--downsample) is a stateless per-k-mer hash test
  (keep iff WangHash(h ^ SALT) < frac * 2^64) rather than a shared-state
  RNG stream (d2.h:176-179) — order-independent, SPMD-safe, same expected
  fraction.
* --count-threshold runs an exact distinct-count pass (device sort) and
  sketches surviving k-mers once, which reproduces the CountFiltered*
  final state without per-update hash-map "potentials" (oph.h:188-205).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import hashing as H
from ..config import Dashing2Options
from ..enums import Alphabet, KmerSketchResultType, SketchSpace
from ..io import fastx
from ..ops import hashes as DH
from ..ops import kmers as K
from ..ops import sketch_kernels as SK
from ..result import SketchingResult

DOWNSAMPLE_SALT = 0x6F22B7A19E5F3D71
U64MAX = SK.U64MAX


# ----------------------------------------------------------------------
# batched hashed-kmer production
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "k", "w", "canon", "alphabet", "entmin", "xormask", "seed_is_zero",
    "downsample_threshold", "use_filterset", "chunk_len"))
def _hash_chunk_batch(chunks: jnp.ndarray, filterset: jnp.ndarray, *,
                      k: int, w: int, canon: bool, alphabet: Alphabet,
                      entmin: bool, xormask: int, seed_is_zero: bool,
                      downsample_threshold: int, use_filterset: bool,
                      chunk_len: int):
    hashed, valid = K.hashed_kmers(
        chunks, k, w=w, canonicalize=canon, alphabet=alphabet,
        xormask=xormask, seed_is_zero=seed_is_zero, entropy_min=entmin)
    # ownership mask: drop halo positions so chunk boundaries emit each
    # k-mer exactly once
    lo, hi = K.owned_kmer_range(k, w, chunk_len)
    pos = jnp.arange(hashed.shape[-1])
    valid = valid & (pos >= lo) & (pos < hi)
    if downsample_threshold < (1 << 64) - 1:
        keep = DH.wanghash(hashed ^ jnp.uint64(DOWNSAMPLE_SALT)) < \
            jnp.uint64(downsample_threshold)
        valid = valid & keep
    if use_filterset:
        # exclude k-mers present in the (sorted) filterset
        pos = jnp.searchsorted(filterset, hashed)
        pos = jnp.minimum(pos, filterset.shape[0] - 1)
        valid = valid & (filterset[pos] != hashed)
    return hashed, valid


def _hash_kwargs(opts: Dashing2Options, chunk_len: int) -> dict:
    return dict(
        k=opts.k, w=opts.w, canon=opts.canonicalize, alphabet=opts.alphabet,
        entmin=opts.entmin, xormask=opts.xormask,
        seed_is_zero=False,
        downsample_threshold=opts.downsample_threshold(),
        chunk_len=chunk_len,
    )


@dataclasses.dataclass
class _Item:
    """One sketchable item: a file group or a single sequence."""
    name: str
    codes: List[np.ndarray]


def _load_items(opts: Dashing2Options, groups: Sequence[str]) -> List[_Item]:
    items: List[_Item] = []
    for group in groups:
        if opts.parse_by_seq:
            for path in group.split():
                for name, seq in fastx.read_fastx(path):
                    items.append(_Item(name=name, codes=[
                        K.encode_ascii(seq, opts.alphabet)]))
        else:
            codes = []
            for path in group.split():
                for _, seq in fastx.read_fastx(path):
                    codes.append(K.encode_ascii(seq, opts.alphabet))
            items.append(_Item(name=group, codes=codes))
    return items


def _iter_chunk_batches(opts: Dashing2Options, items: Sequence[_Item],
                        chunk_len: int, rows_per_batch: int
                        ) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    """Yield (chunks (R, L) u8, item_ids (R,) i32) fixed-shape batches."""
    halo_w = opts.w if opts.w > opts.k else 0
    h_l, h_r = K.chunk_halos(opts.k, halo_w)
    width = chunk_len + h_l + h_r
    buf: List[np.ndarray] = []
    ids: List[int] = []

    def flush():
        nonlocal buf, ids
        if not buf:
            return None
        rows = np.stack(buf)
        rid = np.asarray(ids, dtype=np.int32)
        pad = rows_per_batch - rows.shape[0]
        if pad > 0:
            rows = np.concatenate(
                [rows, np.full((pad, width), K.INVALID, np.uint8)])
            rid = np.concatenate([rid, np.full(pad, -1, np.int32)])
        buf, ids = [], []
        return rows, rid

    for idx, item in enumerate(items):
        chunks, _ = K.chunk_codes(item.codes, opts.k, chunk_len=chunk_len,
                                  w=halo_w)
        for row in chunks:
            buf.append(row)
            ids.append(idx)
            if len(buf) == rows_per_batch:
                yield flush()
    tail = flush()
    if tail is not None:
        yield tail


def _merge_oph(regs_a, counts_a, regs_b, counts_b):
    """Merge two OPH partials: min registers; counts follow the winning
    side and add when both sides hold the same min (streaming semantics,
    oph.h:206-210)."""
    take_b = regs_b < regs_a
    tie = regs_b == regs_a
    regs = np.where(take_b, regs_b, regs_a)
    counts = np.where(tie, counts_a + counts_b,
                      np.where(take_b, counts_b, counts_a))
    return regs, counts


# ----------------------------------------------------------------------
# main entry
# ----------------------------------------------------------------------

def sketch_fastx(opts: Dashing2Options, groups: Sequence[str],
                 chunk_len: int = 1 << 15, rows_per_batch: int = 64
                 ) -> SketchingResult:
    """Sketch FASTA/FASTQ inputs. `groups`: one item per entry; an entry
    may contain several space-separated paths sketched jointly
    (d2.h:52-71 for_each_substr semantics)."""
    items = _load_items(opts, groups)
    res = SketchingResult(names=[it.name for it in items])
    n = len(items)
    m = opts.sketchsize
    kres = opts.kmer_result

    fs = _filterset_array(opts)
    use_fs = fs is not None
    fs_dev = jnp.asarray(fs if use_fs else np.zeros(1, np.uint64))
    hkw = _hash_kwargs(opts, chunk_len)

    needs_stream = (kres in (KmerSketchResultType.FULL_MMER_SET,
                             KmerSketchResultType.FULL_MMER_COUNTDICT,
                             KmerSketchResultType.FULL_MMER_SEQUENCE)
                    or kres == KmerSketchResultType.FULL_SETSKETCH
                    or opts.count_threshold > 1
                    or opts.sspace in (SketchSpace.SPACE_MULTISET,
                                       SketchSpace.SPACE_PSET))

    if kres == KmerSketchResultType.ONE_PERM and not needs_stream:
        regs = np.full((n, m), U64MAX, dtype=np.uint64)
        counts = np.zeros((n, m), dtype=np.uint32)
        for chunks, ids in _iter_chunk_batches(opts, items, chunk_len,
                                               rows_per_batch):
            hashed, valid = _hash_chunk_batch(
                jnp.asarray(chunks), fs_dev, use_filterset=use_fs, **hkw)
            nk = hashed.shape[1]
            flat_ids = jnp.repeat(jnp.asarray(np.maximum(ids, 0)), nk)
            flat_valid = valid.reshape(-1) & jnp.repeat(
                jnp.asarray(ids >= 0), nk)
            r, c = SK.oph_sketch_segments(
                hashed.reshape(-1), flat_valid, flat_ids,
                nseqs=n, m=m, seed=H.OPH_DEFAULT_SEED)
            regs, counts = _merge_oph(regs, counts, np.asarray(r),
                                      np.asarray(c))
        res.cardinalities = SK.oph_cardinality(regs)
        res.signatures = SK.oph_to_sigs(regs)
        if opts.save_kmers:
            ids64 = H.oph_hash_inverse(regs)
            ids64[regs == U64MAX] = 0
            res.kmers = ids64
        if opts.save_kmercounts:
            res.kmercounts = counts.astype(np.float32)
        return res

    # streaming paths: gather each item's hashed k-mers on host first
    per_item_hashes: List[np.ndarray] = [None] * n  # type: ignore
    for chunks, ids in _iter_chunk_batches(opts, items, chunk_len,
                                           rows_per_batch):
        hashed, valid = _hash_chunk_batch(
            jnp.asarray(chunks), fs_dev, use_filterset=use_fs, **hkw)
        hashed = np.asarray(hashed)
        valid = np.asarray(valid)
        for row, item_id in enumerate(ids):
            if item_id < 0:
                continue
            hv = hashed[row][valid[row]]
            prev = per_item_hashes[item_id]
            per_item_hashes[item_id] = hv if prev is None else \
                np.concatenate([prev, hv])
    for i in range(n):
        if per_item_hashes[i] is None:
            per_item_hashes[i] = np.zeros(0, dtype=np.uint64)

    if kres == KmerSketchResultType.FULL_MMER_SEQUENCE:
        seqs = []
        for hv in per_item_hashes:
            if opts.homopolymer_compress_minimizers and len(hv):
                keep = np.concatenate([[True], hv[1:] != hv[:-1]])
                hv = hv[keep]
            seqs.append(hv)
        res.mmer_sequences = seqs
        res.cardinalities = np.array([len(s) for s in seqs], dtype=np.float64)
        return res

    # distinct counting (exact sets / count dicts / count threshold / weighted)
    uniq_list: List[np.ndarray] = []
    cnt_list: List[np.ndarray] = []
    for hv in per_item_hashes:
        u, c = np.unique(hv, return_counts=True)
        if opts.count_threshold > 1:
            keep = c >= opts.count_threshold
            u, c = u[keep], c[keep]
        uniq_list.append(u.astype(np.uint64))
        cnt_list.append(c.astype(np.float64))

    if kres == KmerSketchResultType.FULL_MMER_SET:
        res.kmer_sets = uniq_list
        res.cardinalities = np.array([len(u) for u in uniq_list], np.float64)
        return res
    if kres == KmerSketchResultType.FULL_MMER_COUNTDICT:
        res.kmer_sets = uniq_list
        res.kmer_set_counts = cnt_list
        res.cardinalities = np.array([c.sum() for c in cnt_list], np.float64)
        return res

    if opts.sspace in (SketchSpace.SPACE_MULTISET, SketchSpace.SPACE_PSET):
        from .weighted import bagminhash_many, probminhash_many
        fn = bagminhash_many if opts.sspace == SketchSpace.SPACE_MULTISET \
            else probminhash_many
        sigs, cards = fn(uniq_list, cnt_list, m)
        res.signatures = sigs
        res.cardinalities = cards
        return res

    # FULL_SETSKETCH (or count-thresholded variants)
    sigs = np.empty((n, m), dtype=np.float64)
    cards = np.empty(n, dtype=np.float64)
    for i, u in enumerate(uniq_list):
        regs = SK.css_sketch(u, np.ones(len(u), bool), m) if len(u) else \
            np.full(m, np.inf)
        sigs[i] = np.where(np.isfinite(regs), regs, 0.0)
        cards[i] = SK.css_cardinality(regs) if len(u) else 0.0
    res.signatures = sigs
    res.cardinalities = cards
    return res


def _filterset_array(opts: Dashing2Options) -> Optional[np.ndarray]:
    """Build the sorted-hash exclusion set from --filterset
    (d2.cpp:45-98: FASTA of k-mers to skip, hashed like the data)."""
    if not opts.filterset_path:
        return None
    sub = dataclasses.replace(opts, filterset_path="",
                              kmer_downsample_frac=1.0)
    hashes: List[np.ndarray] = []
    for _, seq in fastx.read_fastx(opts.filterset_path):
        codes = K.encode_ascii(seq, opts.alphabet)
        chunks, _ = K.chunk_codes([codes], sub.k, chunk_len=1 << 15,
                                  w=sub.w if sub.w > sub.k else 0)
        h, v = _hash_chunk_batch(jnp.asarray(chunks),
                                 jnp.zeros(1, jnp.uint64),
                                 use_filterset=False,
                                 **_hash_kwargs(sub, 1 << 15))
        hashes.append(np.asarray(h)[np.asarray(v)])
    if not hashes:
        return None
    return np.unique(np.concatenate(hashes))
