"""OrderMinHash: LSH sketches for edit distance over sequences.

Reference role: sketch::omh::OMHasher<RegT> used when sspace ==
SPACE_EDIT_DISTANCE (d2.h:249, fastxsketchbyseq.cpp:301-322). Re-derived
from Marcais, DeBlasio, Pandey, Kingsford (2019), "Locality-sensitive
hashing for the edit distance": each of the m registers selects the l
(default 2) k-mer occurrences with the smallest register-keyed hashes of
(k-mer, occurrence-index), then hashes them *in sequence order* — the
order-sensitivity is what makes collisions track edit distance.

Device shape: occurrence ranks via lexsort ranks (vectorized), per
register-chunk (R, n) keyed hashes + top_k, signature fold on the l
winners gathered in position order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashes as DH
from ..ops import kmers as K
from ..enums import Alphabet

_G1 = 0x9E3779B97F4A7C15
_G2 = 0xC2B2AE3D27D4EB4F
_SALT = 0x165667B19E3779F9


def _occurrence_ranks(kmers: np.ndarray) -> np.ndarray:
    """occ[i] = number of earlier positions with the same k-mer value."""
    order = np.argsort(kmers, kind="stable")
    sk = kmers[order]
    heads = np.concatenate([[True], sk[1:] != sk[:-1]])
    group_start = np.maximum.accumulate(
        np.where(heads, np.arange(len(sk)), 0))
    ranks_sorted = np.arange(len(sk)) - group_start
    occ = np.empty(len(sk), dtype=np.int64)
    occ[order] = ranks_sorted
    return occ


@functools.partial(jax.jit, static_argnames=("m", "ell"))
def _omh_registers(kmers: jnp.ndarray, occ: jnp.ndarray, valid: jnp.ndarray,
                   *, m: int, ell: int) -> jnp.ndarray:
    """(n,) k-mers + occurrence ranks -> (m,) u64 signatures."""
    n = kmers.shape[0]
    r = jnp.arange(m, dtype=jnp.uint64)
    keyed = kmers ^ (occ.astype(jnp.uint64) * jnp.uint64(_G1))
    # (m, n) register-keyed hashes
    keys = DH.wanghash(keyed[None, :] ^ (r[:, None] * jnp.uint64(_G2)
                                         + jnp.uint64(_SALT)))
    maxv = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    keys = jnp.where(valid[None, :], keys, maxv)
    # l smallest per register -> positions, then sequence order
    kf = keys.astype(jnp.float64)  # monotone enough for selection ties
    _, idx = jax.lax.top_k(-kf, ell)          # (m, ell) positions
    idx_sorted = jnp.sort(idx, axis=1)         # sequence order
    sel = kmers[idx_sorted]                    # (m, ell)
    sig = jnp.full((m,), _SALT, dtype=jnp.uint64)
    for e in range(ell):
        sig = DH.wanghash(sig ^ sel[:, e]
                          ^ (jnp.uint64(e + 1) * jnp.uint64(_G1)))
    return sig


def omh_sketch(codes: np.ndarray, k: int, m: int, ell: int = 2
               ) -> np.ndarray:
    """OMH signature vector (m,) u64 for one sequence's codes (no
    canonicalization — edit distance is strand-specific)."""
    if len(codes) < k:
        return np.zeros(m, dtype=np.uint64)
    km, valid = K.dna_kmer_codes(jnp.asarray(codes)[None, :], k, False)
    km = np.asarray(km)[0]
    valid_np = np.asarray(valid)[0]
    occ = _occurrence_ranks(np.where(valid_np, km, 0))
    return np.asarray(_omh_registers(jnp.asarray(km), jnp.asarray(occ),
                                     jnp.asarray(valid_np), m=m, ell=ell))
