"""SketchingResult: the container flowing from sketching to comparison.

Mirror of the reference struct (/root/reference/src/fastxsketch.h:23-58)
with dense numpy members instead of mmap vectors.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class SketchingResult:
    names: List[str] = dataclasses.field(default_factory=list)
    destination_files: List[str] = dataclasses.field(default_factory=list)
    kmerfiles: List[str] = dataclasses.field(default_factory=list)
    kmercountfiles: List[str] = dataclasses.field(default_factory=list)
    nperfile: List[int] = dataclasses.field(default_factory=list)
    cardinalities: Optional[np.ndarray] = None        # (N,) f64
    signatures: Optional[np.ndarray] = None           # (N, m) f64
    kmers: Optional[np.ndarray] = None                # (N, m) u64
    kmercounts: Optional[np.ndarray] = None           # (N, m) f32
    # exact modes: ragged per-item sorted hash sets / counts
    kmer_sets: Optional[List[np.ndarray]] = None      # sorted u64 each
    kmer_set_counts: Optional[List[np.ndarray]] = None
    # minimizer sequences (FULL_MMER_SEQUENCE)
    mmer_sequences: Optional[List[np.ndarray]] = None
    # raw sequences (edit-distance space)
    sequences: Optional[List[bytes]] = None
    nq: int = 0  # number of query items (PANEL); stored at the tail

    @property
    def n(self) -> int:
        return len(self.names)

    def nqueries(self) -> int:
        return self.nq
