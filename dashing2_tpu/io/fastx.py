"""FASTA/FASTQ reading (kseq-equivalent host ingest).

Python implementation with transparent gzip/xz/bz2 decompression
(reference: kseq via KSeqHolder d2.h:273-305, xopen enums.cpp:89-106).
A C++ accelerated reader can be slotted in behind the same generator API.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import os
from typing import Iterator, List, Tuple


def xopen(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    if path.endswith(".xz"):
        return lzma.open(path, "rb")
    if path.endswith(".bz2"):
        return bz2.open(path, "rb")
    return open(path, "rb")


def read_fastx(path: str) -> Iterator[Tuple[str, bytes]]:
    """Yield (name, sequence) from FASTA or FASTQ (auto-detected)."""
    with xopen(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == b">":
            name = None
            chunks: List[bytes] = []
            for raw in _lines(f, b">"):
                if raw.startswith(b">"):
                    if name is not None:
                        yield name, b"".join(chunks)
                    name = raw[1:].split()[0].decode() if len(raw) > 1 else ""
                    chunks = []
                else:
                    chunks.append(raw.strip())
            if name is not None:
                yield name, b"".join(chunks)
        elif first == b"@":
            # FASTQ: 4-line records
            name_line = b"@" + f.readline()
            while name_line and name_line.strip():
                name = name_line[1:].split()[0].decode()
                seq = f.readline().strip()
                f.readline()  # +
                f.readline()  # qual
                yield name, seq
                name_line = f.readline()
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def _lines(f, first_prefix: bytes) -> Iterator[bytes]:
    yield first_prefix + f.readline()
    for line in f:
        yield line


def read_encoded(path: str, alphabet) -> Iterator[Tuple[str, "np.ndarray"]]:
    """Yield (name, alphabet-encoded uint8 codes) per record.

    Uses the native C++ reader (zlib-aware, LUT encoding in C) when the
    toolchain is available; transparently falls back to the Python parser.
    xz/bz2 inputs always take the Python path.
    """
    import ctypes

    import numpy as np

    from ..native import load_fastx_lib
    from ..ops.kmers import alphabet_lut

    lib = None
    if not path.endswith((".xz", ".bz2")):
        lib = load_fastx_lib()
    if lib is None:
        for name, seq in read_fastx(path):
            yield name, alphabet_lut(alphabet)[
                np.frombuffer(seq, dtype=np.uint8)]
        return
    lut = alphabet_lut(alphabet).tobytes()
    h = lib.fxr_open(path.encode(), lut)
    if not h:
        raise OSError(f"failed to open {path}")
    try:
        name_p = ctypes.c_char_p()
        seq_p = ctypes.POINTER(ctypes.c_ubyte)()
        while True:
            n = lib.fxr_next(h, ctypes.byref(name_p), ctypes.byref(seq_p))
            if n < 0:
                if n == -2:
                    raise ValueError(f"{path}: malformed FASTA/FASTQ")
                break
            codes = np.ctypeslib.as_array(seq_p, shape=(n,)).copy()
            yield (name_p.value or b"").decode(), codes
    finally:
        lib.fxr_close(h)


def read_sequences(path: str) -> Tuple[List[str], List[bytes]]:
    names: List[str] = []
    seqs: List[bytes] = []
    for n, s in read_fastx(path):
        names.append(n)
        seqs.append(s)
    return names, seqs


def nbytes_from_line(line: str) -> int:
    """Total size of the (space-separated) files on one input line
    (sketch_core.cpp:175-184 LPT scheduling key)."""
    total = 0
    for p in line.split():
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return total
