"""Minimal BigWig reader (replaces the libBigWig C dependency).

Implements just what bwsketch needs (reference call sites:
src/bwsketch.cpp:61-119): the chromosome list and iteration over all data
intervals (start, end, value) per chromosome. Parses the kent BigWig
format directly: header (magic 0x888FFC26), chrom B+ tree, and the main
data section's R-tree leaves -> zlib-compressed blocks of
bedGraph/varStep/fixedStep items.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import Dict, Iterator, List, Tuple

import numpy as np

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0


@dataclass
class BigWigFile:
    chroms: Dict[int, str]
    chrom_sizes: Dict[str, int]
    intervals: Dict[str, List[Tuple[int, int, float]]]


def read_bigwig(path: str) -> BigWigFile:
    with open(path, "rb") as f:
        data = f.read()
    magic = struct.unpack_from("<I", data, 0)[0]
    if magic == BIGWIG_MAGIC:
        bo = "<"
    elif struct.unpack_from(">I", data, 0)[0] == BIGWIG_MAGIC:
        bo = ">"
    else:
        raise ValueError(f"{path}: not a BigWig file")
    (magic, version, zoom_levels, chrom_tree_off, full_data_off,
     full_index_off, field_count, defined_field_count, auto_sql_off,
     total_summary_off, uncompress_buf_size, _reserved) = struct.unpack_from(
        bo + "IHHQQQHHQQIQ", data, 0)
    chroms, sizes = _read_chrom_tree(data, chrom_tree_off, bo)
    blocks = _rtree_blocks(data, full_index_off, bo)
    intervals: Dict[str, List[Tuple[int, int, float]]] = {
        name: [] for name in sizes}
    for off, size in blocks:
        raw = data[off:off + size]
        if uncompress_buf_size > 0:
            raw = zlib.decompress(raw)
        _parse_block(raw, bo, chroms, intervals)
    return BigWigFile(chroms=chroms, chrom_sizes=sizes, intervals=intervals)


def _read_chrom_tree(data: bytes, off: int, bo: str):
    magic, block_size, key_size, val_size, item_count, _res = \
        struct.unpack_from(bo + "IIIIQQ", data, off)
    if magic != CHROM_TREE_MAGIC:
        raise ValueError("bad chrom B+ tree magic")
    chroms: Dict[int, str] = {}
    sizes: Dict[str, int] = {}

    def node(noff: int):
        isleaf, _pad, count = struct.unpack_from(bo + "BBH", data, noff)
        p = noff + 4
        if isleaf:
            for _ in range(count):
                key = data[p:p + key_size].split(b"\0")[0].decode()
                cid, csize = struct.unpack_from(bo + "II", data,
                                                p + key_size)
                chroms[cid] = key
                sizes[key] = csize
                p += key_size + val_size
        else:
            for _ in range(count):
                child = struct.unpack_from(bo + "Q", data,
                                           p + key_size)[0]
                node(child)
                p += key_size + 8
    node(off + 32)
    return chroms, sizes


def _rtree_blocks(data: bytes, off: int, bo: str
                  ) -> List[Tuple[int, int]]:
    magic = struct.unpack_from(bo + "I", data, off)[0]
    if magic != RTREE_MAGIC:
        raise ValueError("bad R tree magic")
    blocks: List[Tuple[int, int]] = []

    def node(noff: int):
        isleaf, _pad, count = struct.unpack_from(bo + "BBH", data, noff)
        p = noff + 4
        if isleaf:
            for _ in range(count):
                (_sc, _ss, _ec, _ee, boff, bsize) = struct.unpack_from(
                    bo + "IIIIQQ", data, p)
                blocks.append((boff, bsize))
                p += 32
        else:
            for _ in range(count):
                (_sc, _ss, _ec, _ee, child) = struct.unpack_from(
                    bo + "IIIIQ", data, p)
                node(child)
                p += 24
    node(off + 48)
    return blocks


def _parse_block(raw: bytes, bo: str, chroms: Dict[int, str],
                 intervals: Dict[str, List[Tuple[int, int, float]]]):
    (chrom_id, start, end, step, span, btype, _res, count) = \
        struct.unpack_from(bo + "IIIIIBBH", raw, 0)
    name = chroms.get(chrom_id)
    if name is None:
        return
    out = intervals[name]
    p = 24
    if btype == 1:      # bedGraph
        for _ in range(count):
            s, e, v = struct.unpack_from(bo + "IIf", raw, p)
            out.append((s, e, v))
            p += 12
    elif btype == 2:    # variable step
        for _ in range(count):
            s, v = struct.unpack_from(bo + "If", raw, p)
            out.append((s, s + span, v))
            p += 8
    elif btype == 3:    # fixed step
        s = start
        for _ in range(count):
            v = struct.unpack_from(bo + "f", raw, p)[0]
            out.append((s, s + span, v))
            s += step
            p += 4
