"""Round-5 VERDICT item 5 measurement: sketch a multi-GB synthetic
BigWig under a bounded-RSS envelope, reporting Mintervals/s.

    python experiments/r5_bigwig_stream.py [target_gb]

Generates (once, cached in /tmp) a bedGraph-typed BigWig of ~target_gb
compressed bytes across 8 chromosomes, then runs the production
sketch_bigwig (SET space, one-perm) and prints wall, max RSS, and
interval throughput. The pre-round-5 reader loaded the whole file and
built per-interval Python tuple lists — ~100 bytes/interval of
transient objects (a 2 GB file holds ~300M intervals = way past RAM);
the streaming reader decodes blocks straight to numpy and feeds slabs.
"""

import os
import resource
import struct
import sys
import time
import zlib

import numpy as np

BLOCK_IVS = 8192   # intervals per data block (itemsPerSlot-ish)


def gen_bigwig(path: str, target_bytes: int, nchrom: int = 8,
               seed: int = 0) -> int:
    """Write a valid multi-chrom bedGraph BigWig of ~target_bytes
    compressed size; returns total interval count."""
    rng = np.random.default_rng(seed)
    names = [f"chr{i + 1}" for i in range(nchrom)]
    key_size = max(len(n) for n in names)
    chrom_size = 1 << 30
    chrom_tree = struct.pack("<IIIIQQ", 0x78CA8C91, nchrom, key_size,
                             8, nchrom, 0)
    chrom_tree += struct.pack("<BBH", 1, 0, nchrom)
    for cid, n in enumerate(names):
        chrom_tree += n.encode().ljust(key_size, b"\0") + \
            struct.pack("<II", cid, chrom_size)
    data_off = 64 + len(chrom_tree)
    rec_dt = np.dtype([("s", "<u4"), ("e", "<u4"), ("v", "<f4")])
    leaf_meta = []
    total_ivs = 0
    with open(path, "wb") as f:
        f.seek(data_off)
        f.write(struct.pack("<Q", 0))      # section count placeholder
        pos = data_off + 8
        cid = 0
        start_base = np.zeros(nchrom, np.int64)
        while pos < data_off + target_bytes:
            gaps = rng.integers(1, 30, BLOCK_IVS)
            lens = rng.integers(1, 40, BLOCK_IVS)
            starts = start_base[cid] + np.cumsum(gaps)
            ends = starts + lens
            start_base[cid] = int(ends[-1])
            rec = np.empty(BLOCK_IVS, rec_dt)
            rec["s"] = starts
            rec["e"] = ends
            rec["v"] = rng.random(BLOCK_IVS, np.float32) + 0.1
            block = struct.pack("<IIIIIBBH", cid, int(starts[0]),
                                int(ends[-1]), 0, 0, 1, 0, BLOCK_IVS) \
                + rec.tobytes()
            comp = zlib.compress(block, 1)
            leaf_meta.append((cid, int(starts[0]), int(ends[-1]),
                              pos, len(comp)))
            f.write(comp)
            pos += len(comp)
            total_ivs += BLOCK_IVS
            cid = (cid + 1) % nchrom
        index_off = pos
        # R-tree: flat leaves under one root when they fit, else a
        # two-level tree of <=65535-entry leaf nodes
        per = 65535
        groups = [leaf_meta[i:i + per]
                  for i in range(0, len(leaf_meta), per)]
        rtree = struct.pack("<IIQIIIIQIi", 0x2468ACE0, 256,
                            len(leaf_meta), 0, leaf_meta[0][1],
                            nchrom - 1, leaf_meta[-1][2], index_off,
                            512, 0)
        if len(groups) == 1:
            rtree += struct.pack("<BBH", 1, 0, len(leaf_meta))
            for cid_, s0, e0, off, size in leaf_meta:
                rtree += struct.pack("<IIIIQQ", cid_, s0, cid_, e0,
                                     off, size)
        else:
            # root internal node -> one leaf node per group
            node_off = index_off + 48 + 4 + 24 * len(groups)
            rtree += struct.pack("<BBH", 0, 0, len(groups))
            offs = []
            for g in groups:
                offs.append(node_off)
                node_off += 4 + 32 * len(g)
            for g, goff in zip(groups, offs):
                rtree += struct.pack("<IIIIQ", g[0][0], g[0][1],
                                     g[-1][0], g[-1][2], goff)
            for g in groups:
                rtree += struct.pack("<BBH", 1, 0, len(g))
                for cid_, s0, e0, off, size in g:
                    rtree += struct.pack("<IIIIQQ", cid_, s0, cid_, e0,
                                         off, size)
        f.write(rtree)
        f.seek(0)
        f.write(struct.pack("<IHHQQQHHQQIQ", 0x888FFC26, 4, 0, 64,
                            data_off, index_off, 0, 0, 0, 0, 1 << 15,
                            0))
        f.write(chrom_tree)
        f.seek(data_off)
        f.write(struct.pack("<Q", len(leaf_meta)))
    return total_ivs


def main():
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    path = f"/tmp/r5_big_{target_gb:g}gb.bw"
    meta = path + ".nivs"
    if not (os.path.exists(path) and os.path.exists(meta)):
        t0 = time.perf_counter()
        nivs = gen_bigwig(path, int(target_gb * (1 << 30)))
        with open(meta, "w") as f:
            f.write(str(nivs))
        print(f"generated {os.path.getsize(path) / 1e9:.2f} GB, "
              f"{nivs / 1e6:.1f}M intervals in "
              f"{time.perf_counter() - t0:.1f} s")
    nivs = int(open(meta).read())
    import dashing2_tpu  # noqa: F401
    from dashing2_tpu.config import Dashing2Options
    from dashing2_tpu.enums import DataType
    from dashing2_tpu.sketch.intervals import sketch_bigwig
    opts = Dashing2Options(sketchsize=1024, dtype=DataType.BIGWIG,
                           sspace=0, kmer_result=0)   # SET, ONE_PERM
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.perf_counter()
    res = sketch_bigwig(opts, [path])
    dt = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"sketch: {dt:.1f} s, {nivs / dt / 1e6:.2f} Mintervals/s, "
          f"file {os.path.getsize(path) / 1e9:.2f} GB, "
          f"maxRSS {rss1:.2f} GB (start {rss0:.2f}), "
          f"card {res.cardinalities[0]:.3g}")


if __name__ == "__main__":
    main()
