"""printmin subcommand: decode a minimizer-sequence file to text.

Reference: src/printminmain.cpp:7-94 — reads the --seq output (stacked
minimizer sequences), inverts the maskfn scrambler, and prints per item
one line of tab-separated decoded k-mer strings (DNA) or hex values.
"""

from __future__ import annotations

import sys

import numpy as np

from .. import hashing as H
from ..enums import Alphabet
from . import formats


def decode_kmer_dna(code: int, k: int) -> str:
    return "".join("ACGT"[(code >> (2 * (k - 1 - i))) & 3]
                   for i in range(k))


def printmin_main(path: str, out=None) -> int:
    out = out or sys.stdout
    data = formats.read_mmer_sequences(path)
    k, w = data["k"], data["w"]
    exact_dna = data["alphabet"] in (Alphabet.DNA, Alphabet.DNAC) and k <= 31
    for seq in data["seqs"]:
        vals = H.invmaskfn(np.asarray(seq, dtype=np.uint64))
        if exact_dna:
            out.write("\t".join(decode_kmer_dna(int(v), k) for v in vals))
        else:
            out.write("\t".join("%016x" % int(v) for v in vals))
        out.write("\n")
    return 0
