"""Distance-matrix emitters: PHYLIP / TSV human text and binary f32.

Reference layouts (src/emitrect.cpp):
* human PHYLIP (:151): first line = N; rows: name (space-padded to >= 9
  chars) then upper-triangle values "\t{v}".
* human symmetric (:136-148,353): "#Dashing2 <label> Output",
  "#Dashing2Options: ...", "#Sources\t..." header; rows: padded name,
  (i+1) "\t-" placeholders, then upper-triangle values.
* human asymmetric/panel: same header, full rows.
* binary (:370-399): raw little-endian f32 — condensed upper triangle for
  symmetric/PHYLIP, full row-major N x N for asymmetric, nf x nq for panel.
"""

from __future__ import annotations

import sys
from typing import IO, Iterator, Tuple

import numpy as np

from ..config import Dashing2DistOptions
from ..enums import OutputFormat, OutputKind
from ..result import SketchingResult


def _fmt(x: np.float32) -> str:
    """Shortest round-trip float32 text, replicating std::to_chars'
    format selection (the native fast path in emit_fmt.cpp) so text
    output is byte-identical with or without the C++ toolchain:
    to_chars picks fixed or scientific by whichever string is SHORTER,
    fixed winning ties — not by an exponent-range rule."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        return str(v)
    if v == 0:
        return "-0" if np.signbit(np.float32(x)) else "0"
    pos = np.format_float_positional(np.float32(v), unique=True, trim="-")
    sci = np.format_float_scientific(np.float32(v), unique=True, trim="-")
    return pos if len(pos) <= len(sci) else sci


_EMIT_LIB = "unset"


def _fmt_row_native(vals: np.ndarray) -> bytes | None:
    """Format "\\t<v>" per value via the native std::to_chars formatter
    (~50x the Python per-value path); None when unavailable."""
    global _EMIT_LIB
    if _EMIT_LIB == "unset":
        from ..native import load_emit_lib
        _EMIT_LIB = load_emit_lib()
    if _EMIT_LIB is None:
        return None
    import ctypes
    v = np.ascontiguousarray(vals, dtype=np.float32)
    cap = max(24 * (len(v) + 1), 64)
    buf = ctypes.create_string_buffer(cap)
    n = _EMIT_LIB.fmt_f32_rows(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        b"\t", buf, cap)
    if n > cap:  # shouldn't happen with 24B/value headroom
        buf = ctypes.create_string_buffer(n)
        n = _EMIT_LIB.fmt_f32_rows(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
            b"\t", buf, n)
    return buf.raw[:n]


def _fmt_row(vals: np.ndarray) -> str:
    out = _fmt_row_native(vals)
    if out is not None:
        return out.decode()
    return "".join("\t" + _fmt(v) for v in vals)


def _open_out(path: str) -> IO:
    if not path or path in ("-", "/dev/stdout"):
        return sys.stdout.buffer
    return open(path, "wb")


def emit_rectangular(opts: Dashing2DistOptions, result: SketchingResult,
                     blocks: Iterator[Tuple[int, np.ndarray]]) -> None:
    """Stream measure-matrix blocks to the configured output."""
    names = result.names
    n = result.n if names else len(result.cardinalities)
    nq = result.nqueries()
    kind = opts.output_kind
    f = _open_out(opts.outfile_path)
    close = f is not sys.stdout.buffer
    # overlap block computation with formatting/writes (the reference's
    # async emit thread, emitrect.cpp:159-197 / SURVEY P8)
    from .prefetch import prefetch
    blocks = prefetch(blocks, depth=2)
    try:
        if opts.output_format == OutputFormat.HUMAN_READABLE:
            if kind == OutputKind.PHYLIP:
                f.write(f"{n}\n".encode())
            else:
                label = ("Asymmetric pairwise"
                         if kind == OutputKind.ASYMMETRIC_ALL_PAIRS
                         else "Panel (Query/Refernce)"
                         if kind == OutputKind.PANEL
                         else "Symmetric pairwise")
                f.write(f"#Dashing2 {label} Output\n".encode())
                f.write(f"#Dashing2Options: {_opts_str(opts)}\n".encode())
                f.write(b"#Sources")
                # emitrect.cpp:143 — names when present, else nqueries()
                # E{i} placeholders (empty-names loads list only queries)
                end = len(names) if names else nq
                for i in range(end):
                    nm = names[i] if i < len(names) and names[i] else f"E{i}"
                    f.write(("\t" + nm).encode())
                f.write(b"\n")
            from ..timing import span
            for start, mat in blocks:
                with span("emit/format"):
                    out = []
                    for bi in range(mat.shape[0]):
                        i = start + bi
                        nm = (names[i] if i < len(names) and names[i]
                              else f"E{i}")
                        if len(nm) < 9:
                            nm = nm + " " * (9 - len(nm))
                        row = [nm]
                        if kind in (OutputKind.PANEL,
                                    OutputKind.ASYMMETRIC_ALL_PAIRS):
                            vals = mat[bi]
                        else:
                            if kind == OutputKind.SYMMETRIC_ALL_PAIRS:
                                row.append("\t-" * (i + 1))
                            vals = mat[bi, i + 1:]
                        row.append(_fmt_row(vals))
                        row.append("\n")
                        out.append("".join(row))
                with span("emit/write"):
                    f.write("".join(out).encode())
        else:
            from ..timing import span
            for start, mat in blocks:
                with span("emit/write"):
                    if kind in (OutputKind.SYMMETRIC_ALL_PAIRS,
                                OutputKind.PHYLIP):
                        for bi in range(mat.shape[0]):
                            i = start + bi
                            f.write(np.ascontiguousarray(
                                mat[bi, i + 1:],
                                dtype=np.float32).tobytes())
                    else:
                        f.write(np.ascontiguousarray(
                            mat, dtype=np.float32).tobytes())
    finally:
        f.flush()
        if close:
            f.close()


def _opts_str(opts: Dashing2DistOptions) -> str:
    return (f"k={opts.k};w={opts.w};space={opts.sspace.name};"
            f"result={opts.kmer_result.name};sketchsize={opts.sketchsize};"
            f"measure={opts.measure.name}")


def emit_neighbors_human(f, lists, names) -> None:
    """emitnn.cpp:19-28: name then tab-separated neighbor:distance."""
    f.write(b"#Collection\tNeighbor lists -- name:distance, "
            b"separated by tabs\n")
    for i, lst in enumerate(lists):
        parts = [names[i]]
        for dist, rid in lst:
            parts.append(f"{names[rid]}:{dist:0.8g}")
        f.write(("\t".join(parts) + "\n").encode())
