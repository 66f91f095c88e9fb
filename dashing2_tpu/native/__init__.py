"""Native (C++) host components, built on demand with the system toolchain."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

_lock = threading.Lock()
_libs: dict = {}


def _build_dir() -> str:
    d = os.environ.get("DASHING2_TPU_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "dashing2_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _cpu_fingerprint() -> str:
    """Short hash of the host CPU feature flags (empty if unreadable)."""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith("flags"):
                    return hashlib.sha1(ln.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "noflags"


def _load_lib(name: str, src_file: str, link: list,
              cflags: tuple = ()) -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed) and load a native component; None
    when the toolchain is unavailable (callers fall back to Python).
    `cflags` are attempted first and dropped on compile failure (e.g.
    -march=native on an unsupported toolchain)."""
    with _lock:
        if name in _libs:
            return _libs[name]
        lib = None
        try:
            src = os.path.join(os.path.dirname(__file__), src_file)
            with open(src, "rb") as f:
                body = f.read()
            # local includes participate in the content hash (editing a
            # shared header must rebuild dependents)
            import re
            for inc in re.findall(rb'#include\s+"([^"]+)"', body):
                try:
                    with open(os.path.join(os.path.dirname(src),
                                           inc.decode()), "rb") as hf:
                        body += hf.read()
                except OSError:
                    pass
            tag = hashlib.sha256(body).hexdigest()[:16]
            if cflags:
                tag = f"{tag}-{hashlib.sha256(' '.join(cflags).encode()).hexdigest()[:6]}"
                if any("-march=native" in c for c in cflags):
                    # scope host-tuned builds by a microarch fingerprint:
                    # a VM migration can keep the cache dir while changing
                    # CPU features, and a stale -march=native .so for
                    # another microarch loads fine then dies SIGILL at
                    # call time (same hazard the XLA compile-cache scope
                    # in dashing2_tpu/__init__.py guards against)
                    tag += "-" + _cpu_fingerprint()
            # DASHING2_TPU_SANITIZE=address|undefined builds the native
            # components under ASan/UBSan (the reference's dashing2-add
            # target, Makefile:102-103); tests then exercise them
            # instrumented. Requires LD_PRELOAD of the matching runtime
            # when the host process itself is uninstrumented python.
            san = os.environ.get("DASHING2_TPU_SANITIZE", "")
            flags = [f"-fsanitize={san}", "-fno-omit-frame-pointer"] \
                if san else []
            if san:
                tag = f"{tag}-{san}"
            so = os.path.join(_build_dir(), f"lib{name}-{tag}.so")
            if not os.path.exists(so):
                tmp = so + f".tmp{os.getpid()}"
                base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        src, "-o", tmp]
                try:
                    subprocess.run(base + list(cflags) + flags + link,
                                   check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    if not cflags:
                        raise
                    subprocess.run(base + flags + link, check=True,
                                   capture_output=True)
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
        except Exception as e:  # toolchain missing etc: fall back silently
            if os.environ.get("DASHING2_TPU_DEBUG"):
                print(f"native {name} unavailable: {e}", file=sys.stderr)
        _libs[name] = lib
        return lib


def load_fastx_lib() -> Optional[ctypes.CDLL]:
    """Native FASTA/FASTQ reader (zlib-aware, LUT encoding)."""
    lib = _load_lib("fastx", "fastx_reader.cpp", ["-lz"])
    if lib is not None and not getattr(lib, "_sigs_set", False):
        lib.fxr_open.restype = ctypes.c_void_p
        lib.fxr_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.fxr_next.restype = ctypes.c_long
        lib.fxr_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
        lib.fxr_close.restype = None
        lib.fxr_close.argtypes = [ctypes.c_void_p]
        lib._sigs_set = True
    return lib


def load_myers_lib() -> Optional[ctypes.CDLL]:
    """Blocked Myers bit-parallel edit distance (batch + threads)."""
    lib = _load_lib("myersed", "myers_ed.cpp", ["-lpthread"])
    if lib is not None and not getattr(lib, "_sigs_set", False):
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.myers_batch.restype = None
        lib.myers_batch.argtypes = [u8p, i64p, i64p, i64p,
                                    ctypes.c_int64, ctypes.c_int, i64p]
        lib.myers_one.restype = ctypes.c_int64
        lib.myers_one.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib._sigs_set = True
    return lib


def load_oph_lib() -> Optional[ctypes.CDLL]:
    """Native threaded OPH sketcher (default DNA path; heterogeneous
    host-cores placement of the scatter-shaped bucket-min update)."""
    lib = _load_lib("ophsketch", "oph_sketch.cpp", ["-lpthread", "-lz"],
                    cflags=("-march=native", "-funroll-loops"))
    if lib is not None and not getattr(lib, "_sigs_set", False):
        c = ctypes
        lib.oph_rows_native.restype = None
        lib.oph_rows_native.argtypes = [
            c.POINTER(c.c_ubyte), c.c_int64, c.c_int64,
            c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            c.c_uint64, c.c_uint64,
            c.c_int32, c.c_uint64, c.c_uint64,
            c.c_int64, c.c_int64, c.c_int64, c.c_int32,
            c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_int32), c.c_int32,
            c.POINTER(c.c_uint64),
            c.POINTER(c.c_uint64), c.c_int64, c.c_int64,
            c.POINTER(c.c_uint64), c.POINTER(c.c_uint32)]
        lib.hash_rows_native.restype = c.c_int64
        lib.hash_rows_native.argtypes = [
            c.POINTER(c.c_ubyte), c.c_int64, c.c_int64,
            c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            c.c_uint64, c.c_int32, c.c_uint64, c.c_uint64,
            c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_int32), c.c_int32,
            c.POINTER(c.c_uint64),
            c.POINTER(c.c_uint64), c.c_int64, c.c_int64,
            c.POINTER(c.c_uint64)]
        lib.hash_rows_native128.restype = c.c_int64
        lib.hash_rows_native128.argtypes = [
            c.POINTER(c.c_ubyte), c.c_int64, c.c_int64,
            c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            c.c_uint64, c.c_uint64,
            c.c_int32, c.c_uint64, c.c_uint64,
            c.POINTER(c.c_uint64), c.c_int64,
            c.POINTER(c.c_uint64), c.POINTER(c.c_uint64)]
        lib.reg2sig_nibble.restype = None
        lib.reg2sig_nibble.argtypes = [
            c.POINTER(c.c_uint64), c.c_int64, c.c_uint64,
            c.POINTER(c.c_uint8)]
        lib.unpack_counts24.restype = None
        lib.unpack_counts24.argtypes = [
            c.POINTER(c.c_uint8), c.c_int64, c.c_int32,
            c.POINTER(c.c_uint16)]
        lib.unpack_counts24_f32.restype = None
        lib.unpack_counts24_f32.argtypes = [
            c.POINTER(c.c_uint8), c.c_int64, c.c_int32,
            c.POINTER(c.c_float), c.POINTER(c.c_float)]
        lib.oph_update_hashed.restype = None
        lib.oph_update_hashed.argtypes = [
            c.POINTER(c.c_uint64), c.c_int64, c.c_uint64, c.c_int64,
            c.POINTER(c.c_uint64), c.POINTER(c.c_uint32)]
        lib.oph_sketch_files.restype = c.c_int64
        lib.oph_sketch_files.argtypes = [
            c.POINTER(c.c_char_p), c.POINTER(c.c_int32),
            c.c_int64, c.c_int64, c.c_char_p,
            c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            c.c_uint64, c.c_uint64,
            c.c_int32, c.c_uint64, c.c_uint64,
            c.c_int64, c.c_int32,
            c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_int32), c.c_int32,
            c.POINTER(c.c_uint64),
            c.POINTER(c.c_uint64), c.c_int64, c.c_int64,
            c.POINTER(c.c_uint64), c.POINTER(c.c_uint32)]
        lib._sigs_set = True
    return lib


def load_emit_lib() -> Optional[ctypes.CDLL]:
    """Native float-row formatter (std::to_chars shortest round-trip,
    the same formatting family as the reference's fmt '{}')."""
    lib = _load_lib("emitfmt", "emit_fmt.cpp", [])
    if lib is not None and not getattr(lib, "_sigs_set", False):
        lib.fmt_f32_rows.restype = ctypes.c_size_t
        lib.fmt_f32_rows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
            ctypes.c_char, ctypes.c_char_p, ctypes.c_size_t]
        lib._sigs_set = True
    return lib


def load_ld_oracle() -> Optional[ctypes.CDLL]:
    """Long-double estimator-epilogue oracle: the reference compare()
    epilogues (cmp_core.cpp:349-517) transcribed at full precision, for
    measuring the production f32 epilogues' deviation (PARITY.md
    deviation 7)."""
    lib = _load_lib("ldoracle", "ld_oracle.cpp", [])
    if lib is not None and not getattr(lib, "_sigs_set", False):
        c = ctypes
        i64p = c.POINTER(c.c_int64)
        f64p = c.POINTER(c.c_double)
        lib.ld_epilogue.restype = None
        lib.ld_epilogue.argtypes = [
            c.c_int, c.c_int, c.c_int, c.c_int64, c.c_double, c.c_double,
            i64p, i64p, i64p, f64p, f64p, c.c_int64,
            c.POINTER(c.c_float)]
        lib._sigs_set = True
    return lib


def ld_epilogue(mode: int, measure: int, k: int, m: int, bq: float,
                fd: float, eqc, gtc, ltc, lhcard, rhcard):
    """Reference long-double epilogue for count vectors -> f32 values
    (None when the toolchain is unavailable)."""
    import numpy as np
    lib = load_ld_oracle()
    if lib is None:
        return None
    c = ctypes
    n = len(lhcard)
    z = np.zeros(n, np.int64)
    eqc = np.ascontiguousarray(eqc if eqc is not None else z, np.int64)
    gtc = np.ascontiguousarray(gtc if gtc is not None else z, np.int64)
    ltc = np.ascontiguousarray(ltc if ltc is not None else z, np.int64)
    lh = np.ascontiguousarray(lhcard, np.float64)
    rh = np.ascontiguousarray(rhcard, np.float64)
    out = np.empty(n, np.float32)
    lib.ld_epilogue(
        int(mode), int(measure), int(k), int(m), float(bq), float(fd),
        eqc.ctypes.data_as(c.POINTER(c.c_int64)),
        gtc.ctypes.data_as(c.POINTER(c.c_int64)),
        ltc.ctypes.data_as(c.POINTER(c.c_int64)),
        lh.ctypes.data_as(c.POINTER(c.c_double)),
        rh.ctypes.data_as(c.POINTER(c.c_double)),
        n, out.ctypes.data_as(c.POINTER(c.c_float)))
    return out
