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
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "fastx_reader.cpp")


def _build_dir() -> str:
    d = os.environ.get("DASHING2_TPU_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "dashing2_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def load_fastx_lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native reader; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            with open(_SRC, "rb") as f:
                tag = hashlib.sha256(f.read()).hexdigest()[:16]
            so = os.path.join(_build_dir(), f"libfastx-{tag}.so")
            if not os.path.exists(so):
                tmp = so + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", tmp, "-lz"],
                    check=True, capture_output=True)
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            lib.fxr_open.restype = ctypes.c_void_p
            lib.fxr_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.fxr_next.restype = ctypes.c_long
            lib.fxr_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
            lib.fxr_close.restype = None
            lib.fxr_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # toolchain missing etc: fall back silently
            if os.environ.get("DASHING2_TPU_DEBUG"):
                print(f"native fastx unavailable: {e}", file=sys.stderr)
            _lib = None
        return _lib
