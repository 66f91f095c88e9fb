"""dashing2_tpu: a TPU-native genomic sketching + comparison framework.

A ground-up rebuild of the capabilities of dnbaker/dashing2 (reference:
/root/reference) designed for TPU hardware: JAX/XLA/Pallas device kernels for
k-mer hashing, sketch register updates, and tiled all-pairs register
comparisons; jax.sharding meshes for multi-chip scaling; a host layer for
FASTX/BED/BigWig ingest and the reference's on-disk formats.

64-bit integer semantics are required throughout (k-mer codes, hash values),
so importing this package enables jax x64 mode. Hot device kernels
nevertheless operate on u32 limb pairs so nothing depends on TPU f64/u64
emulation being fast.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Some containers pin a TPU plugin via sitecustomize in a way that wins over
# the JAX_PLATFORMS env var; re-assert the user's explicit platform choice.
if _os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: CLI invocations recompile the same kernel
# shapes every run otherwise (XLA compiles dominate short jobs). Disable
# with DASHING2_TPU_NO_COMPILE_CACHE=1.
#
# CPU-AOT safety: CPU artifacts embed the exact machine-feature set, and
# a cache written under a different microarchitecture (VM migrations keep
# the hostname) loads with warnings, never hits, and risks SIGILL. The
# cache directory is therefore SCOPED by a microarch fingerprint (the
# /proc/cpuinfo flags line) in addition to platform env + hostname — a
# migrated VM resolves to a fresh directory, so the cache is safe to
# enable regardless of which backend JAX ultimately resolves (the
# resolved backend is unknowable here without forcing device init, which
# would stall library imports on tunnel-backed TPUs). When no fingerprint
# is readable the hazard is real again, so the gate falls back to
# requiring an explicitly non-CPU JAX_PLATFORMS.
def _cpu_fingerprint():
    try:
        with open("/proc/cpuinfo") as _f:
            for _ln in _f:
                if _ln.startswith("flags"):
                    import hashlib as _hl
                    return _hl.sha1(_ln.encode()).hexdigest()[:8]
    except OSError:
        pass
    return None


if not _os.environ.get("DASHING2_TPU_NO_COMPILE_CACHE"):
    try:
        _fp = _cpu_fingerprint()
        _plat = _os.environ.get("JAX_PLATFORMS", "").lower()
        if _fp is not None or ("cpu" not in _plat.split(",") and _plat):
            _scope = (_os.environ.get("JAX_PLATFORMS", "dev") + "-"
                      + _os.uname().nodename
                      + (("-" + _fp) if _fp else ""))
            _cc = _os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache",
                              "dashing2_tpu", "xla-" + _scope))
            _os.makedirs(_cc, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cc)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from . import enums  # noqa: E402
from .enums import (  # noqa: E402
    DataType,
    SketchSpace,
    CountingType,
    KmerSketchResultType,
    OutputKind,
    OutputFormat,
    Measure,
)
from .config import Dashing2Options, Dashing2DistOptions  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "enums",
    "DataType",
    "SketchSpace",
    "CountingType",
    "KmerSketchResultType",
    "OutputKind",
    "OutputFormat",
    "Measure",
    "Dashing2Options",
    "Dashing2DistOptions",
    "__version__",
]
