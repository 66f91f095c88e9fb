"""Round-3 sketch-phase breakdown on chip.

Production shape: (R=256, L=32768) code batches, k=31 w=31 m=1024.
Times, chained-differentially:
  1. fused encode+hash+OPH step (the new _fused_oph_fn)
  2. hash/encode alone (_hash_chunk_batch)
  3. OPH dense-rows alone, chunk in {2048, 4096, 8192}
Rates in Gbase/s (bases ~= R*L per batch).
"""
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu import hashing as H
from dashing2_tpu.enums import Alphabet
from dashing2_tpu.ops import sketch_kernels as SK
from dashing2_tpu.sketch.core import (_fused_oph_fn, _hash_chunk_batch,
                                      _hkw_key)


def _timed_chain(make_fn, args, reps=3, K=3):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def main():
    R, L, m, k = 256, 32768, 1024, 31
    bases = R * L
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.uint8))
    fs = jnp.zeros(1, jnp.uint64)
    hkw = dict(k=k, w=k, canon=True, alphabet=Alphabet.DNA, entmin=False,
               xormask=H.XORMASK, seed_is_zero=False,
               downsample_threshold=(1 << 64) - 1, chunk_len=L,
               span=k, spacing_offsets=None, rolling=False, use128=False)

    def report(name, t):
        print(f"{name}: {t*1e3:.2f} ms/batch = "
              f"{bases/t/1e9:.3f} Gbase/s", flush=True)

    # 1. fused production step
    fused = _fused_oph_fn(_hkw_key(hkw), m, H.OPH_DEFAULT_SEED, False,
                          False)

    def mk_fused(K):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fused(c, fs)
                return c ^ (out[0, 0] & 3).astype(jnp.uint8), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    t = _timed_chain(mk_fused, (chunks,))
    report("fused encode+hash+OPH", t)

    # 2. hash/encode alone
    def mk_hash(K):
        @jax.jit
        def run(x):
            def body(c, _):
                hashed, valid = _hash_chunk_batch(c, fs,
                                                  use_filterset=False,
                                                  **hkw)
                return c ^ (hashed[0, 0] & 3).astype(jnp.uint8), None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run
    t = _timed_chain(mk_hash, (chunks,))
    report("encode+hash only", t)

    # 3. OPH alone at several chunk sizes
    hashed, valid = _hash_chunk_batch(chunks, fs, use_filterset=False,
                                      **hkw)
    hashed = jax.block_until_ready(hashed)
    for ch in (2048, 4096, 8192):
        def mk_oph(K, ch=ch):
            @jax.jit
            def run(h, v):
                def body(c, _):
                    r, _c = SK.oph_sketch_rows(c, v, m=m,
                                               seed=H.OPH_DEFAULT_SEED,
                                               want_counts=False,
                                               chunk=ch)
                    return c ^ (r[:, :1] & jnp.uint64(3)), None
                c, _ = jax.lax.scan(body, h, None, length=K)
                return c[0, 0].astype(jnp.int32)
            return run
        try:
            t = _timed_chain(mk_oph, (hashed, valid))
            report(f"OPH dense rows chunk={ch}", t)
        except Exception as e:
            print(f"OPH chunk={ch}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[:2]}", flush=True)


if __name__ == "__main__":
    main()
