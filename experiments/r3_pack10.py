"""Round-3 experiment: pack10 (3-fields-per-word) SWAR engines on chip.

u8 registers (< 2^9) and dense ranks with n <= 512 leave a guard bit in
10-bit fields at offsets 0/10/20, so the borrow/carry tricks of the
16-bit halves run at 1.5x the word density — and the u8 ab path skips
the rank pass entirely.  Expected from the lane-op model: gt+lt halves
30.1 ms -> ~20 ms for the same N=10240 m=1024 job.

Times the PRODUCTION kernels (ops/cmp_kernels engines, counts only)
via chained differential timing; run on the real chip.
"""
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from dashing2_tpu.ops.cmp_kernels import (circ_self_swar_tiles, pack8,
                                          pack10, pack16, pack30)


def _timed_chain(make_fn, args, reps=3, K=4):
    f1, fk = make_fn(1), make_fn(1 + K)
    np.asarray(f1(*args)); np.asarray(fk(*args))
    t1s, tks = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(*args)); tks.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / K, 1e-9)


def main():
    import os
    n = int(os.environ.get("D2_N", 10240))
    m = int(os.environ.get("D2_M", 1024))
    up = n * (n - 1) / 2
    rng = np.random.default_rng(0)

    def report(name, t):
        print(f"{name}: {t*1e3:.2f} ms = {up/t/1e9:.2f} G unique-pairs/s",
              flush=True)

    v8 = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    v30 = rng.integers(0, 1 << 30, size=(n, m)).astype(np.uint32)
    packs = {
        "pack16": jnp.asarray(pack16(jnp.asarray(v8))),
        "pack10": jnp.asarray(pack10(jnp.asarray(v8))),
        "pack8": jnp.asarray(pack8(jnp.asarray(v8))),
        "pack30": jnp.asarray(pack30(jnp.asarray(v30))),
    }

    def mk(K, data, t_, mode, nout):
        @jax.jit
        def run(a):
            def body(c, _):
                xs, ys = circ_self_swar_tiles(c, t=t_, mode=mode)
                # consume EVERY output: single-element probes let XLA
                # dead-code whole band stacks (R3_RESULTS finding e)
                probe = xs.sum(dtype=jnp.int32) + (
                    ys.sum(dtype=jnp.int32) if nout == 2 else 0)
                return c ^ probe.astype(c.dtype), None
            c, _ = jax.lax.scan(body, a, None, length=K)
            return c[0, 0].astype(jnp.int32)
        return run

    cases = [
        ("gt+lt u16-halves (round-3 route)", "pack16", "gtlt16", 2),
        ("gt+lt pack10 fields (NEW)", "pack10", "gtlt10", 2),
        ("eq pack10 fields", "pack10", "eq10", 1),
        ("eq pack8 (reference point)", "pack8", "eq8", 1),
        ("gt+lt pack30 two-level (n>2^15 ranks)", "pack30", "gtlt30", 2),
        ("eq pack30 two-level", "pack30", "eq30", 1),
    ]
    for name, pk, mode, nout in cases:
        data = packs[pk]
        for t_ in (min(512, n),):
            t = _timed_chain(
                lambda K, d=data, tt=t_, md=mode, no=nout:
                mk(K, d, tt, md, no), (data,))
            report(f"{name} t={t_}", t)


if __name__ == "__main__":
    main()
