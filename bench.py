"""Headline benchmark: pairwise register-comparison throughput on one chip.

Mirrors the BASELINE.json metric ("pairwise comparisons/sec at 10K
genomes"): N sketches of m=1024 f64 registers (the reference's default
RegT/sketchsize), full gtlt counting + SetSketch similarity estimator.
Prints ONE JSON line.

vs_baseline: the reference publishes no numbers and its submodules are
absent (unbuildable here), so the comparison point is the north-star's
32-thread CPU Dashing2 estimate derived from its SIMD count_gtlt kernel:
~2 registers/cycle/core * 32 cores * 3 GHz / 1024 registers/pair
~= 1.9e8 pairs/s. vs_baseline = pairs_per_sec / 1.9e8.
"""

import json
import time

import numpy as np


def main():
    import dashing2_tpu  # noqa: F401  (x64)
    import jax
    import jax.numpy as jnp
    from dashing2_tpu.parallel.allpairs import device_similarity
    from dashing2_tpu.ops.cmp_kernels import f64_to_ordered_u64

    rng = np.random.default_rng(0)
    n, m = 4096, 1024
    sigs = np.abs(rng.normal(size=(n, m))) + 1e-9
    su = jnp.asarray(f64_to_ordered_u64(sigs))
    cards = jnp.asarray(rng.uniform(1e5, 1e7, size=n).astype(np.float32))

    device_similarity(su, cards, m=m).block_until_ready()  # compile + warm
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        device_similarity(su, cards, m=m).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    pairs = n * n  # full square computed
    pps = pairs / dt
    baseline_cpu = 1.9e8
    print(json.dumps({
        "metric": "pairwise_comparisons_per_sec",
        "value": round(pps, 1),
        "unit": "pairs/s (m=1024 f64 registers, full gtlt estimator)",
        "vs_baseline": round(pps / baseline_cpu, 2),
    }))


if __name__ == "__main__":
    main()
