"""Round-4: device->host pull bandwidth and stream concurrency.

The tunnel pull measured ~20-35 MB/s single-stream (prof probes,
blockpath-32k wall). Every big-N job is now pull-bound, so the one
remaining lever is concurrency: if the tunnel multiplexes transfers,
pulling K slices from K threads divides the wall. Run on the chip:
python experiments/r4_pull.py
"""

import threading
import time

import numpy as np

import dashing2_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def p(msg):
    print(msg, flush=True)


@jax.jit
def gen(seed):
    k = jax.random.key(seed)
    return (jax.random.uniform(k, (1024, 32768)) * 100).astype(jnp.int32)


x = gen(0)
parts4 = [jnp.copy(x[i * 256:(i + 1) * 256]) for i in range(4)]
parts2 = [jnp.copy(x[:512]), jnp.copy(x[512:])]
# force materialization + first-pull warmup of every array
for a in [x] + parts2 + parts4:
    np.asarray(a[:1])

for rep in range(2):
    t0 = time.perf_counter()
    np.asarray(x)
    dt = time.perf_counter() - t0
    p(f"single-stream 128 MB: {dt:.2f}s = {x.nbytes/dt/1e6:.0f} MB/s")

for label, parts in [("2-thread 2x64MB", parts2),
                     ("4-thread 4x32MB", parts4)]:
    for rep in range(2):
        out = [None] * len(parts)

        def pull(i):
            out[i] = np.asarray(parts[i])
        th = [threading.Thread(target=pull, args=(i,))
              for i in range(len(parts))]
        t0 = time.perf_counter()
        for t in th:
            t.start()
        for t in th:
            t.join()
        dt = time.perf_counter() - t0
        p(f"{label}: {dt:.2f}s = {x.nbytes/dt/1e6:.0f} MB/s aggregate")

# sequential pulls of the same 2 parts (controls for slice overhead)
t0 = time.perf_counter()
np.asarray(parts2[0]); np.asarray(parts2[1])
dt = time.perf_counter() - t0
p(f"sequential 2x64MB: {dt:.2f}s = {x.nbytes/dt/1e6:.0f} MB/s")
p("done")
