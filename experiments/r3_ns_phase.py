"""Where does the north-star sketch phase's wall time go?

Replicates the production dense_rows dispatch loop from
sketch/core.py:_sketch_fastx_core on the chip at N=2048 x 50 kb and
wall-times each sub-step separately: host ingest (parse+encode+chunk),
jit compile, per-batch dispatch, drain (stack + device->host pull +
host merge).  Run: python experiments/r3_ns_phase.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import dashing2_tpu  # noqa: F401  x64 on
import dashing2_tpu.cli as cli
import dashing2_tpu.sketch.core as SC
import dashing2_tpu.hashing as H
from dashing2_tpu.io.prefetch import prefetch

fas = sorted(glob.glob("/tmp/ns2k/*.fa*"))
assert fas, "generate /tmp/ns2k first"
cap = {}
orig_run = cli._run
cli._run = lambda a, top, opts, groups, *r: cap.update(opts=opts,
                                                       groups=groups) or 0
cli.main(["sketch", "-k", "31", "-S", "1024", "--fastcmp", "0.5",
          "--bbit-sigs", "--cmpout", "/tmp/x.bin"] + fas)
opts = cap["opts"]
groups = cap["groups"]

t0 = time.perf_counter()
items, _ = SC._load_items(opts, groups)
t_load = time.perf_counter() - t0
chunk_len = SC._auto_chunk_len(items)
rows_per_batch = int(min(512, max(64, (8 << 20) // chunk_len)))
m = opts.sketchsize
hkw = SC._hash_kwargs(opts, chunk_len)

t0 = time.perf_counter()
batches = list(SC._iter_chunk_batches(opts, items, chunk_len,
                                      rows_per_batch))
t_chunk = time.perf_counter() - t0
nrows = sum(b[0].shape[0] for b in batches)
print(f"ingest: load {t_load:.2f}s chunk {t_chunk:.2f}s "
      f"({len(batches)} batches, {nrows} rows, chunk_len {chunk_len}, "
      f"rpb {rows_per_batch})", flush=True)

fused = SC._fused_oph_fn(SC._hkw_key(hkw), m, H.OPH_DEFAULT_SEED,
                         False, False, "dense")
fs_dev = jnp.asarray(np.zeros(1, np.uint64))

t0 = time.perf_counter()
r0 = fused(jnp.asarray(batches[0][0]), fs_dev)
np.asarray(r0)
t_compile = time.perf_counter() - t0
print(f"first-call (compile+run+pull): {t_compile:.2f}s", flush=True)

# dispatch all batches, then one grouped drain like production
t0 = time.perf_counter()
inflight = []
t_put = 0.0
for chunks, ids in batches:
    tp = time.perf_counter()
    dev = jnp.asarray(chunks)
    t_put += time.perf_counter() - tp
    inflight.append((fused(dev, fs_dev), ids))
t_dispatch = time.perf_counter() - t0
print(f"dispatch {len(batches)} batches: {t_dispatch:.2f}s "
      f"(put {t_put:.2f}s)", flush=True)

t0 = time.perf_counter()
by_shape = {}
for p, bids in inflight:
    by_shape.setdefault(p.shape, []).append((p, bids))
t_pull = 0.0
t_merge = 0.0
regs = np.full((len(items), m), SC.U64MAX, np.uint64)
counts = np.zeros((len(items), m), np.uint32)
zrow = np.zeros(m, np.uint32)
for group in by_shape.values():
    tp = time.perf_counter()
    packed = np.asarray(jnp.stack([p for p, _ in group]))
    t_pull += time.perf_counter() - tp
    tm = time.perf_counter()
    for b, (_, bids) in enumerate(group):
        r = packed[b, :, :m]
        for row, item_id in enumerate(bids):
            if item_id < 0:
                continue
            regs[item_id], counts[item_id] = SC._merge_oph(
                regs[item_id], counts[item_id], r[row], zrow)
    t_merge += time.perf_counter() - tm
t_drain = time.perf_counter() - t0
print(f"drain: {t_drain:.2f}s (pull {t_pull:.2f}s merge {t_merge:.2f}s)",
      flush=True)
print(f"TOTAL sketch-shaped: "
      f"{t_load + t_chunk + t_compile + t_dispatch + t_drain:.2f}s",
      flush=True)
