"""Worker process for the 2-process jax.distributed CPU test.

Usage: python dist_worker.py <pid> <nproc> <port> <outfile> <fa...>
Writes this host's row block as <outfile>.rows.<lo>-<hi>.
"""

import os
import sys


def main():
    pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    groups = sys.argv[5:]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # one device per process
    import dashing2_tpu  # noqa: F401  (x64 on; before other jax use)
    from dashing2_tpu.config import Dashing2DistOptions
    from dashing2_tpu.parallel import distributed as D

    mode = os.environ.get("D2_WORKER_MODE", "cmp")
    ppi, ppc = D.init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert ppc == nproc, (ppi, ppc)
    if mode == "knn":
        import pickle
        from dashing2_tpu.cmp import core as C
        from dashing2_tpu.sketch.core import sketch_fastx
        opts = Dashing2DistOptions(k=21, sketchsize=128, num_neighbors=2)
        result = sketch_fastx(opts, groups)
        creps, result = C._prep(opts, result)
        lists = D.distributed_neighbor_lists(opts, result, creps)
        with open(f"{outfile}.knn.{pid}", "wb") as f:
            pickle.dump(lists, f)
        return
    if mode == "dedup":
        import pickle
        from dashing2_tpu.cmp import core as C
        from dashing2_tpu.sketch.core import sketch_fastx
        opts = Dashing2DistOptions(k=21, sketchsize=128,
                                   min_similarity=0.5)
        result = sketch_fastx(opts, groups)
        creps, result = C._prep(opts, result)
        ids, constituents = D.distributed_dedup(opts, result, creps)
        with open(f"{outfile}.dedup.{pid}", "wb") as f:
            pickle.dump((ids, constituents), f)
        return
    opts = Dashing2DistOptions(k=21, sketchsize=128)
    D.distributed_sketch_cmp(opts, groups, outfile=outfile)


if __name__ == "__main__":
    main()
