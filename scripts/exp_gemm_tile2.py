#!/usr/bin/env python
"""Tiling-under-concurrency experiment, mark 2: workers synchronize on a
barrier AFTER building inputs, so the timed region is the kernel alone
and all N kernels genuinely overlap (the mark-1 wall mixed input-gen
contention into the comparison).  Per-worker X is private (distinct
pages, like distinct scan units); Q is rebuilt per worker (tiny)."""
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import multiprocessing as mp  # noqa: E402

import numpy as np  # noqa: E402

NQ = 1024
NB = 78_000
D = 192
K = 10


def worker(variant, qblock, seed, barrier, out):
    from filter_vectordb_spark.operators.knn import gemm_topk

    rng = np.random.RandomState(seed)
    Q = rng.randint(0, 251, size=(NQ, D)).astype(np.float32)
    X = rng.randint(0, 251, size=(NB, D)).astype(np.float32)
    # warm one pass so pages are faulted before the timed region
    gemm_topk(Q[:64], None, X[:4096], None, "ip", K)
    barrier.wait()
    t0 = time.time()
    if variant == "plain":
        gemm_topk(Q, None, X, None, "ip", K)
    else:
        for lo in range(0, NQ, qblock):
            gemm_topk(Q[lo : lo + qblock], None, X, None, "ip", K)
    out.put(time.time() - t0)


def run(variant, qblock, nprocs):
    barrier = mp.Barrier(nprocs)
    out = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(variant, qblock, 42 + i, barrier, out))
        for i in range(nprocs)
    ]
    for p in procs:
        p.start()
    walls = [out.get() for _ in procs]
    for p in procs:
        p.join()
    print(
        f"{variant:5s} qblock={qblock:4d} nprocs={nprocs:2d} "
        f"kernel med={sorted(walls)[len(walls)//2]:.2f}s max={max(walls):.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    nprocs_list = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    for variant, qblock in [("plain", 0), ("tiled", 256), ("tiled", 128), ("tiled", 512)]:
        for nprocs in nprocs_list:
            run(variant, qblock, nprocs)
