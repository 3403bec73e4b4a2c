#!/usr/bin/env python
"""Standalone experiment for VERDICT r11 #3: does query-block tiling of
gemm_topk fix the 32-concurrent-task bandwidth contention?

Simulates knn_ip_10m's per-task shape (nq OOD queries x 78k-row f32
unit, chunk=2048) in N concurrent worker processes (each BLAS pinned to
1 thread, as session.py does), comparing the shipped gemm_topk against
a query-block-tiled variant.  Prints per-config wall seconds.

Usage: python scripts/exp_gemm_tile.py [nprocs ...]
"""
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

NQ = 1024
NB = 78_000
D = 192
K = 10
CHUNK = 2048
REPEAT = 2  # units per worker


def make_inputs(seed: int):
    rng = np.random.RandomState(seed)
    Q = rng.randint(0, 251, size=(NQ, D)).astype(np.float32)
    X = rng.randint(0, 251, size=(NB, D)).astype(np.float32)
    return Q, X


def run_worker(variant: str, seed: int, qblock: int) -> float:
    from filter_vectordb_spark.operators.knn import gemm_topk

    Q, X = make_inputs(seed)
    t0 = time.time()
    for r in range(REPEAT):
        if variant == "plain":
            idx, val = gemm_topk(Q, None, X, None, "ip", K)
        else:
            parts_i, parts_v = [], []
            for lo in range(0, NQ, qblock):
                i, v = gemm_topk(Q[lo : lo + qblock], None, X, None, "ip", K)
                parts_i.append(i)
                parts_v.append(v)
            idx = np.concatenate(parts_i, axis=0)
            val = np.concatenate(parts_v, axis=0)
    return time.time() - t0


def main():
    import multiprocessing as mp

    nprocs_list = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    for variant, qblock in [("plain", 0), ("tiled", 512), ("tiled", 256), ("tiled", 128)]:
        for nprocs in nprocs_list:
            with mp.Pool(nprocs) as pool:
                t0 = time.time()
                walls = pool.starmap(
                    run_worker, [(variant, 42 + i, qblock) for i in range(nprocs)]
                )
                wall = time.time() - t0
            print(
                f"{variant:5s} qblock={qblock:4d} nprocs={nprocs:2d} "
                f"wall={wall:6.2f}s per-task min/max={min(walls):.2f}/{max(walls):.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
