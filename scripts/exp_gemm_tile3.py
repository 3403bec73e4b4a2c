#!/usr/bin/env python
"""Tiling experiment mark 3: chunk-outer / query-block-inner prototype
of gemm_topk (G tiles bounded at qblock x chunk so they stay cache-
resident; X is still read exactly once).  Candidate ORDER per row is
identical to the shipped kernel, so _threshold_merge results are
bit-identical (asserted here on every run)."""
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import multiprocessing as mp  # noqa: E402

import numpy as np  # noqa: E402

from filter_vectordb_spark.operators.knn import _threshold_merge  # noqa: E402

NQ = 1024
NB = 78_000
D = 192
K = 10


def gemm_topk_v2(Q, qn, X, xn, metric, k, chunk=2048, qblock=256):
    nq, nb = Q.shape[0], X.shape[0]
    kk = min(k, nb)
    larger = metric in ("ip", "cos")
    best_idx = best_val = thr = None
    cr, cc, cv = [], [], []
    npend = 0
    cap = max(65_536, 4 * nq * kk)
    for lo in range(0, nb, chunk):
        Xc = np.ascontiguousarray(X[lo : lo + chunk].T)  # (d, c) once per chunk
        nc = Xc.shape[1]
        if best_idx is None:
            ck = min(kk, nc)
            ps, vs = [], []
            for ql in range(0, nq, qblock):
                Gb = Q[ql : ql + qblock] @ Xc
                Db = Gb  # ip
                if ck < nc:
                    key0 = -Db if larger else Db
                    p = np.argpartition(key0, ck - 1, axis=1)[:, :ck]
                else:
                    p = np.tile(np.arange(nc), (Db.shape[0], 1))
                ps.append(p)
                vs.append(np.take_along_axis(Db, p, axis=1).astype(np.float64))
            p = np.concatenate(ps, axis=0)
            v = np.concatenate(vs, axis=0)
            best_idx, best_val, thr = _threshold_merge(
                (p + lo).astype(np.int64), v,
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64), larger,
            )
            continue
        t32 = thr.astype(np.float32)
        if larger:
            t32 = np.where(t32 > thr, np.nextafter(t32, np.float32(-np.inf)), t32)
        for ql in range(0, nq, qblock):
            Gb = Q[ql : ql + qblock] @ Xc
            m = Gb >= t32[ql : ql + qblock, None]
            r, c = np.nonzero(m)
            if len(r):
                cr.append(r + ql)
                cc.append(c + lo)
                cv.append(Gb[r, c].astype(np.float64))
                npend += len(r)
        if npend > cap:
            best_idx, best_val, thr = _threshold_merge(
                best_idx, best_val,
                np.concatenate(cr), np.concatenate(cc), np.concatenate(cv), larger,
            )
            cr, cc, cv = [], [], []
            npend = 0
    if npend:
        best_idx, best_val, thr = _threshold_merge(
            best_idx, best_val,
            np.concatenate(cr), np.concatenate(cc), np.concatenate(cv), larger,
        )
    return best_idx, best_val


def worker(variant, qblock, seed, barrier, out):
    from filter_vectordb_spark.operators.knn import gemm_topk

    rng = np.random.RandomState(seed)
    Q = rng.randint(0, 251, size=(NQ, D)).astype(np.float32)
    X = rng.randint(0, 251, size=(NB, D)).astype(np.float32)
    gemm_topk(Q[:64], None, X[:4096], None, "ip", K)
    gemm_topk_v2(Q[:64], None, X[:4096], None, "ip", K)
    barrier.wait()
    t0 = time.time()
    if variant == "plain":
        gemm_topk(Q, None, X, None, "ip", K)
    else:
        gemm_topk_v2(Q, None, X, None, "ip", K, qblock=qblock)
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
    # bit-identity check first
    from filter_vectordb_spark.operators.knn import gemm_topk

    rng = np.random.RandomState(7)
    Q = rng.randint(0, 251, size=(333, D)).astype(np.float32)
    X = rng.randint(0, 251, size=(10_000, D)).astype(np.float32)
    i1, v1 = gemm_topk(Q, None, X, None, "ip", K)
    i2, v2 = gemm_topk_v2(Q, None, X, None, "ip", K, qblock=100)
    assert np.array_equal(i1, i2) and np.array_equal(v1, v2), "NOT bit-identical"
    print("bit-identical: OK", flush=True)

    nprocs_list = [int(a) for a in sys.argv[1:]] or [1, 32]
    for variant, qblock in [("plain", 0), ("v2", 256), ("v2", 512), ("v2", 1024)]:
        for nprocs in nprocs_list:
            run(variant, qblock, nprocs)
