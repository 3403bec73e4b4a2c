#!/usr/bin/env python
"""Micro-benchmark of pair-scoring kernel variants (VERDICT r11 #2).

Shapes mirror the yfcc-10M probed tag route: one big unit (n rows of
int8[d]), pairs built from nprobe contiguous probe ranges per query,
qidx globally sorted.  All variants must be bit-identical: values are
integer-exact (< 2^24) so any summation regrouping is exact in f32.

Usage: python scripts/exp_pair_kernel.py [n_rows] [n_pairs_million]
"""
import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
pairs_m = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
d = 192
nq = 8192
rng = np.random.default_rng(7)

C8 = rng.integers(-128, 128, size=(n, d), dtype=np.int8)
Q = rng.integers(0, 256, size=(nq, d)).astype(np.float32)  # integer-exact

# per query: nprobe contiguous ranges
target_pairs = int(pairs_m * 1e6)
per_q = target_pairs // nq
nprobe = 4
per_range = per_q // nprobe
rows_l, qidx_l = [], []
starts = rng.integers(0, n - per_range - 1, size=(nq, nprobe))
for qi in range(nq):
    r = np.concatenate(
        [np.arange(s, s + per_range, dtype=np.int64) for s in starts[qi]]
    )
    rows_l.append(r)
    qidx_l.append(np.full(len(r), qi, dtype=np.int64))
rows = np.concatenate(rows_l)
qidx = np.concatenate(qidx_l)
print(f"n={n} d={d} pairs={len(rows)} queries={nq}", flush=True)

CHUNK = 65_536


def v_current():
    g = np.empty(len(rows), dtype=np.float64)
    for clo in range(0, len(rows), CHUNK):
        chi = min(clo + CHUNK, len(rows))
        g[clo:chi] = np.einsum(
            "ij,ij->i", Q[qidx[clo:chi]], C8[rows[clo:chi]]
        ).astype(np.float64)
    return g


def v_cast_einsum():
    g = np.empty(len(rows), dtype=np.float64)
    for clo in range(0, len(rows), CHUNK):
        chi = min(clo + CHUNK, len(rows))
        X = C8[rows[clo:chi]].astype(np.float32)
        g[clo:chi] = np.einsum("ij,ij->i", Q[qidx[clo:chi]], X).astype(
            np.float64
        )
    return g


def _segments():
    # qidx is globally sorted; one segment per query
    b = np.flatnonzero(np.diff(qidx)) + 1
    return np.concatenate(([0], b, [len(qidx)]))


def v_sgemv():
    seg = _segments()
    g = np.empty(len(rows), dtype=np.float64)
    for i in range(len(seg) - 1):
        s, e = seg[i], seg[i + 1]
        q = Q[qidx[s]]
        g[s:e] = C8[rows[s:e]].astype(np.float32) @ q
    return g


def v_seg_einsum():
    seg = _segments()
    g = np.empty(len(rows), dtype=np.float64)
    for i in range(len(seg) - 1):
        s, e = seg[i], seg[i + 1]
        q = Q[qidx[s]]
        g[s:e] = np.einsum("ij,j->i", C8[rows[s:e]], q)
    return g


def v_range_dot():
    # exploit contiguity: slice views straight off C8, no gather
    g = np.empty(len(rows), dtype=np.float64)
    pos = 0
    for qi in range(nq):
        q = Q[qi]
        for s in starts[qi]:
            blk = C8[s : s + per_range].astype(np.float32) @ q
            g[pos : pos + per_range] = blk
            pos += per_range
    return g


def v_sgemv_chunkcast():
    # per-query sgemv but cast via a reused buffer
    seg = _segments()
    g = np.empty(len(rows), dtype=np.float64)
    buf = np.empty((per_q + 8, d), dtype=np.float32)
    for i in range(len(seg) - 1):
        s, e = seg[i], seg[i + 1]
        m = e - s
        b = buf[:m]
        np.copyto(b, C8[rows[s:e]])
        g[s:e] = b @ Q[qidx[s]]
    return g


ref = None
for name, fn in [
    ("current", v_current),
    ("cast_einsum", v_cast_einsum),
    ("sgemv", v_sgemv),
    ("seg_einsum", v_seg_einsum),
    ("range_dot", v_range_dot),
    ("sgemv_chunkcast", v_sgemv_chunkcast),
]:
    fn()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    if ref is None:
        ref = out
    ident = bool(np.array_equal(out, ref))
    gbps = len(rows) * d / min(ts) / 1e9
    print(
        f"{name:16s} min {min(ts):.3f}s  {gbps:.1f} Gpair-dim/s  bitident={ident}",
        flush=True,
    )
