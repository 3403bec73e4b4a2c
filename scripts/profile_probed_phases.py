#!/usr/bin/env python
"""Phase-level profile of the probed tag route's serve body (VERDICT
r10 next #6): replays _score_tagview_probed's per-unit loop in-process
(no Spark tasks) over the REAL routed 8,192-query batch at 10M, timing
each phase — sidecar loads, probe-range build, conjunction membership,
row union, decode, xn, einsum — so optimization lands where the time
is instead of where it is guessed to be.

Usage: PYTHONPATH=/root/repo python scripts/profile_probed_phases.py
"""

from __future__ import annotations

import time
from collections import defaultdict

import numpy as np


def main() -> None:
    from filter_vectordb_spark import get_spark
    from filter_vectordb_spark.index.filteridx import (
        _load_routing,
        _route,
        _tag_bins,
    )
    from filter_vectordb_spark.index.filteridx_kernels import (
        _csr_restrict,
        _row_union,
        _tag_units,
    )
    from filter_vectordb_spark.index.ivfsq import driver_blas
    from filter_vectordb_spark.index.tagpart import _f32_exact_ok
    from filter_vectordb_spark.queries.fixtures import (
        _yfcc10m_index,
        _yfcc_queries_staged,
    )

    spark = get_spark("profile_probed_phases")
    out = _yfcc10m_index(spark)
    q = _yfcc_queries_staged(spark, nq=8192)
    ndoc, n_base, min_freq, off, pair_files, tag_files, C, has_xn = _load_routing(
        spark, out
    )
    qpdf = q.select("qid", "qemb", "qtags").toPandas()
    _rp, r_tag, _rm, tag_col, other_col = _route(
        qpdf["qtags"], ndoc, min_freq * n_base, pair_files, tag_files
    )
    tp = qpdf.iloc[r_tag].copy()
    tp["tag"] = tag_col[r_tag]
    tp["other"] = other_col[r_tag]
    nprobe = 4
    Q = np.stack(tp["qemb"].to_numpy()).astype(np.float64)
    import os

    with driver_blas(os.cpu_count() or 8):
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Q @ C.T)
    P = np.argpartition(d2, nprobe - 1, axis=1)[:, :nprobe].astype(np.int64)
    nlist = len(C)
    print(f"tag-route queries: {len(tp)}, nlist={nlist}", flush=True)

    # mirror _score_tagview_probed's group construction
    groups: dict = {}
    pos_of = {j: i for i, j in enumerate(tp.index)}
    for (tag, other), grp in tp.groupby(["tag", "other"]):
        rows = np.array([pos_of[j] for j in grp.index], dtype=np.int64)
        groups.setdefault(int(tag), []).append(
            (
                int(other),
                grp["qid"].to_numpy(dtype=np.int64),
                np.stack(grp["qemb"].to_numpy()).astype(np.float64),
                P[rows],
            )
        )
    bf32 = _f32_exact_ok(np.stack(tp["qemb"].to_numpy()).astype(np.float64))
    bins = _tag_bins(out)
    units, bdir, bd = _tag_units(spark, groups, tag_files, bins)
    print(f"units: {len(units)} (bin={sum(1 for u in units if u[2] < 0)})", flush=True)
    off32 = off.astype(np.float32)

    T: dict[str, float] = defaultdict(float)
    stats: dict[str, float] = defaultdict(float)
    _PAIR_CHUNK = 65_536
    t_all = time.perf_counter()
    for tag, path, lo, hi in units:
        tgroups = groups.get(tag)
        if not tgroups:
            continue
        if lo >= 0:
            continue  # bin units only on this fixture
        t0 = time.perf_counter()
        n = hi
        ids = np.load(f"{bdir}/{path}.ids.npy", mmap_mode="r")
        xn_col = np.load(f"{bdir}/{path}.xn.npy", mmap_mode="r")
        C8 = np.memmap(
            f"{bdir}/{path}.codes.bin", dtype=np.int8, mode="r", shape=(n, bd)
        )
        bounds = np.load(f"{bdir}/{path}.bounds.npy")
        T["load"] += time.perf_counter() - t0
        others = np.array(
            sorted({o for o, _, _, _ in tgroups if o >= 0}), dtype=np.int64
        )
        oth_rows = oth_starts = None
        if len(others):
            t0 = time.perf_counter()
            oth_rows, oth_starts = _csr_restrict(f"{bdir}/{path}", others)
            T["csr"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        pq_ = []
        nb = 0
        for other, qids, Qg, Pg in tgroups:
            plo = bounds[Pg]
            cnt = bounds[Pg + 1] - plo
            ccnt = cnt.ravel()
            tot = int(ccnt.sum())
            if tot == 0:
                continue
            ofs = np.zeros(len(ccnt), dtype=np.int64)
            np.cumsum(ccnt[:-1], out=ofs[1:])
            rows = (
                np.arange(tot, dtype=np.int64)
                - np.repeat(ofs, ccnt)
                + np.repeat(plo.ravel(), ccnt)
            )
            qrep = np.repeat(
                np.arange(len(qids), dtype=np.int64), cnt.sum(axis=1)
            )
            if other >= 0:
                oi = int(np.searchsorted(others, other))
                post = oth_rows[oth_starts[oi] : oth_starts[oi + 1]]
                p2 = np.searchsorted(post, rows)
                keep = p2 < len(post)
                keep[keep] = post[p2[keep]] == rows[keep]
                rows, qrep = rows[keep], qrep[keep]
                if len(rows) == 0:
                    continue
            pq_.append((qids[qrep], nb + qrep, Qg, rows))
            nb += len(qids)
        T["phase1"] += time.perf_counter() - t0
        if not pq_:
            continue
        t0 = time.perf_counter()
        rows_cat = np.concatenate([g[3] for g in pq_])
        ur, inv = _row_union(rows_cat, n)
        pos = inv[rows_cat]
        T["union"] += time.perf_counter() - t0
        stats["pairs"] += len(rows_cat)
        stats["urows"] += len(ur)
        t0 = time.perf_counter()
        if bf32:
            Xu = C8[ur].astype(np.float32) + off32[None, :]
        else:
            Xu = C8[ur].astype(np.float64) + off[None, :]
        T["decode"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        xn_u = xn_col[ur]
        T["xn"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        QU = np.concatenate([g[2] for g in pq_], axis=0)
        qidx = np.concatenate([g[1] for g in pq_])
        qid_cat = np.concatenate([g[0] for g in pq_])
        qn_u = (QU * QU).sum(axis=1)
        Qm = QU.astype(np.float32) if bf32 else QU
        g = np.empty(len(rows_cat), dtype=np.float64)
        for clo in range(0, len(rows_cat), _PAIR_CHUNK):
            chi = min(clo + _PAIR_CHUNK, len(rows_cat))
            g[clo:chi] = np.einsum(
                "ij,ij->i", Qm[qidx[clo:chi]], Xu[pos[clo:chi]]
            ).astype(np.float64)
        dist = qn_u[qidx] - 2.0 * g + xn_u[pos]
        np.maximum(dist, 0.0, out=dist)
        T["einsum"] += time.perf_counter() - t0
        stats["dist_rows"] += len(dist)
        _ = (qid_cat, ids)
    wall = time.perf_counter() - t_all
    print(f"single-thread serve-body wall (decode path): {wall:.2f}s", flush=True)
    for k in sorted(T, key=T.get, reverse=True):
        print(f"  {k:8s} {T[k]:7.2f}s  {100 * T[k] / wall:5.1f}%", flush=True)
    print(
        f"pairs={stats['pairs']:.0f} union_rows={stats['urows']:.0f} "
        f"pairs/union={stats['pairs'] / max(1, stats['urows']):.2f}",
        flush=True,
    )

    # ---- second pass: the r11 int8-direct path (q·c + q·off, no union
    # decode) on identical inputs
    from filter_vectordb_spark.index.filteridx_kernels import (
        _int8_pair_scores,
        _int_off_ok,
    )

    assert _int_off_ok(off)
    T2: dict[str, float] = defaultdict(float)
    t_all = time.perf_counter()
    for tag, path, lo, hi in units:
        tgroups = groups.get(tag)
        if not tgroups or lo >= 0:
            continue
        t0 = time.perf_counter()
        n = hi
        ids = np.load(f"{bdir}/{path}.ids.npy", mmap_mode="r")
        xn_col = np.load(f"{bdir}/{path}.xn.npy", mmap_mode="r")
        C8 = np.memmap(
            f"{bdir}/{path}.codes.bin", dtype=np.int8, mode="r", shape=(n, bd)
        )
        bounds = np.load(f"{bdir}/{path}.bounds.npy")
        T2["load"] += time.perf_counter() - t0
        others = np.array(
            sorted({o for o, _, _, _ in tgroups if o >= 0}), dtype=np.int64
        )
        oth_rows = oth_starts = None
        if len(others):
            t0 = time.perf_counter()
            oth_rows, oth_starts = _csr_restrict(f"{bdir}/{path}", others)
            T2["csr"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        pq_ = []
        nb = 0
        for other, qids, Qg, Pg in tgroups:
            plo = bounds[Pg]
            cnt = bounds[Pg + 1] - plo
            ccnt = cnt.ravel()
            tot = int(ccnt.sum())
            if tot == 0:
                continue
            ofs = np.zeros(len(ccnt), dtype=np.int64)
            np.cumsum(ccnt[:-1], out=ofs[1:])
            rows = (
                np.arange(tot, dtype=np.int64)
                - np.repeat(ofs, ccnt)
                + np.repeat(plo.ravel(), ccnt)
            )
            qrep = np.repeat(
                np.arange(len(qids), dtype=np.int64), cnt.sum(axis=1)
            )
            if other >= 0:
                oi = int(np.searchsorted(others, other))
                post = oth_rows[oth_starts[oi] : oth_starts[oi + 1]]
                p2 = np.searchsorted(post, rows)
                keep = p2 < len(post)
                keep[keep] = post[p2[keep]] == rows[keep]
                rows, qrep = rows[keep], qrep[keep]
                if len(rows) == 0:
                    continue
            pq_.append((qids[qrep], nb + qrep, Qg, rows))
            nb += len(qids)
        T2["phase1"] += time.perf_counter() - t0
        if not pq_:
            continue
        t0 = time.perf_counter()
        rows_cat = np.concatenate([g[3] for g in pq_])
        QU = np.concatenate([g[2] for g in pq_], axis=0)
        qidx = np.concatenate([g[1] for g in pq_])
        qn_u = (QU * QU).sum(axis=1)
        Qm = QU.astype(np.float32)
        qoff = QU @ off
        g = _int8_pair_scores(Qm, qidx, C8, rows_cat)
        T2["einsum"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        dist = qn_u[qidx] - 2.0 * (g + qoff[qidx]) + xn_col[rows_cat]
        np.maximum(dist, 0.0, out=dist)
        T2["assemble"] += time.perf_counter() - t0
        _ = ids
    wall2 = time.perf_counter() - t_all
    print(
        f"single-thread serve-body wall (int8-direct): {wall2:.2f}s "
        f"({wall / max(wall2, 1e-9):.2f}x)",
        flush=True,
    )
    for k in sorted(T2, key=T2.get, reverse=True):
        print(f"  {k:8s} {T2[k]:7.2f}s  {100 * T2[k] / wall2:5.1f}%", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
