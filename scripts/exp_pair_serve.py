#!/usr/bin/env python
"""A/B the pair-scoring kernel forms on the REAL yfcc-10M routed batch
(VERDICT r11 #2): replays _score_tagview_probed's phase-2 per unit —
collect each unit's (Qm, qidx, rows) pair arrays once, then time the
old chunked pair-gather einsum vs the new segment matrix-vector form
(_int8_pair_scores) over the full batch, min-of-N, plus bit-equality.

Usage: PYTHONPATH=/root/repo python scripts/exp_pair_serve.py [runs]
"""
from __future__ import annotations

import sys
import time

import numpy as np

runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    from filter_vectordb_spark import get_spark
    from filter_vectordb_spark.index import filteridx_kernels as fk
    from filter_vectordb_spark.index.filteridx import (
        _load_routing,
        _route,
        _tag_bins,
    )
    from filter_vectordb_spark.index.ivfsq import driver_blas
    from filter_vectordb_spark.index.tagpart import _f32_exact_ok
    from filter_vectordb_spark.queries.fixtures import (
        _yfcc10m_index,
        _yfcc_queries_staged,
    )

    spark = get_spark("exp_pair_serve")
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
    print(f"tag-route queries: {len(tp)}, nlist={len(C)}", flush=True)

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
    bins = _tag_bins(out)
    units, bdir, bd = fk._tag_units(spark, groups, tag_files, bins)

    # PHASE 1 replay: build every unit's pair arrays once, keep them
    work = []  # (Qm32, qidx, C8, rows_cat)
    tot_pairs = 0
    for tag, path, lo, hi in units:
        tgroups = groups.get(tag)
        if not tgroups or lo >= 0:
            continue
        n = hi
        C8 = np.memmap(
            f"{bdir}/{path}.codes.bin", dtype=np.int8, mode="r", shape=(n, bd)
        )
        bounds = np.load(f"{bdir}/{path}.bounds.npy")
        others = np.array(
            sorted({o for o, _, _, _ in tgroups if o >= 0}), dtype=np.int64
        )
        oth_rows = oth_starts = None
        if len(others):
            oth_rows, oth_starts = fk._csr_restrict(f"{bdir}/{path}", others)
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
            qrep = np.repeat(np.arange(len(qids), dtype=np.int64), cnt.sum(axis=1))
            if other >= 0:
                oi = int(np.searchsorted(others, other))
                post = oth_rows[oth_starts[oi] : oth_starts[oi + 1]]
                p2 = np.searchsorted(post, rows)
                keep = p2 < len(post)
                keep[keep] = post[p2[keep]] == rows[keep]
                rows, qrep = rows[keep], qrep[keep]
                if len(rows) == 0:
                    continue
            pq_.append((nb + qrep, Qg, rows))
            nb += len(qids)
        if not pq_:
            continue
        rows_cat = np.concatenate([g[2] for g in pq_])
        QU = np.concatenate([g[1] for g in pq_], axis=0)
        qidx = np.concatenate([g[0] for g in pq_])
        work.append((QU.astype(np.float32), qidx, C8, rows_cat))
        tot_pairs += len(rows_cat)
    nseg = sum(len(np.unique(w[1])) for w in work)
    print(
        f"units with pairs: {len(work)}, pairs: {tot_pairs}, "
        f"mean pairs/query-seg: {tot_pairs / max(nseg, 1):.0f}",
        flush=True,
    )

    def run_old():
        outs = []
        for Qm, qidx, C8, rows in work:
            g = np.empty(len(rows), dtype=np.float64)
            for clo in range(0, len(rows), fk._PAIR_CHUNK):
                chi = min(clo + fk._PAIR_CHUNK, len(rows))
                g[clo:chi] = np.einsum(
                    "ij,ij->i", Qm[qidx[clo:chi]], C8[rows[clo:chi]]
                ).astype(np.float64)
            outs.append(g)
        return outs

    def run_new():
        return [fk._int8_pair_scores(Qm, qidx, C8, rows) for Qm, qidx, C8, rows in work]

    ref = run_old()
    new = run_new()
    ident = all(np.array_equal(a, b) for a, b in zip(ref, new))
    print(f"bit-identical: {ident}", flush=True)
    for name, fn in (("old_chunked", run_old), ("new_segment", run_new)):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {[round(t, 3) for t in ts]} min {min(ts):.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
