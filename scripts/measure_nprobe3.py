#!/usr/bin/env python
"""Measure tag-route recall + wall at candidate nprobe operating points
on the 10M yfcc fixture (VERDICT r10 next #6b): the committed grid has
2 -> 0.7909 and 4 -> 0.9479 tag-route recall; this fills in 3 (and
re-measures 4 for the same-window comparison) so the operating point
can move only on evidence.

Usage: PYTHONPATH=/root/repo python scripts/measure_nprobe3.py [nq]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    from pyspark.sql import functions as F

    from filter_vectordb_spark import get_spark
    from filter_vectordb_spark.index.filteridx import (
        _load_routing,
        _route,
        filtered_search,
    )
    from filter_vectordb_spark.queries.fixtures import (
        _yfcc10m_index,
        _yfcc_queries_staged,
    )

    spark = get_spark("measure_nprobe3")
    out = _yfcc10m_index(spark)
    q = _yfcc_queries_staged(spark, nq=8192).filter(F.col("qid") % 16 < 2)
    exact = filtered_search(spark, out, q, 10).toPandas()
    kth = exact.groupby("qid")["dist"].max().to_dict()
    n_ex = exact.groupby("qid").size().to_dict()
    ndoc, n_base, min_freq, _off, pair_files, tag_files, _C, _hx = _load_routing(
        spark, out
    )
    qpdf = q.select("qid", "qtags").toPandas()
    _rp, r_tag, _rm, _tc, _oc = _route(
        qpdf["qtags"], ndoc, min_freq * n_base, pair_files, tag_files
    )
    tag_qids = set(qpdf.iloc[r_tag]["qid"].astype(int))
    for nprobe in (3, 4):
        walls = []
        res = None
        for _ in range(3):
            rdf = filtered_search(spark, out, q, 10, nprobe=nprobe).cache()
            t0 = time.perf_counter()
            rdf.count()
            walls.append(round(time.perf_counter() - t0, 2))
            res = rdf.toPandas()
            rdf.unpersist()
        hits = tag_hits = 0
        for r in res.itertuples():
            ok = r.dist <= kth[r.qid]
            hits += ok
            if int(r.qid) in tag_qids:
                tag_hits += ok
        den = sum(n_ex.values())
        tag_den = sum(v for k_, v in n_ex.items() if int(k_) in tag_qids)
        print(
            f"nprobe={nprobe} whole={hits / max(1, den):.4f} "
            f"tag_route={tag_hits / max(1, tag_den):.4f} walls={walls}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
