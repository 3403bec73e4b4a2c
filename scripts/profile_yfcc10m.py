#!/usr/bin/env python
"""Profile the yfcc-10M filtered serving rows (exact + ivf mode):
per-run walls, route mix, and a breakdown run with only the meta route.

Usage: PYTHONPATH=/root/repo python scripts/profile_yfcc10m.py [runs]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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

    spark = get_spark("profile_yfcc10m")
    out = _yfcc10m_index(spark)
    q = _yfcc_queries_staged(spark, nq=8192)
    ndoc, n_base, min_freq, _off, pair_files, tag_files, _C, _hx = _load_routing(
        spark, out
    )
    qpdf = q.select("qid", "qtags").toPandas()
    r_pair, r_tag, r_meta, _tc, _oc = _route(
        qpdf["qtags"], ndoc, min_freq * n_base, pair_files, tag_files
    )
    print(f"route mix: pair={len(r_pair)} tag={len(r_tag)} meta={len(r_meta)}")

    for label, kwargs in (("exact", {}), ("ivf4", {"nprobe": 4})):
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            filtered_search(spark, out, q, 10, **kwargs).count()
            walls.append(round(time.perf_counter() - t0, 2))
        print(f"{label}: {walls}  best QPS={8192 / min(walls):.0f}")

    # single-route batches: slice the query set per route
    meta_q = q.join(
        spark.createDataFrame(
            [(int(qpdf.iloc[j]["qid"]),) for j in r_meta], "qid LONG"
        ),
        "qid",
    )
    tag_q = q.join(
        spark.createDataFrame(
            [(int(qpdf.iloc[j]["qid"]),) for j in r_tag], "qid LONG"
        ),
        "qid",
    )
    for label, sub, kwargs in (
        ("meta-only", meta_q, {}),
        ("tag-only exact", tag_q, {}),
        ("tag-only ivf4", tag_q, {"nprobe": 4}),
    ):
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            filtered_search(spark, out, sub, 10, **kwargs).count()
            walls.append(round(time.perf_counter() - t0, 2))
        print(f"{label} ({sub.count()} q): {walls}")
    spark.stop()


if __name__ == "__main__":
    main()
