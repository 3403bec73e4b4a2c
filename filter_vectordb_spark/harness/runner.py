"""Config-driven benchmark runner (SURVEY.md §2.10, A6, S6).

Mirrors the reference's run loop: a YAML definition names the engine,
build args, and up to N query-arg dicts per run group
(`filter/faiss/config.yaml:1-64`, `README.md:220-228`); each run is timed
best-of-`run_count` (`filter/run.py:36-38`), recall@k is computed against
the exact brute-force plan (the reference's own ground-truth methodology),
and results land as Parquet + a JSON attrs sidecar (S6 — the reference
stores HDF5 + attrs, `filter/run.py:40-52`).
"""

from __future__ import annotations

import json
import os
import time

import yaml
from pyspark.sql import DataFrame, SparkSession

from filter_vectordb_spark.harness.engines import ENGINES


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def _recall_at_k(results: DataFrame, truth: DataFrame, k: int) -> float:
    """hits / |truth| — the truth side holds ≤k rows per query, so a
    query whose predicate matches fewer than k rows is not penalized for
    the rows that do not exist (the reference's datasets guarantee ≥k
    matches; our fixtures do not).  Engine results are deduplicated
    first: a buggy engine returning duplicate (qid,id) rows must not
    double-count hits and report recall > 1."""
    hits = results.select("qid", "id").distinct().join(truth, ["qid", "id"]).count()
    denom = truth.count()
    return hits / denom if denom else 0.0


def run_benchmark(
    spark: SparkSession,
    config: dict,
    sf_dir: str,
    out_dir: str | None = None,
    k: int = 10,
) -> list[dict]:
    """Execute every run group in `config`; returns one record per
    (engine, query-args) point: best wall time, recall@k, attrs."""
    records = []
    caches = []
    try:
        for group in config.get("run_groups", []):
            cls = ENGINES[group["engine"]]
            engine = cls(
                metric=group.get("metric", "l2"),
                index_params=group.get("index_params", {}),
            )
            if not engine.load_index(spark, sf_dir):
                t0 = time.perf_counter()
                engine.fit(spark, sf_dir)
                build_s = time.perf_counter() - t0
            else:
                build_s = 0.0
            # per-track query set + exact ground truth (each track has its
            # own shapes, as in the reference's per-track runners)
            queries = engine.default_queries(spark, sf_dir)
            exact = engine.exact_truth(spark, sf_dir, queries, k).cache()
            exact.count()
            caches.append(exact)
            nq = queries.select("qid").distinct().count()
            run_count = int(group.get("run_count", 2))
            for qargs in group.get("query_args", [{}]):
                engine.set_query_arguments(**qargs)
                best = float("inf")
                res = None
                for _ in range(run_count):
                    t0 = time.perf_counter()
                    res = engine.query(queries, k)
                    res.count()
                    best = min(best, time.perf_counter() - t0)
                rec = {
                    "engine": engine.name,
                    "qargs": json.dumps(qargs, sort_keys=True),
                    "build_s": round(build_s, 4),
                    "best_query_s": round(best, 4),
                    "nq": nq,
                    "qps": round(nq / best, 4) if best > 0 else 0.0,
                    "recall_at_k": round(
                        _recall_at_k(res.select("qid", "id"), exact, k), 4
                    ),
                    "k": k,
                    "attrs": engine.get_additional(),
                }
                records.append(rec)
                if out_dir:
                    tag = f"{engine.name}_" + "_".join(
                        f"{a}-{v}" for a, v in sorted(qargs.items())
                    ).strip("_")
                    dest = os.path.join(out_dir, tag or engine.name)
                    res.select("qid", "rank", "id").write.mode("overwrite").parquet(
                        dest
                    )
                    with open(dest + ".attrs.json", "w") as f:
                        json.dump(rec, f, indent=2)
    finally:
        for c in caches:
            c.unpersist()
    return records


def curve_report(records: list[dict]) -> list[dict]:
    """The reference's figure of merit: the recall-vs-QPS curve per engine
    over its query-arg grid (`README.md:129-141` plot.py, `241-243`
    data_export.py → res.csv).  One point per (engine, query-args) run."""
    return sorted(
        (
            {
                "engine": r["engine"],
                "qargs": r["qargs"],
                "recall_at_k": r["recall_at_k"],
                "qps": r["qps"],
                "k": r["k"],
            }
            for r in records
        ),
        key=lambda r: (r["engine"], r["qargs"]),
    )


def write_curve(spark: SparkSession, records: list[dict], dest: str) -> DataFrame:
    """Persist the curve as Parquet (the engine-native artifact) + a CSV
    twin (the reference exports res.csv for plotting, `README.md:241-243`)."""
    import pandas as pd

    curve = curve_report(records)
    df = spark.createDataFrame(
        curve,
        schema="engine STRING, qargs STRING, recall_at_k DOUBLE, qps DOUBLE, k INT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(dest)
    pd.DataFrame(curve).to_csv(dest.rstrip("/") + ".csv", index=False)
    return df
