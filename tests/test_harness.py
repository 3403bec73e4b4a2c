"""Harness lifecycle tests: config-driven run loop, best-of-N timing,
recall evaluation, results sink."""

from __future__ import annotations

import json
import os

from filter_vectordb_spark.harness.runner import load_config, run_benchmark
from tests.conftest import SF_DIR

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "engines.yaml")


def test_run_benchmark_end_to_end(spark, tmp_path):
    config = load_config(FIXTURE)
    out = str(tmp_path / "results")
    records = run_benchmark(spark, config, SF_DIR, out_dir=out, k=10)
    assert len(records) == 9  # 2 bf + 2 ivf + 1 filtered + 1 lsh + 3 sparse
    by_engine = {}
    for r in records:
        by_engine.setdefault(r["engine"], []).append(r)
    # exact engines must have recall 1.0
    for r in by_engine["bruteforce"]:
        assert r["recall_at_k"] == 1.0
    # sparse exact config has recall 1.0; truncated configs can only lose
    sp = by_engine["sparse"]
    assert max(r["recall_at_k"] for r in sp) == 1.0
    # lsh is approximate but must find something
    assert by_engine["lsh"][0]["recall_at_k"] > 0.2
    # full-probe ivf exact; reduced probe can only lose recall
    ivf = sorted(by_engine["ivf"], key=lambda r: r["attrs"]["nprobe"])
    assert ivf[-1]["recall_at_k"] == 1.0
    assert ivf[0]["recall_at_k"] <= 1.0
    for r in records:
        assert r["best_query_s"] > 0
    # S6 sink: parquet + attrs sidecar per run point
    sidecars = [f for f in os.listdir(out) if f.endswith(".attrs.json")]
    assert len(sidecars) == 9
    with open(os.path.join(out, sidecars[0])) as f:
        attrs = json.load(f)
    assert {"engine", "best_query_s", "recall_at_k", "attrs"} <= set(attrs)
    # results parquet is readable and well-formed
    dirs = [f for f in os.listdir(out) if not f.endswith(".json")]
    df = spark.read.parquet(os.path.join(out, dirs[0]))
    assert set(df.columns) == {"qid", "rank", "id"}
    assert df.count() > 0
