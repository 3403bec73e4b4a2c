#!/usr/bin/env python
"""A/B experiment: dedup_jaccard_pairs wall at a given core count.

Usage: python scripts/exp_jaccard.py <cpus> [runs]
Prints per-run noop-sink seconds (full plan, nothing pruned) plus the
bench-protocol count() seconds for comparability with BENCH history.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

from filter_vectordb_spark.session import get_spark  # noqa: E402
from filter_vectordb_spark.registry import QUERIES  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp_jaccard", cpus=cpus)

# JVM warm-up (the bench does the same before timing)
spark.range(1000).count()

fn = QUERIES["dedup_jaccard_pairs"]
for i in range(runs):
    spark.sparkContext.setJobDescription(f"jaccard noop run {i}")
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"noop run {i}: {time.time() - t0:.2f}s", flush=True)
for i in range(2):
    spark.sparkContext.setJobDescription(f"jaccard count run {i}")
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    print(f"count run {i}: {time.time() - t0:.2f}s rows={n}", flush=True)
spark.stop()
