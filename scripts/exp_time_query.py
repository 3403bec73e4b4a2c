#!/usr/bin/env python
"""Time a registry query with the bench's count() action, min-of-N.

Usage: python scripts/exp_time_query.py <query> [runs] [--noop]
Honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 3
noop = "--noop" in sys.argv
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from filter_vectordb_spark.session import get_spark  # noqa: E402
from filter_vectordb_spark.registry import QUERIES  # noqa: E402

spark = get_spark("exp_time")
spark.range(1000).count()
fn = QUERIES[name]
for i in range(runs):
    spark.sparkContext.setJobDescription(f"{name} run {i}")
    t0 = time.time()
    df = fn(spark, sf_dir)
    if noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.count()
    print(f"run {i}: {time.time() - t0:.2f}s", flush=True)
spark.stop()
