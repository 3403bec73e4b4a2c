#!/usr/bin/env python
"""Per-step wall profile of the 1M streaming replays (VERDICT r11 #6):
wraps the StreamingReplayer methods with timers, runs the registered
query's replay, and prints where the wall goes (flush/anti-join,
localCheckpoint, per-search execution, consolidation).

Usage: SPARK_GRAFT_CPUS=32 python scripts/exp_replay_steps.py [clustered]
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

clustered = len(sys.argv) > 1 and sys.argv[1] == "clustered"

from pyspark.sql import functions as F  # noqa: E402

from filter_vectordb_spark.session import get_spark  # noqa: E402
from filter_vectordb_spark.registry import QUERIES  # noqa: E402
from filter_vectordb_spark.streaming import runbook as rbmod  # noqa: E402

spark = get_spark("exp_replay_steps")
spark.range(1000).count()

T = defaultdict(float)
N = defaultdict(int)


def wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        T[name] += time.perf_counter() - t0
        N[name] += 1
        return out

    setattr(cls, name, timed)
    return orig


RP = rbmod.StreamingReplayer
for m in ("_flush", "_truncate_lineage", "insert", "delete_range", "search"):
    wrap(RP, m)

name = "streaming_replay_1m_clustered" if clustered else "streaming_replay_1m"
qfn = QUERIES[name]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
for run in range(2):
    T.clear()
    N.clear()
    spark.sparkContext.setJobDescription(f"{name} profiled run {run}")
    t0 = time.perf_counter()
    df = qfn(spark, sf)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.count()
    t_count = time.perf_counter() - t0
    print(f"run {run}: build {t_build:.2f}s count {t_count:.2f}s", flush=True)
    for k in sorted(T, key=T.get, reverse=True):
        print(f"  {k:18s} {T[k]:7.2f}s  x{N[k]}", flush=True)
spark.stop()
