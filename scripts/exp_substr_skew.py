#!/usr/bin/env python
"""Hot-key skew micro-fixture for the substring-window shape (VERDICT
r11 #3 "done" criterion): a corpus where a handful of docs are giant
whitespace runs — ONE 30-char window repeated ~1M times within a few
docs — plus a normal tail.  Times the r11 shape (count(*) OVER win on
raw occurrence rows: the hot key's every occurrence lands in one
WindowExec buffer) against the r12 shape ((win, doc_id) collapse under
the same exchange) at the current core count, and checks the outputs
match exactly.

Usage: SPARK_GRAFT_CPUS=32 python scripts/exp_substr_skew.py [reps_m]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 1_000_000

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from filter_vectordb_spark.session import get_spark  # noqa: E402
from filter_vectordb_spark.queries.textpipe import (  # noqa: E402
    _SUBSTR_L,
    _substring_windows,
)

spark = get_spark("exp_substr_skew")
spark.range(1000).count()
L = _SUBSTR_L

# 4 hot docs: ' ' * (reps + L - 1) → reps identical all-space windows
# each; 20k normal docs of distinct-ish text
hot = spark.range(4).select(
    (F.col("id") + 1_000_000).alias("doc_id"),
    F.concat(F.lit(" " * (L - 1)), F.repeat(F.lit(" "), reps)).alias("text"),
)
normal = spark.range(20_000).select(
    F.col("id").alias("doc_id"),
    F.concat(
        F.lit("doc "),
        F.col("id").cast("string"),
        F.repeat(F.concat(F.lit(" x"), F.col("id").cast("string")), 40),
    ).alias("text"),
)
docs = hot.unionAll(normal)

win = F.expr(f"substring(text, i, {L})").alias("win")


def old_shape(docs):
    w = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.expr(
                f"CASE WHEN length(text) >= {L} THEN"
                f" sequence(1, length(text) - {L} + 1)"
                f" ELSE array() END"
            )
        ).alias("i"),
    ).select("doc_id", win)
    wn = w.withColumn("n", F.count("*").over(Window.partitionBy("win")))
    d = wn.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_windows"),
    )
    return d.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        (F.col("n_dup_windows") * 5 > F.col("n_windows")).alias("substring_dup"),
    )


def time_noop(df, label, runs=2):
    ts = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{label} run {i}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    print(f"{label}: {[round(t, 2) for t in ts]} min {min(ts):.2f}s", flush=True)


new_df = _substring_windows(docs, win)
old_df = old_shape(docs)
a = sorted(map(tuple, new_df.collect()))
b = sorted(map(tuple, old_df.collect()))
print(f"rows: {len(a)}, identical: {a == b}", flush=True)
time_noop(new_df, "r12_collapse")
time_noop(old_df, "r11_window_raw")
spark.stop()
