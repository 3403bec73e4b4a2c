"""Custom stateful streaming operator via applyInPandasWithState.

The reference's streaming track keeps per-key mutable state inside its
index (insert/delete counters, tombstones); the general Spark surface for
arbitrary keyed state in a stream is `applyInPandasWithState`.  This
module implements a running per-user activity tracker: for every incoming
event batch, each user's state (event count, value sum in cents, last
seen) is updated and the new totals are emitted — the streaming analog of
an upsertable aggregate table, and the plumbing template for any custom
stateful operator (counters, dedup-within-stream, incremental sketches).

Deterministic and batch-testable: driving the fixture parquet through a
memory sink must reproduce the batch groupBy exactly (see
tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value_cents BIGINT, last_epoch BIGINT"
STATE_SCHEMA = "n BIGINT, s BIGINT, last BIGINT"


def _track_user(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, s, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += int(round(pdf["value"].astype(float).mul(100)).sum())
        last = max(last, int(pdf["sec"].max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value_cents": [s],
            "last_epoch": [last],
        }
    )


def user_activity_stream(events: DataFrame) -> DataFrame:
    """events(ts TIMESTAMP, user_id, value) → running per-user totals."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        "value",
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_activity_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "user_activity"
) -> DataFrame:
    """Drive the stateful stream over the fixture events synchronously."""
    from filter_vectordb_spark.streaming.events import read_event_stream

    stream = user_activity_stream(read_event_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode may emit a row per microbatch; the final state per user
    # is the row with the highest event count
    out = spark.sql(f"SELECT * FROM {query_name}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
