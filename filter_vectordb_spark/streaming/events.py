"""Structured Streaming over the events table.

The reference's streaming track is an op log (runbook.py); this module
covers the other streaming surface a Spark-native engine must offer:
continuous event-time processing with watermarks and windowed aggregates
(`readStream` → window agg → sink).  The batch-mode twin of this plan is
queries/relational.py::events_hourly, which is what the DuckDB oracle
checks; this streaming plan is verified in tests by feeding the same
parquet through the streaming engine and comparing to the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(sf_dir: str) -> tuple[T.StructType, str]:
    """Sniff the fixture's physical `ts` type from the parquet footer
    (driver generations have shipped TIMESTAMP(NANOS) and timestamp[us]);
    returns the read schema and which conversion the caller must apply.
    A streaming source needs the schema declared up front, so this is the
    one place a footer peek is unavoidable."""
    import os

    import pyarrow.parquet as pq

    ts_arrow = str(pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type)
    if ts_arrow.startswith("timestamp"):
        ts_field, conv = T.StructField("ts", T.TimestampNTZType()), "ntz"
    else:  # TIMESTAMP(NANOS) readable only as long (nanosAsLong)
        ts_field, conv = T.StructField("ts", T.LongType()), "nanos"
    return (
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                ts_field,
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        ),
        conv,
    )


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (one parquet = one microbatch
    locally; on a cluster this is a Kafka/files drip)."""
    schema, conv = _events_schema(sf_dir)
    # the file source requires a directory; glob down to the events table
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if conv == "nanos":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # naive wall time == UTC instant; wall-pure arithmetic rebuild is
    # session-tz-proof incl. DST hours (see sources/tables.py) — no
    # session-conf mutation
    from filter_vectordb_spark.sources.tables import _NTZ_AS_UTC_MICROS_SQL

    return raw.withColumn("ts", F.expr(_NTZ_AS_UTC_MICROS_SQL))


def hourly_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window count/sum per event type — late rows
    beyond the watermark are dropped instead of reopening closed windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "events_hourly_stream"
) -> DataFrame:
    """Drive the stream to completion synchronously (local smoke pattern:
    memory sink + processAllAvailable) and return the result table."""
    stream = hourly_counts_stream(read_event_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
