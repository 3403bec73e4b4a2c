"""Fixture-table loaders (S1-S3 analog).

The reference loads fixed-schema binary matrices through a dataset registry
(`ood/diskann/diskann-in-mem.py:63-64`, `streaming/run.py:15-17`); here the
fixtures are the driver's parquet tables and the "registry" is an explicit
schema map.  Schemas are declared, never inferred, mirroring the
reference's fixed-schema model (SURVEY.md §1.2).

Parquet scans are the one true source: Catalyst pushes projections and
predicates into them, which at 100 TB is the difference between reading a
column slice and reading everything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events.parquet and normalize `ts` to a session-UTC TIMESTAMP.

    The fixture's physical type has varied across driver generations:
    TIMESTAMP(NANOS) (Spark refuses it unless
    `spark.sql.legacy.parquet.nanosAsLong` is on, then surfaces BIGINT) and
    plain timestamp[us] without timezone (surfaces TIMESTAMP_NTZ).  Every
    variant is normalized to the microsecond TIMESTAMP view DuckDB
    presents, so oracle instants are identical regardless of which fixture
    generation and which caller's session we get.
    """
    from pyspark.sql import functions as F

    # Left set for the session: the physical reader re-reads this conf when
    # the action runs, so reverting it after analysis would break execution.
    # It only changes how NANOS-typed parquet columns surface, nothing else.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # nanos-as-long: ns → µs instant
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # The naive wall time IS the UTC instant (the oracle compares UTC
        # instants).  Decompose the NTZ into wall-pure date/time parts and
        # rebuild the epoch arithmetically: every component (date, hour,
        # minute, fractional second) is extracted from the wall clock, so
        # the result is identical under ANY caller session timezone —
        # including its DST transition hours, where any wall→instant cast
        # roundtrip is lossy (the repeated fall-back hour is ambiguous).
        df = df.withColumn("ts", F.expr(_NTZ_AS_UTC_MICROS_SQL))
    return df


#: NTZ wall clock → UTC-instant TIMESTAMP, session-timezone-proof (see
#: _load_events; also used by the streaming events source)
_NTZ_AS_UTC_MICROS_SQL = (
    "timestamp_micros(unix_date(cast(ts as date)) * 86400000000L"
    " + hour(ts) * 3600000000L + minute(ts) * 60000000L"
    " + cast(extract(second from ts) * 1000000 as long))"
)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
