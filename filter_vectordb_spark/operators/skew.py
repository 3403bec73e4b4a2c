"""Skew-mitigation utilities (SURVEY.md §4 'Batching & thread parallelism',
brief: 'skewed keys → salting or AQE skew-join').

AQE's skew-join splitting (enabled in session.py) handles sort-merge join
skew at runtime; these helpers cover the cases AQE does not: skewed
AGGREGATIONS (one hot group key melting a single reducer) and skewed
shuffle joins where the small side can be replicated.

Salted aggregation = two-phase: group on (key, salt) with salt =
deterministic hash of a row-unique column mod n_salts (map-side spread),
then re-aggregate by key.  Works for any algebraic aggregate; exposed
here for count/sum which cover the engine's stats paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    value: Column,
    agg: str = "sum",
    salt_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregate: returns (key, <agg>_value).

    agg ∈ {sum, count}.  salt_col names a row-distinguishing column used
    to derive a deterministic salt (defaults to a hash of all columns).
    """
    salt_src = F.col(salt_col) if salt_col else F.concat_ws("§", *df.columns)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    if agg == "count":
        partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_v"))
    elif agg == "sum":
        partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_v"))
    else:
        raise ValueError("agg must be 'sum' or 'count'")
    return partial.groupBy(key).agg(F.sum("_v").alias(f"{agg}_value"))


def replicated_skew_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner join where `large` has hot keys: salt the large side with a
    deterministic per-row salt, replicate the small side n_salts times,
    and join on (key, salt) — every hot key spreads over n_salts reducers.

    Result is identical to large ⋈ small on key (tested).  Prefer
    F.broadcast(small) when small fits in memory; this is for the middle
    regime where it does not but skew still bites.
    """
    spark = large.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    big = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*large.columns), F.lit(n_salts)).cast("int")
    )
    rep = small.crossJoin(salts)
    return big.join(rep, [key, "_salt"]).drop("_salt")
