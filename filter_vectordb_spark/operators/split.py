"""Leakage-safe train/validation/test splitting for training corpora.

A naive random split leaks: duplicate (or near-duplicate) documents land
on both sides of the train/test boundary and the eval set stops
measuring generalization.  The standard fix is to split on a CONTENT key
rather than the row id — every member of a duplicate group rides the
same key, so the whole group lands in one split.

Spark-first shape: the split is a pure, stateless, codegen'd expression
(no shuffle, no state, no RNG) —

    group_key = char_hash(sorted distinct tokens)     # dedup's key
    slot      = (group_key * MIX) mod 2^31-1 mod 100  # content-keyed slot
    split     = train | valid | test by slot ranges

Determinism is the point: the same document always lands in the same
split, across runs, machines, and engine versions — reproducible corpus
builds and a DuckDB-recomputable oracle.  At 100 TB the plan is a single
scan with zero exchanges (split assignment is embarrassingly parallel);
writing the three splits is `df.write.partitionBy("split")`.

MIX decorrelates the slot from the key's own low bits (the key is a
polynomial hash; multiplying by an odd constant then reducing mod the
Mersenne prime spreads groups uniformly over slots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filter_vectordb_spark.functions.text import HASH_P, char_hash, tokens

SLOT_MIX = 48_271  # minstd multiplier — full period mod the Mersenne prime
N_SLOTS = 100


def content_key(text: Column) -> Column:
    """The dedup content key: hash of the sorted distinct token set."""
    return char_hash(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def split_slot(key: Column) -> Column:
    """Deterministic 0..99 slot from a content key."""
    return ((key % HASH_P) * SLOT_MIX % HASH_P % N_SLOTS).cast("int")


def assign_splits(
    docs: DataFrame,
    train_pct: int = 80,
    valid_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, group_key, slot, split) — split ∈ train|valid|test by slot
    ranges [0,train) / [train,train+valid) / rest.  Content-keyed: every
    doc of a duplicate group gets the same slot, so duplicate groups
    never straddle a split boundary."""
    if not (0 < train_pct and 0 <= valid_pct and train_pct + valid_pct < N_SLOTS):
        raise ValueError("pct ranges must partition 0..99 with a non-empty test")
    key = content_key(F.col(text_col))
    out = docs.select(id_col, key.alias("group_key"))
    out = out.withColumn("slot", split_slot(F.col("group_key")))
    return out.withColumn(
        "split",
        F.when(F.col("slot") < train_pct, F.lit("train"))
        .when(F.col("slot") < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def duckdb_split_sql(key_sql: str, train_pct: int = 80, valid_pct: int = 10) -> str:
    """DuckDB expressions recomputing (slot, split) from a key expression —
    the oracle twin of assign_splits."""
    slot = f"CAST(({key_sql} % {HASH_P}) * {SLOT_MIX} % {HASH_P} % {N_SLOTS} AS INT)"
    return slot
