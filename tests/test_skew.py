"""Skew utilities: salted plans must be value-identical to plain plans."""

from __future__ import annotations

import pyspark.sql.functions as F

from filter_vectordb_spark.operators.skew import replicated_skew_join, salted_agg
from filter_vectordb_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_salted_count_matches_plain(spark):
    """Hot-key aggregation (exploded tags: label tags cover ~10% each)."""
    from filter_vectordb_spark.operators.postings import explode_tags
    from filter_vectordb_spark.sources.vectors import dense_vectors

    x = explode_tags(dense_vectors(spark, SF_DIR))
    plain = {r["tag"]: r["c"] for r in x.groupBy("tag").agg(F.count("*").alias("c")).collect()}
    salted = {
        r["tag"]: r["count_value"]
        for r in salted_agg(x, "tag", F.lit(1), agg="count").collect()
    }
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    l = load_table(spark, "lineitem", SF_DIR)
    plain = {
        r["l_returnflag"]: r["s"]
        for r in l.groupBy("l_returnflag")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: r["sum_value"]
        for r in salted_agg(
            l, "l_returnflag", F.round(F.col("l_quantity") * 100).cast("long"), agg="sum"
        ).collect()
    }
    assert salted == plain


def test_replicated_join_matches_plain(spark):
    l = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", SF_DIR).selectExpr(
        "o_orderkey AS l_orderkey", "o_orderstatus"
    )
    plain = l.join(o, "l_orderkey").groupBy("o_orderstatus").count()
    skewed = replicated_skew_join(l, o, "l_orderkey").groupBy("o_orderstatus").count()
    p = {r["o_orderstatus"]: r["count"] for r in plain.collect()}
    s = {r["o_orderstatus"]: r["count"] for r in skewed.collect()}
    assert p == s
