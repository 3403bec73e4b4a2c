"""Signature pre-filter invariants (reference F2, `bow_id_selector.swig:107-130`):
bloom semantics — false positives allowed, false negatives impossible."""

from __future__ import annotations

import pyspark.sql.functions as F

from filter_vectordb_spark.functions.signature import sig_from_tags, sig_matches
from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors
from tests.conftest import SF_DIR


def test_no_false_negatives(spark):
    base = dense_vectors(spark, SF_DIR)
    queries = dense_queries(spark, SF_DIR).withColumn(
        "qmask", sig_from_tags(F.col("qtags"))
    )
    pairs = base.crossJoin(F.broadcast(queries))
    true_match = F.size(F.array_intersect("tags", "qtags")) == F.size("qtags")
    sig_ok = sig_matches(F.col("sig"), F.col("qmask"))
    # every true match must pass the signature test
    violations = pairs.filter(true_match & ~sig_ok).count()
    assert violations == 0


def test_prefilter_rejects_something(spark):
    base = dense_vectors(spark, SF_DIR)
    queries = dense_queries(spark, SF_DIR).withColumn(
        "qmask", sig_from_tags(F.col("qtags"))
    )
    pairs = base.crossJoin(F.broadcast(queries))
    n_total = pairs.count()
    n_pass = pairs.filter(sig_matches(F.col("sig"), F.col("qmask"))).count()
    assert n_pass < n_total  # it actually prunes
