"""Hyperplane-LSH cosine ANN: recall + pruning properties (the reference's
recall-vs-ground-truth methodology, SURVEY.md §5)."""

from __future__ import annotations

import pytest

from filter_vectordb_spark.index.lsh import lsh_bucket_table, lsh_cosine_knn
from filter_vectordb_spark.operators.knn import knn_join
from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors
from tests.conftest import SF_DIR

K = 10
DIM = 64


@pytest.fixture(scope="module")
def base(spark):
    return dense_vectors(spark, SF_DIR).select("id", "emb").cache()


@pytest.fixture(scope="module")
def queries(spark):
    return dense_queries(spark, SF_DIR).cache()


def test_recall_reasonable(spark, base, queries):
    exact = knn_join(queries, base, K, metric="cos").select("qid", "id")
    approx = lsh_cosine_knn(queries, base, K, DIM).select("qid", "id")
    e = set(map(tuple, exact.toPandas().values))
    a = set(map(tuple, approx.toPandas().values))
    recall = len(a & e) / len(e)
    # 16-bit hyperplane LSH on 64-d data: nearest-self always co-buckets,
    # neighbors mostly do; pin a floor so regressions surface
    assert recall >= 0.4, recall


def test_self_always_found(spark, base, queries):
    """A query identical to a base vector shares every band bucket, so the
    self-match must always rank first."""
    res = lsh_cosine_knn(queries, base, K, DIM).toPandas()
    top1 = res[res["rank"] == 1]
    assert (top1["qid"] == top1["id"]).all()


def test_bucket_table_shape(spark, base):
    bt = lsh_bucket_table(base, DIM)
    n = base.count()
    assert bt.count() == n * 4  # N_BANDS rows per vector
    # bands are salted: no bucket key collides across bands
    import pyspark.sql.functions as F

    assert bt.select(F.shiftright("bucket", 32).alias("b")).distinct().count() == 4
