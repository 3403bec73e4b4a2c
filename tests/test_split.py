"""Leakage-safe corpus split tests (operators/split.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from filter_vectordb_spark.operators.split import assign_splits
from filter_vectordb_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR)


def test_split_covers_every_doc_once(spark, docs):
    out = assign_splits(docs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    assert set(r.split for r in out.select("split").distinct().collect()) <= {
        "train", "valid", "test"
    }


def test_duplicate_groups_never_straddle(spark, docs):
    """Every doc with the same content key lands in the same split —
    the leakage guarantee."""
    out = assign_splits(docs)
    multi = (
        out.groupBy("group_key")
        .agg(F.countDistinct("split").alias("ns"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert multi.count() > 0  # fixture has dup groups — the test is live
    assert multi.filter(F.col("ns") > 1).count() == 0


def test_split_is_deterministic(spark, docs):
    a = assign_splits(docs)
    b = assign_splits(docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_proportions_roughly_hold(spark, docs):
    """Slots are uniform-ish over content groups: train gets the bulk.
    (Proportions are per GROUP, not per doc; loose bounds.)"""
    out = assign_splits(docs)
    frac = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(frac.values())
    assert frac.get("train", 0) / total > 0.6
    assert frac.get("test", 0) / total > 0.02


def test_bad_percents_rejected(spark, docs):
    with pytest.raises(ValueError):
        assign_splits(docs, train_pct=95, valid_pct=10)


def test_mix_allocation_sums_to_budget_exactly(spark):
    """Largest-remainder allocation: Σ alloc == budget, every share within
    1 of its exact proportional value."""
    from filter_vectordb_spark import registry
    from tests.conftest import SF_DIR

    pdf = registry.QUERIES["corpus_mix_allocation"](spark, SF_DIR).toPandas()
    B = 100_000
    assert int(pdf["alloc_tokens"].sum()) == B
    T = int(pdf["n_tokens"].sum())
    for _, row in pdf.iterrows():
        exact = B * int(row["n_tokens"]) / T
        assert abs(int(row["alloc_tokens"]) - exact) < 1.0
