"""Posting-list set algebra + tag statistics (SURVEY.md §2.3 J1/J2, §2.4 A1).

The reference materializes per-tag posting lists (CSR transpose,
`filter/faiss/faiss.py:237`) and merges sorted id arrays with two-pointer
kernels (`bow_id_selector.swig:133-192`).  Spark-side, the posting table
is a first-class DataFrame derived by explode+groupBy, intersections are
`array_intersect` (or an equi-join of the exploded form — the shape that
scales when single posting lists outgrow a row), and the per-tag document
frequency that drives the reference's plan router
(`filter/faiss/faiss.py:369-371`) is a tiny stats table fit for broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_tags(base: DataFrame, id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """Long form (tag, id) — the scalable representation of the incidence
    matrix; at 100 TB this is the shape joins and stats run on."""
    return base.select(
        F.explode(F.col(tags_col)).alias("tag"), F.col(id_col).alias("id")
    )


def build_postings(base: DataFrame, id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """(tag INT, ids ARRAY<BIGINT> sorted asc) — per-tag posting lists
    (`filter/faiss/faiss.py:237` meta_b.T).  Array form is for parity /
    small-vocab fixtures; prefer the exploded long form for huge tags."""
    return (
        explode_tags(base, id_col, tags_col)
        .groupBy("tag")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )


def tag_stats(base: DataFrame, id_col: str = "id", tags_col: str = "tags") -> DataFrame:
    """(tag, ndoc, freq) document-frequency stats (A1,
    `filter/faiss/faiss.py:238-239`); drives the selectivity router."""
    n = base.count()
    return (
        explode_tags(base, id_col, tags_col)
        .groupBy("tag")
        .agg(F.count("*").alias("ndoc"))
        .withColumn("freq", F.col("ndoc") / F.lit(float(n)))
    )


def intersect_postings(postings: DataFrame, tag_a: int, tag_b: int) -> DataFrame:
    """J1: sorted intersection of two posting lists → one row
    (ids ARRAY<BIGINT>).  `array_intersect` preserves the order of the
    first (sorted) argument, matching the two-pointer merge's output
    (`bow_id_selector.swig:133-161`)."""
    a = postings.filter(F.col("tag") == tag_a).select(F.col("ids").alias("a"))
    b = postings.filter(F.col("tag") == tag_b).select(F.col("ids").alias("b"))
    return a.crossJoin(b).select(F.array_intersect("a", "b").alias("ids"))


def union_postings(postings: DataFrame, tag_a: int, tag_b: int) -> DataFrame:
    """J2: sorted dedup'd union (`bow_id_selector.swig:163-192`)."""
    a = postings.filter(F.col("tag") == tag_a).select(F.col("ids").alias("a"))
    b = postings.filter(F.col("tag") == tag_b).select(F.col("ids").alias("b"))
    return a.crossJoin(b).select(F.array_sort(F.array_union("a", "b")).alias("ids"))


def conjunctive_candidates(
    queries: DataFrame,
    base: DataFrame,
    q_id: str = "qid",
    q_tags: str = "qtags",
    b_id: str = "id",
    b_tags: str = "tags",
) -> DataFrame:
    """(qid, id) pairs where the doc's tag set contains ALL query tags —
    the distributed form of posting-list intersection driven by a query
    batch (reference F1+J1, `filter/faiss/faiss.py:387-388`).

    Plan: explode both sides, equi-join on tag, count matches per (qid,id),
    keep rows matching the full conjunction.  The exploded query side is
    tiny → broadcast; the exploded base side never leaves its scan until
    reduced to matching pairs.
    """
    qx = queries.select(
        F.col(q_id).alias("qid"),
        F.size(F.col(q_tags)).alias("nq_tags"),
        F.explode(F.col(q_tags)).alias("tag"),
    )
    bx = base.select(F.col(b_id).alias("id"), F.explode(F.col(b_tags)).alias("tag"))
    return (
        bx.join(F.broadcast(qx), "tag")
        .groupBy("qid", "id", "nq_tags")
        .agg(F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == F.col("nq_tags"))
        .select("qid", "id")
    )
