"""Sparse top-k MIPS (SURVEY.md §2.8 Q5/Q6, §2.4 A3, §2.2 F6, §2.5 W4).

The reference's sparse track scores SPLADE vectors by inner product via an
inverted index (linscan, `sparse/linscan/linscan.py:44-56`) or sparse
matmul (`sparse/spmat/spmat.py:53-74`).  The Spark-native logical plan is
identical for both physical strategies there: explode query and document
sparse vectors to long form, equi-join on dimension, weighted-sum
groupBy — i.e. the inverted index IS the shuffle-partitioned long form.

Here the fixture corpus is `documents.text`; term-frequency bag-of-words
gives integer weights, so scores are exact integers and ties resolve
identically on Spark and the DuckDB oracle (id-ascending).

Scale posture: the query side (a few thousand rows × ~50 nnz) broadcasts;
the document long form never shuffles before being reduced to (qid, id)
partial sums — map-side join + partial aggregation.  Frequent-term skew
is irrelevant under a broadcast join (no shuffle by term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filter_vectordb_spark.operators.topk import per_group_topk


def docs_to_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Long-form sparse vectors (id, term, w) with term-frequency weights —
    the reference's CSR rows (`filter/faiss/faiss.py:63-73`) as a DataFrame."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count("*").alias("w"))
    )


def sparsify_alpha(qterms: DataFrame, alpha: float) -> DataFrame:
    """F6 `largest_elements` (`sparse/spmat/spmat.py:16-28`): keep the
    minimal set of largest components whose mass ≥ α·total.  α=1 ⇒ identity.

    Ordering (w desc, term asc) is total, so the prefix is deterministic.
    """
    w_tot = Window.partitionBy("qid")
    w_ord = (
        Window.partitionBy("qid")
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        qterms.withColumn("total", F.sum("w").over(w_tot))
        .withColumn("running", F.sum("w").over(w_ord))
        # keep rows whose predecessor-cumsum is still below the target mass
        .filter((F.col("running") - F.col("w")) < F.lit(alpha) * F.col("total"))
        .drop("total", "running")
    )


def budget_truncate(qterms: DataFrame, m: int) -> DataFrame:
    """W4 budget surrogate: the reference's linscan stops scanning posting
    lists when a time budget runs out (`sparse/linscan/linscan.py:41-42`);
    the deterministic Spark counterpart scores only the top-m query
    dimensions by weight (heaviest posting lists first, like linscan's
    ordering)."""
    w = Window.partitionBy("qid").orderBy(F.col("w").desc(), F.col("term").asc())
    return (
        qterms.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= m)
        .drop("_r")
    )


def sparse_topk(qterms: DataFrame, dterms: DataFrame, k: int) -> DataFrame:
    """Top-k maximum inner product: join on term, accumulate, rank (A3+W1).

    qterms: (qid, term, w) — broadcast side.  dterms: (id, term, w).
    Returns (qid, id, score BIGINT, rank INT).
    """
    q = qterms.select(F.col("qid"), F.col("term"), F.col("w").alias("qw"))
    d = dterms.select(F.col("id"), F.col("term"), F.col("w").alias("dw"))
    scored = (
        d.join(F.broadcast(q), "term")
        .groupBy("qid", "id")
        .agg(F.sum(F.col("qw") * F.col("dw")).alias("score"))
    )
    return per_group_topk(
        scored, ["qid"], [F.col("score").desc(), F.col("id").asc()], k
    ).select("qid", "id", "score", "rank")
