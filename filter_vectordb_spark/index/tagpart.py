"""Tag-partitioned materialized views (SURVEY.md §2.7 B2, §2.8 Q3).

The reference pre-builds a dedicated HNSW sub-index for every frequent tag
(freq ≥ 0.003) and frequent tag pair, sharing the base vector storage
(`filter/faiss/faiss.py:254-337`).  The Spark equivalent is a materialized
view partitioned by tag: the same rows, laid out so a tag-equality
predicate becomes partition pruning — "index selection" is the Catalyst
partition filter, and storage is shared because Parquet is columnar and
the view holds only (tag, id, emb) for frequent tags.

Unlike the reference (which scans the *evaluation* query log at load time
to decide which sub-indexes to build — a quirk SURVEY.md §7 says not to
reproduce), the build is driven by a declared frequency threshold over the
base data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.functions.distance import l2_sq
from filter_vectordb_spark.operators.postings import explode_tags, tag_stats
from filter_vectordb_spark.operators.topk import per_group_topk


def _frequent_tag_view(base: DataFrame, min_freq: float) -> DataFrame:
    """(tag, id, emb) for every tag with doc-frequency ≥ min_freq.

    Frequent-tag selection is a broadcast semi-join against the stats
    table, not collect+isin: at a 200k-tag vocabulary a literal IN-list
    would be a megabyte of plan; a broadcast join is not.
    """
    stats = tag_stats(base)
    frequent = stats.filter(F.col("freq") >= min_freq).select("tag")
    return (
        explode_tags(base)
        .join(F.broadcast(frequent), "tag")
        .join(base.select("id", "emb"), "id")
        .select("tag", "id", "emb")
    )


def build_tag_partitions(
    base: DataFrame,
    out_dir: str,
    min_freq: float = 0.003,
) -> list[int]:
    """Materialize the frequent-tag view, written `partitionBy("tag")`.
    Returns the built tag ids (the reference's 0.003 threshold:
    `filter/faiss/faiss.py:268`)."""
    view = _frequent_tag_view(base, min_freq)
    view.write.mode("overwrite").partitionBy("tag").parquet(out_dir)
    return sorted(r["tag"] for r in view.select("tag").distinct().collect())


def tag_partition_knn(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int,
) -> DataFrame:
    """Q3: route single-tag queries to their partition.  The join key IS
    the partition column, so the scan prunes to the query's tags only
    (verify with .explain → PartitionFilters / dynamic pruning).

    queries: (qid, qemb, qtag INT).  Returns (qid, id, dist, rank).
    """
    part = spark.read.parquet(out_dir)
    q = queries.select("qid", "qemb", F.col("qtag").alias("tag"))
    cand = part.join(F.broadcast(q), "tag")
    scored = cand.select(
        "qid", "id", l2_sq(F.col("qemb"), F.col("emb")).alias("dist")
    )
    return per_group_topk(
        scored, ["qid"], [F.col("dist").asc(), F.col("id").asc()], k
    ).select("qid", "id", "dist", "rank")
