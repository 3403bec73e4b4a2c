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
    # see build_tag_pair_partitions: one shuffle partition per tag keeps
    # the partitioned layout at one file per tag instead of tags × tasks
    view.repartition("tag").write.mode("overwrite").partitionBy("tag").parquet(out_dir)
    return sorted(r["tag"] for r in view.select("tag").distinct().collect())


def build_tag_pair_partitions(
    base: DataFrame,
    out_dir: str,
    min_freq: float = 0.003,
) -> None:
    """B2 pair half: materialize (tag_a, tag_b, id, emb) for every tag
    PAIR whose co-occurrence count ≥ min_freq·n — the reference prebuilds
    HNSW sub-indexes for exactly these pairs
    (`filter/faiss/faiss.py:289-337`, threshold `:308`).  Written
    `partitionBy("tag_a", "tag_b")` so a 2-tag query is partition pruning.
    """
    x = explode_tags(base).select("id", "tag")
    pairs = (
        x.withColumnRenamed("tag", "tag_a")
        .join(x.withColumnRenamed("tag", "tag_b"), "id")
        .filter(F.col("tag_a") < F.col("tag_b"))
    )
    n = base.count()
    freq = (
        pairs.groupBy("tag_a", "tag_b")
        .agg(F.count("*").alias("ndoc"))
        .filter(F.col("ndoc") >= min_freq * n)
        .select("tag_a", "tag_b")
    )
    view = (
        pairs.join(F.broadcast(freq), ["tag_a", "tag_b"])
        .join(base.select("id", "emb"), "id")
        .select("tag_a", "tag_b", "id", "emb")
    )
    # one shuffle partition per pair before the partitioned write: without
    # it every writer task emits a sliver into every pair directory
    # (pairs × tasks small files — 9k at the 100k benchmark, and file
    # enumeration then dominates every read)
    view.repartition("tag_a", "tag_b").write.mode("overwrite").partitionBy(
        "tag_a", "tag_b"
    ).parquet(out_dir)


def tag_pair_knn(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int,
    base: DataFrame | None = None,
) -> DataFrame:
    """Q3 for 2-tag queries: route each query's ordered tag pair to its
    partition of the pair view; pairs below the build threshold (no
    sub-index — the reference falls back to its single-tag plans there,
    `filter/faiss/faiss.py:404-418`) take the exact sig-prefiltered scan
    over `base` instead, so the union is exact for every query.

    queries: (qid, qemb, tag_a INT, tag_b INT) with tag_a < tag_b.
    Returns (qid, id, dist, rank).
    """
    from filter_vectordb_spark.operators.filtered_knn import filtered_knn_sig_expr

    import numpy as np

    from filter_vectordb_spark.operators.knn import MAX_BROADCAST_QUERIES

    part = spark.read.parquet(out_dir)
    # The pair listing is bounded by the build threshold (≥ min_freq·n
    # co-occurrence ⇒ at most ~1/min_freq · pairs-per-doc entries), so it
    # is driver-material like the IVF centroid table; the query side is
    # collected below anyway (cap-guarded).  Splitting hit/miss here
    # avoids running the miss branch's full-corpus scan when every query
    # has a pair view — at 100 TB that branch is the expensive one.
    avail_pdf = part.select("tag_a", "tag_b").distinct().toPandas()
    avail_set = set(zip(avail_pdf["tag_a"].astype(int), avail_pdf["tag_b"].astype(int)))

    # Score with per-pair BLAS blocks, not a candidate equi-join: joining
    # qemb onto every candidate row ships nq × |pair| duplicate query
    # vectors through Arrow (2 GB at the 100k benchmark); broadcasting the
    # grouped query matrices ships each once.  Per batch and pair:
    # X @ Q_pair.T, partial top-k per query — the W3 two-phase shape.
    qall = queries.select("qid", "qemb", "tag_a", "tag_b").toPandas()
    if len(qall) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"query side has {len(qall)} rows > broadcast cap {MAX_BROADCAST_QUERIES}; "
            "partition the query set and union the results"
        )
    hit_mask = [
        (int(a), int(b)) in avail_set
        for a, b in zip(qall["tag_a"], qall["tag_b"])
    ]
    import pandas as pd

    qpdf = qall[pd.Series(hit_mask, index=qall.index)]
    miss_pdf = qall[~pd.Series(hit_mask, index=qall.index)]
    by_pair: dict = {}
    for pair, grp in qpdf.groupby(["tag_a", "tag_b"]):
        by_pair[(int(pair[0]), int(pair[1]))] = (
            grp["qid"].to_numpy(dtype=np.int64),
            np.stack(grp["qemb"].to_numpy()).astype(np.float64),
        )
    bc = spark.sparkContext.broadcast(by_pair)

    def score(it):
        import pandas as pd

        groups = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_d = [], [], []
            for pair, grp in pdf.groupby(["tag_a", "tag_b"]):
                qg = groups.get((int(pair[0]), int(pair[1])))
                if qg is None:
                    continue
                qids, Q = qg
                ids = grp["id"].to_numpy(dtype=np.int64)
                X = np.stack(grp["emb"].to_numpy()).astype(np.float64)
                D = (
                    (X * X).sum(1)[:, None]
                    - 2.0 * (X @ Q.T)
                    + (Q * Q).sum(1)[None, :]
                )
                np.maximum(D, 0.0, out=D)
                kk = min(k, len(ids))
                if kk < len(ids):
                    cand = np.argpartition(D, kk - 1, axis=0)[:kk, :]
                else:
                    cand = np.tile(np.arange(len(ids))[:, None], (1, len(qids)))
                for j in range(len(qids)):
                    sel = cand[:, j][np.lexsort((ids[cand[:, j]], D[cand[:, j], j]))]
                    out_q.append(np.full(kk, qids[j], dtype=np.int64))
                    out_i.append(ids[sel])
                    out_d.append(D[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "id": np.concatenate(out_i),
                        "dist": np.concatenate(out_d),
                    }
                )

    # base-side pruning stays a broadcast JOIN on the partition columns
    # (partition pruning via dynamic filter), never a literal IN-list
    hit_pairs = spark.createDataFrame(
        sorted({(int(a), int(b)) for a, b in zip(qpdf["tag_a"], qpdf["tag_b"])})
        or [(-1, -1)],
        "tag_a INT, tag_b INT",
    )
    pruned = part.join(F.broadcast(hit_pairs), ["tag_a", "tag_b"])
    scored = pruned.select("tag_a", "tag_b", "id", "emb").mapInPandas(
        score, schema="qid long, id long, dist double"
    )
    hits = per_group_topk(
        scored, ["qid"], [F.col("dist").asc(), F.col("id").asc()], k
    ).select("qid", "id", "dist", "rank")
    if base is None or len(miss_pdf) == 0:
        return hits
    miss_q = queries.join(
        F.broadcast(
            spark.createDataFrame(
                sorted({(int(a), int(b)) for a, b in zip(miss_pdf["tag_a"], miss_pdf["tag_b"])}),
                "tag_a INT, tag_b INT",
            )
        ),
        ["tag_a", "tag_b"],
        "left_semi",
    ).select("qid", "qemb", F.array("tag_a", "tag_b").alias("qtags"))
    misses = filtered_knn_sig_expr(miss_q, base, k).select("qid", "id", "dist", "rank")
    return hits.unionByName(misses)


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
