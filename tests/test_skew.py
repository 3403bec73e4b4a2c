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


def test_tag_pair_hot_pair_salted_build(spark, tmp_path):
    """VERDICT r4 #3: a pair above split_rows must be written as >1 file
    (>1 task at build AND at scan), with results identical to the
    unsalted build — the per-batch partial top-k + W3 merge absorb the
    split."""
    import glob

    from filter_vectordb_spark.index.tagpart import (
        build_tag_pair_partitions,
        tag_pair_knn,
    )
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    base = dense_vectors(spark, SF_DIR)
    q = dense_queries(spark, SF_DIR).select(
        "qid",
        "qemb",
        F.least(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_a"),
        F.greatest(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_b"),
    )
    plain_dir = str(tmp_path / "plain")
    salted_dir = str(tmp_path / "salted")
    build_tag_pair_partitions(base, plain_dir, min_freq=0.0)  # no pair splits
    # split_rows=8: every pair above 8 rows becomes a multi-file pair
    build_tag_pair_partitions(base, salted_dir, min_freq=0.0, split_rows=8)
    # the hottest pair directory must hold >1 data file after salting
    pair_dirs = glob.glob(f"{salted_dir}/tag_a=*/tag_b=*")
    max_files = max(
        len(glob.glob(f"{d}/*.parquet")) for d in pair_dirs
    )
    assert max_files > 1, "hot pair not split across tasks"
    want = (
        tag_pair_knn(spark, plain_dir, q, 5)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    got = (
        tag_pair_knn(spark, salted_dir, q, 5)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_tag_pair_knn_chunks_above_broadcast_cap(spark, tmp_path, monkeypatch):
    """VERDICT r4 #2: the flagship scale route must chunk-and-union above
    the broadcast cap instead of raising — parity with single-shot."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_pair_partitions,
        tag_pair_knn,
    )
    from filter_vectordb_spark.operators import knn as knn_mod
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    base = dense_vectors(spark, SF_DIR)
    q = dense_queries(spark, SF_DIR).select(
        "qid",
        "qemb",
        F.least(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_a"),
        F.greatest(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_b"),
    )
    out = str(tmp_path / "tp")
    # min_freq high enough that some pairs MISS (fallback path included)
    build_tag_pair_partitions(base, out, min_freq=0.01)
    want = (
        tag_pair_knn(spark, out, q, 5, base=base)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    monkeypatch.setattr(knn_mod, "MAX_BROADCAST_QUERIES", 3)
    got = (
        tag_pair_knn(spark, out, q, 5, base=base)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_tag_pair_miss_branch_matches_sig_expr_plan(spark, tmp_path):
    """VERDICT r5 #6: below-threshold pairs route through the fused
    filtered_knn_scan kernel — results must equal the visible-plan
    signature-check twin (filtered_knn_sig_expr) for every query,
    built-pair or not.  min_freq picked so SOME pairs build and SOME
    miss (both branches populated, asserted)."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_pair_partitions,
        tag_pair_knn,
    )
    from filter_vectordb_spark.operators.filtered_knn import filtered_knn_sig_expr
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    base = dense_vectors(spark, SF_DIR)
    q = dense_queries(spark, SF_DIR).select(
        "qid",
        "qemb",
        F.least(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_a"),
        F.greatest(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_b"),
    )
    out = str(tmp_path / "tp_miss")
    # threshold = the median query-pair co-occurrence frequency, computed
    # from the fixture itself, so SOME query pairs build and SOME miss
    # whatever the fixture's tag distribution
    from collections import Counter

    tag_rows = base.select("tags").toPandas()["tags"]
    cnt: Counter = Counter()
    for tags in tag_rows:
        ts = sorted(int(t) for t in tags)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                cnt[(ts[i], ts[j])] += 1
    pairs = set(map(tuple, q.select("tag_a", "tag_b").distinct().collect()))
    qfreqs = sorted(cnt[p] / len(tag_rows) for p in pairs)
    build_tag_pair_partitions(base, out, min_freq=qfreqs[len(qfreqs) // 2])
    avail = set(
        map(tuple, spark.read.parquet(out).select("tag_a", "tag_b").distinct().collect())
    )
    assert pairs - avail, "fixture regression: no query pair misses the build"
    assert pairs & avail, "fixture regression: no query pair hits the build"
    got = (
        tag_pair_knn(spark, out, q, 5, base=base)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    q_tags = q.select(
        "qid", "qemb", F.array("tag_a", "tag_b").alias("qtags")
    )
    want = (
        filtered_knn_sig_expr(q_tags, base, 5)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
