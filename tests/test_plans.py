"""Plan-shape regression tests: pushdown, broadcast, codegen, pruning.

These pin the properties that make the engine viable at 100 TB — value
correctness is covered by the oracle suite; this file fails when a plan
silently degrades (lost pushdown, join strategy flip, pruning loss)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from filter_vectordb_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_partition_pruned,
    assert_pushed_filters,
    assert_whole_stage_codegen,
    physical_plan,
)
from filter_vectordb_spark.queries import relational as rel
from tests.conftest import SF_DIR


def test_q6_filters_reach_the_scan(spark):
    """TPC-H Q6 is the pushdown showcase: shipdate + quantity predicates
    must appear in the parquet scan's PushedFilters."""
    df = rel.q6_forecast_revenue(spark, SF_DIR)
    assert_pushed_filters(df, "l_shipdate", "l_quantity")
    assert_whole_stage_codegen(df)


def test_q6_scan_prunes_columns(spark):
    plan = physical_plan(rel.q6_forecast_revenue(spark, SF_DIR))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_returnflag" not in scan and "l_orderkey" not in scan, scan


def test_q3_broadcasts_the_dims(spark):
    df = rel.q3_shipping_priority(spark, SF_DIR)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)


def test_q5_snowflake_is_all_broadcast(spark):
    df = rel.q5_region_revenue(spark, SF_DIR)
    assert_broadcast_join(df, at_least=4)
    assert_no_cartesian(df)


def test_filtered_knn_meta_has_no_cartesian(spark):
    from filter_vectordb_spark.operators.filtered_knn import (
        filtered_knn_metadata_first,
    )
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    df = filtered_knn_metadata_first(
        dense_queries(spark, SF_DIR), dense_vectors(spark, SF_DIR), 10
    )
    assert_no_cartesian(df)
    assert_broadcast_join(df, at_least=2)  # query tags + query embeddings


def test_sparse_mips_broadcasts_queries(spark):
    from filter_vectordb_spark.operators.sparse import docs_to_terms, sparse_topk
    from filter_vectordb_spark.sources.tables import load_table

    dterms = docs_to_terms(load_table(spark, "documents", SF_DIR))
    qterms = dterms.filter(F.col("id") < 5).withColumnRenamed("id", "qid")
    df = sparse_topk(qterms, dterms, 10)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)


def test_tag_partition_scan_is_pruned(spark, tmp_path):
    """Single-tag search over the partitioned view must prune partitions
    (static or dynamic) rather than scan all tags."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_partitions,
        tag_partition_knn,
    )
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    out = str(tmp_path / "tp")
    build_tag_partitions(dense_vectors(spark, SF_DIR), out, min_freq=0.0)
    q = dense_queries(spark, SF_DIR).select(
        "qid", "qemb", F.col("qtags")[0].alias("qtag")
    )
    df = tag_partition_knn(spark, out, q, 5)
    assert_partition_pruned(df)


def test_filtered_knn_router_has_no_literal_id_inlist(spark):
    """The selectivity router must split the query batch with a
    broadcast-joined boolean flag, NOT a collected `qid IN (...)` literal
    list — at 100k queries an IN-list is megabytes of plan."""
    from filter_vectordb_spark.operators.filtered_knn import filtered_knn
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    df = filtered_knn(dense_queries(spark, SF_DIR), dense_vectors(spark, SF_DIR), 5)
    plan = physical_plan(df)
    assert "qid#" in plan  # sanity: the column exists in the plan text
    assert " IN (" not in plan and "qid IN" not in plan, plan
    assert_no_cartesian(df)


def test_tag_partition_build_has_no_literal_tag_inlist(spark, tmp_path):
    """Frequent-tag selection in the partition build must be a broadcast
    semi-join against the stats table, not collect+isin."""
    from filter_vectordb_spark.index.tagpart import _frequent_tag_view
    from filter_vectordb_spark.sources.vectors import dense_vectors

    view = _frequent_tag_view(dense_vectors(spark, SF_DIR), min_freq=0.0)
    plan = physical_plan(view)
    assert " IN (" not in plan, plan
    assert_broadcast_join(view, at_least=1)


def test_filtered_knn_sig_predicate_is_in_the_plan(spark):
    """The F2 bloom reject must be a visible Catalyst filter (bitwise AND
    against the query mask) ahead of the exact tag check, and the results
    must equal the scan branch exactly (no false negatives)."""
    from filter_vectordb_spark.operators.filtered_knn import (
        filtered_knn_scan,
        filtered_knn_sig_expr,
    )
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    q = dense_queries(spark, SF_DIR)
    base = dense_vectors(spark, SF_DIR)
    df = filtered_knn_sig_expr(q, base, 5)
    plan = physical_plan(df)
    assert "& qmask" in plan.replace("#", " #").replace("(", " (") or "&" in plan, plan
    assert "qmask" in plan, plan
    a = df.select("qid", "rank", "id").toPandas().sort_values(["qid", "rank"])
    b = (
        filtered_knn_scan(q, base, 5)
        .select("qid", "rank", "id")
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_tag_pair_partition_scan_is_pruned(spark, tmp_path):
    """2-tag search over the pair view must prune to the probed pairs."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_pair_partitions,
        tag_pair_knn,
    )
    from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors

    out = str(tmp_path / "tp2")
    build_tag_pair_partitions(dense_vectors(spark, SF_DIR), out, min_freq=0.0)
    q = dense_queries(spark, SF_DIR).select(
        "qid",
        "qemb",
        F.least(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_a"),
        F.greatest(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_b"),
    )
    df = tag_pair_knn(spark, out, q, 5)
    assert_partition_pruned(df)


def test_lineitem_projection_prunes_columns(spark):
    from filter_vectordb_spark.sources.tables import load_table

    df = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in scan, scan


def test_text_repetition_is_one_stage_no_shuffle(spark):
    """The repetition gate must stay a pure per-row scan: no Exchange in
    the plan, whole-stage codegen'd — the property that lets it run at
    scan speed on any corpus size."""
    from filter_vectordb_spark import registry

    df = registry.QUERIES["text_repetition"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert_whole_stage_codegen(df)


def test_pii_scrub_is_one_stage_no_shuffle(spark):
    """Redaction is pure per-row regexp work — no Exchange, codegen'd."""
    from filter_vectordb_spark import registry

    df = registry.QUERIES["pii_scrub"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert_whole_stage_codegen(df)


def test_eval_contamination_joins_on_gram_no_cartesian(spark):
    """The overlap must be a hash join on the gram key, never a product."""
    from filter_vectordb_spark import registry

    df = registry.QUERIES["eval_contamination"](spark, SF_DIR)
    assert_no_cartesian(df)


def test_substring_windows_hashed_shuffles_on_8byte_key(spark):
    """The 100 TB substring-dedup variant must shuffle on xxhash64(win)
    (8-byte key), never on the raw window string — and the string column
    must not survive past the scan projection."""
    from filter_vectordb_spark.registry import QUERIES

    df = QUERIES["dedup_substring_windows_hashed"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "hashpartitioning(win_h" in plan, plan
    assert "hashpartitioning(win#" not in plan and "hashpartitioning(win," not in plan


@pytest.mark.parametrize(
    "name", ["dedup_substring_windows", "dedup_substring_windows_hashed"]
)
def test_substring_windows_single_generate_single_wide_exchange(spark, name):
    """r11 shape: corpus windows are generated ONCE (the old plan ran the
    explode twice — once feeding the count aggregate, once the join probe
    side) and cross the network ONCE (count-over-window partition instead
    of groupBy + join back).  Exactly one Generate and exactly two
    Exchanges (window key + doc_id aggregate), no join."""
    from filter_vectordb_spark.registry import QUERIES

    plan = physical_plan(QUERIES[name](spark, SF_DIR))
    assert plan.count("+- Generate") == 1, plan
    assert plan.count("+- Exchange") + plan.count(":- Exchange") == 2, plan
    assert "Join" not in plan, plan


def test_jaccard_pairs_two_subtrees_no_size_joins(spark):
    """r12 shape (VERDICT r11 #1): the shingle pipeline (tokenize →
    3-gram transform → array_distinct) is evaluated exactly TWICE (the
    self-join sides) — the r11 plan ran it FOUR times because the per-doc
    shingle counts were recomputed via two groupBy + join-back subtrees.
    Sizes now ride along as a size(shs) projection, so the plan has ONE
    join (the shingle equi-join) and no scan feeding a size aggregate;
    the re-inlining trap (a null-intolerant threshold filter pushing
    isnotnull(size(...)) into the scan) is also pinned closed."""
    from filter_vectordb_spark.registry import QUERIES

    plan = physical_plan(QUERIES["dedup_jaccard_pairs"](spark, SF_DIR))
    # two tree lines + at most two detail blocks; the formatter sometimes
    # prints the two identical scan subtrees as one reused node (3
    # occurrences), so pin the REGRESSION bound: the r11 four-subtree
    # shape printed 8
    assert 2 <= plan.count("Scan parquet") <= 4, plan
    assert plan.count("Join type:") == 1, plan  # exactly one join
    # the scan-level filter must not have the shingle transform inlined
    # (the isnotnull(size(array_distinct(...))) pushdown regression)
    import re

    scan_filters = re.findall(r"\(2\) Filter\nInput.*\nCondition : (.*)", plan)
    for cond in scan_filters:
        assert "array_distinct" not in cond, cond
