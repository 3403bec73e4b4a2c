"""k-NN, filtered k-NN, postings/signature stats, sparse MIPS, hybrid RRF (registered queries + DuckDB oracles).

Split out of the monolithic registry (VERDICT r6 #8); see
filter_vectordb_spark.queries.core for the shared registry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.queries.core import (
    ORACLES,
    _B,
    _FILTERED_ORACLE,
    _Q,
    _dot,
    _index_cache_dir,
    _is_built,
    _l2,
    _sqnorm,
    register,
)
from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors
from filter_vectordb_spark.functions.distance import sq_norm
from filter_vectordb_spark.functions.signature import duckdb_sig_sql
from filter_vectordb_spark.operators.filtered_knn import (
    filtered_knn,
    filtered_knn_metadata_first,
    filtered_knn_scan,
    filtered_knn_sig_expr,
)
from filter_vectordb_spark.operators.knn import knn_join
from filter_vectordb_spark.operators.postings import (
    build_postings,
    explode_tags,
    intersect_postings,
    tag_stats,
    union_postings,
)

# ---------------------------------------------------------------- k-NN (J3/W1)


@register(
    "knn_l2",
    f"""
WITH {_Q}, {_B},
d AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist FROM q, b),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
""",
)
def knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force k-NN, vectorized BLAS path (reference J3/K1,
    `uint8_knn.hpp:39-82`)."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return knn_join(q, base, 10, metric="l2", strategy="vectorized").select(
        "qid", "rank", "id"
    )


@register(
    "knn_l2_expr",
    ORACLES.get("knn_l2"),
)
def knn_l2_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics, pure-expression plan (whole-stage codegen, no Python)."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return knn_join(q, base, 10, metric="l2", strategy="expr").select(
        "qid", "rank", "id"
    )


@register(
    "knn_ip",
    f"""
WITH {_Q}, {_B},
d AS (SELECT q.qid, b.id, {_dot('q.qe', 'b.e')} AS score FROM q, b),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
""",
)
def knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense top-k maximum inner product — the OOD track's metric
    (`ood/diskann/diskann-in-mem.py:40-46` mips); exact plan is the
    oracle the reference's DiskANN recall is judged against."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return knn_join(q, base, 10, metric="ip", strategy="vectorized").select(
        "qid", "rank", "id"
    )


@register(
    "knn_cosine",
    f"""
WITH {_Q}, {_B},
d AS (SELECT q.qid, b.id,
      {_dot('q.qe', 'b.e')} / (sqrt({_sqnorm('b.e')}) * sqrt({_sqnorm('q.qe')})) AS sim
      FROM q, b),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
""",
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k (reference K3 — correct formula, not the broken uint8
    normalize, SURVEY.md §2.6)."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return knn_join(q, base, 10, metric="cos", strategy="vectorized").select(
        "qid", "rank", "id"
    )


@register("filtered_knn_router", _FILTERED_ORACLE)
def filtered_knn_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity-routed filtered k-NN — the reference's flagship
    (`filter/faiss/faiss.py:361-426`); both branches exact on Spark.

    The A1 doc-frequency stats that drive routing are fit()-time artifacts
    in the reference (`filter/faiss/faiss.py:238-239`), so they are served
    from the per-sf_dir cache like every other index table — the timed
    query routes and searches, it does not re-aggregate the corpus."""
    import json
    import os

    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    out = _index_cache_dir(sf_dir, "tagstats")
    # Sidecar MUST be underscore-prefixed: Spark's FileSourceScan lists every
    # non-`_`/`.` file in the directory as a Parquet part, so a plain
    # `meta.json` poisons the whole read ("Expected magic number at tail").
    meta_path = os.path.join(out, "_meta.json")
    stale = os.path.join(out, "meta.json")  # r3 layout — purge on sight
    if os.path.exists(stale):
        os.remove(stale)
    if not (_is_built(out) and os.path.exists(meta_path)):
        from filter_vectordb_spark.operators.postings import explode_tags

        explode_tags(base).groupBy("tag").agg(
            F.count("*").alias("ndoc")
        ).write.mode("overwrite").parquet(out)
        with open(meta_path, "w") as f:
            json.dump({"n_base": base.count()}, f)
    with open(meta_path) as f:
        n_base = json.load(f)["n_base"]
    stats = spark.read.parquet(out)
    return filtered_knn(q, base, 10, n_base=n_base, stats=stats).select(
        "qid", "rank", "id"
    )


@register("filtered_knn_meta", _FILTERED_ORACLE)
def filtered_knn_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 metadata-first plan only (posting intersection → gather → score)."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return filtered_knn_metadata_first(q, base, 10).select("qid", "rank", "id")


@register("filtered_knn_scan", _FILTERED_ORACLE)
def filtered_knn_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2' vector-first plan only (sig-prefiltered vectorized scan)."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return filtered_knn_scan(q, base, 10).select("qid", "rank", "id")


@register("filtered_knn_sig", _FILTERED_ORACLE)
def filtered_knn_sig_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 as a Catalyst plan: bit-signature superset reject before the
    exact tag check (`bow_id_selector.swig:107-130`) — same oracle as the
    other filtered plans because the bloom test has no false negatives."""
    from filter_vectordb_spark.operators.filtered_knn import filtered_knn_sig_expr

    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    return filtered_knn_sig_expr(q, base, 10).select("qid", "rank", "id")


# --------------------------------------------------- postings / stats / sigs


@register(
    "tag_doc_freq",
    f"""
WITH {_B}
SELECT CAST(t.tag AS INT) AS tag, COUNT(*) AS ndoc
FROM (SELECT unnest(tags) AS tag FROM b) t
GROUP BY 1
""",
)
def tag_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-tag document frequency (`filter/faiss/faiss.py:238-239`)."""
    base = dense_vectors(spark, sf_dir)
    return tag_stats(base).select("tag", "ndoc")


@register(
    "posting_intersection",
    f"""
WITH {_B}
SELECT id FROM b WHERE list_contains(tags, 3) AND list_contains(tags, 12)
""",
)
def posting_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: sorted posting-list intersection (`bow_id_selector.swig:133-161`),
    exploded back to rows for the oracle compare."""
    base = dense_vectors(spark, sf_dir)
    postings = build_postings(base)
    return intersect_postings(postings, 3, 12).select(
        F.explode("ids").alias("id")
    )


@register(
    "posting_union",
    f"""
WITH {_B}
SELECT id FROM b WHERE list_contains(tags, 3) OR list_contains(tags, 12)
""",
)
def posting_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: sorted dedup'd posting-list union
    (`bow_id_selector.swig:163-192`), exploded back to rows."""
    from filter_vectordb_spark.operators.postings import union_postings

    base = dense_vectors(spark, sf_dir)
    postings = build_postings(base)
    return union_postings(postings, 3, 12).select(F.explode("ids").alias("id"))


@register(
    "knn_result_matrix",
    f"""
WITH {_Q}, {_B},
d AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist FROM q, b
      WHERE b.id % 97 = 0),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d),
slots AS (SELECT q.qid, s.slot FROM (SELECT DISTINCT qid FROM q) q,
          (SELECT unnest(range(1, 11)) AS slot) s)
SELECT slots.qid, CAST(slots.slot AS INT) AS slot,
       COALESCE(r.id, -1) AS id
FROM slots LEFT JOIN r ON r.qid = slots.qid AND r.rank = slots.slot AND r.rank <= 10
""",
)
def knn_result_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the reference's padded result-matrix form — k slots per query,
    -1 sentinel where fewer than k neighbors exist
    (`bindings.cpp:787-789`).  The base is thinned (id % 97 == 0) so some
    queries genuinely underfill and the padding path is exercised; arrays
    are exploded to (qid, slot, id) scalars for the hash gate."""
    from filter_vectordb_spark.operators.knn import topk_as_arrays

    base = dense_vectors(spark, sf_dir).filter(F.col("id") % 97 == 0)
    q = dense_queries(spark, sf_dir)
    res = knn_join(q, base, 10, metric="l2", strategy="vectorized")
    arrs = topk_as_arrays(res, 10, pad=True)
    return arrs.select(
        "qid", F.posexplode("neighbors").alias("pos", "id")
    ).select("qid", (F.col("pos") + 1).cast("int").alias("slot"), "id")


@register(
    "recall_at_k",
    f"""
WITH {_Q}, {_B},
t AS (SELECT qid, id FROM (
        SELECT q.qid, b.id,
               row_number() OVER (PARTITION BY q.qid ORDER BY {_l2('q.qe', 'b.e')}, b.id) AS rank
        FROM q, b) WHERE rank <= 10),
h AS (SELECT qid, id FROM (
        SELECT q.qid, b.id,
               row_number() OVER (PARTITION BY q.qid ORDER BY {_l2('q.qe', 'b.e')}, b.id) AS rank
        FROM q, b WHERE b.id % 2 = 0) WHERE rank <= 10),
hits AS (SELECT 1 AS checkpoint, h.qid, count(*) AS c
         FROM h JOIN t ON h.qid = t.qid AND h.id = t.id GROUP BY 2),
pq AS (SELECT checkpoint, qid, c / 10.0 AS recall FROM hits)
SELECT checkpoint, CAST(round(avg(recall) * 1000000) AS BIGINT) AS recall_ppm
FROM pq GROUP BY 1
""",
)
def recall_at_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the recall@k checkpoint metric over a deterministic degraded
    search (even ids only) vs full-base ground truth — both sides exact,
    so the recall VALUE itself is oracle-checkable (emitted as integer
    ppm; the reference reports the same mean-overlap/k,
    `streaming/run.py:54-56`)."""
    from filter_vectordb_spark.streaming.runbook import recall_at_k

    base = dense_vectors(spark, sf_dir).select("id", "emb")
    q = dense_queries(spark, sf_dir)
    truth = knn_join(q, base, 10).select("qid", "id")
    got = (
        knn_join(q, base.filter(F.col("id") % 2 == 0), 10)
        .select(F.lit(1).alias("checkpoint"), "qid", "id")
    )
    rec = recall_at_k(got, truth, 10)
    return rec.select(
        "checkpoint",
        F.round(F.col("mean_recall") * 1_000_000).cast("long").alias("recall_ppm"),
    )


@register(
    "results_sink_roundtrip",
    f"""
WITH {_Q}, {_B},
d AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist FROM q, b),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
""",
)
def results_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: write search results through the parquet results sink (the
    harness's output format, `filter/run.py` attrs-alongside-parquet
    analog) and read them back — the compare is on the round-tripped
    rows, proving the sink preserves them exactly."""
    import json
    import os

    out = _index_cache_dir(sf_dir, "results_sink")
    dest = os.path.join(out, "knn_l2")
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir)
    res = knn_join(q, base, 10).select("qid", "rank", "id")
    res.write.mode("overwrite").parquet(dest)
    with open(dest + ".attrs.json", "w") as f:
        json.dump({"query": "knn_l2", "k": 10, "sf_dir": sf_dir}, f)
    return spark.read.parquet(dest)


@register(
    "tag_signatures",
    f"""
SELECT vec_id AS id,
       {duckdb_sig_sql('[CAST(label AS BIGINT), 10 + vec_id % 7, 20 + vec_id % 13]')} AS sig
FROM embeddings
""",
)
def tag_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/A4: 63-bit bloom tag signature column
    (`filter/faiss/faiss.py:97-124`)."""
    return dense_vectors(spark, sf_dir).select("id", "sig")


@register(
    "vector_norms",
    """
SELECT vec_id AS id,
       round(list_reduce(list_prepend(0.0, list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v), 6) AS norm_sq
FROM embeddings
""",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-row squared norms (`uint8_knn.hpp:31-37`) — sequential f64
    fold on both engines, so rounding is hash-stable."""
    base = dense_vectors(spark, sf_dir)
    return base.select("id", F.round(sq_norm(F.col("emb")), 6).alias("norm_sq"))


# ------------------------------------------------------------ sparse MIPS (Q5/Q6)

# DuckDB-side long-form term tables — identical tokenization to
# operators/sparse.py (split on single space, drop empties, count weights).
_DT = (
    "dt AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS w FROM "
    "(SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term FROM documents) "
    "WHERE term <> '' GROUP BY 1, 2)"
)
_QT = "qt AS (SELECT id AS qid, term, w FROM dt WHERE id < 5)"

_SPARSE_TOPK_TAIL = """
s AS (SELECT qt.qid, dt.id, CAST(SUM(qt.w * dt.w) AS BIGINT) AS score
      FROM dt JOIN qt USING (term) GROUP BY 1, 2),
r AS (SELECT qid, id, score,
      row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank FROM s)
SELECT qid, rank, id, score FROM r WHERE rank <= 10
"""


def _sparse_inputs(spark: SparkSession, sf_dir: str):
    from filter_vectordb_spark.operators.sparse import docs_to_terms
    from filter_vectordb_spark.sources.tables import load_table

    dterms = docs_to_terms(load_table(spark, "documents", sf_dir))
    qterms = dterms.filter(F.col("id") < 5).withColumnRenamed("id", "qid")
    return qterms, dterms


@register(
    "hybrid_rrf_search",
    f"""
WITH {_DT}, {_QT}, {_Q}, {_B},
dd AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist FROM q, b WHERE q.qid < 5),
dr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank_d
       FROM dd QUALIFY rank_d <= 50),
ss AS (SELECT qt.qid, dt.id, CAST(SUM(qt.w * dt.w) AS BIGINT) AS score
       FROM dt JOIN qt USING (term) GROUP BY 1, 2),
sr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank_s
       FROM ss QUALIFY rank_s <= 50),
f AS (SELECT coalesce(dr.qid, sr.qid) AS qid, coalesce(dr.id, sr.id) AS id,
             coalesce(1.0 / (60 + dr.rank_d), 0.0) + coalesce(1.0 / (60 + sr.rank_s), 0.0) AS rrf
      FROM dr FULL OUTER JOIN sr ON dr.qid = sr.qid AND dr.id = sr.id)
SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS INT) AS rank, id
FROM f QUALIFY rank <= 10
""",
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense+sparse retrieval via reciprocal-rank fusion
    (k=60): dense L2 top-50 over the embeddings and sparse MIPS top-50
    over the document terms, fused as Σ 1/(60+rank) per modality — the
    standard engine-agnostic fusion (no score calibration needed).
    Rank-based, so fully oracle-checkable: the float RRF scores are
    identical IEEE expressions on both engines and only ranks are
    emitted.  Ids absent from one modality simply lack that term —
    realistic when not every document has an embedding.  Scale shape:
    both legs are existing top-k plans (nq×50 rows each), the fusion
    join is nq×≤100 rows — driver-free and broadcast-light."""
    from filter_vectordb_spark.operators.knn import knn_join
    from filter_vectordb_spark.operators.sparse import sparse_topk

    base = dense_vectors(spark, sf_dir)
    dq = dense_queries(spark, sf_dir).filter(F.col("qid") < 5)
    dense = knn_join(dq, base, 50, metric="l2", strategy="expr").select(
        "qid", "id", F.col("rank").alias("rank_d")
    )
    qterms, dterms = _sparse_inputs(spark, sf_dir)
    sparse = sparse_topk(qterms, dterms, 50).select(
        "qid", "id", F.col("rank").alias("rank_s")
    )
    fused = dense.join(sparse, ["qid", "id"], "full_outer").withColumn(
        "rrf",
        F.coalesce(1.0 / (60 + F.col("rank_d")), F.lit(0.0))
        + F.coalesce(1.0 / (60 + F.col("rank_s")), F.lit(0.0)),
    )
    from filter_vectordb_spark.operators.topk import per_group_topk

    return per_group_topk(
        fused, ["qid"], [F.col("rrf").desc(), F.col("id").asc()], 10
    ).select("qid", "rank", "id")


@register("sparse_mips", f"WITH {_DT}, {_QT}, {_SPARSE_TOPK_TAIL}")
def sparse_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/Q6: top-k max inner product over term-frequency sparse vectors
    (explode-join-aggregate = the inverted-index scan,
    `sparse/linscan/linscan.py:44-56`)."""
    from filter_vectordb_spark.operators.sparse import sparse_topk

    qterms, dterms = _sparse_inputs(spark, sf_dir)
    return sparse_topk(qterms, dterms, 10).select("qid", "rank", "id", "score")


@register(
    "sparse_mips_alpha",
    f"""
WITH {_DT}, {_QT},
qa AS (SELECT qid, term, w FROM (
    SELECT qid, term, w,
           SUM(w) OVER (PARTITION BY qid) AS total,
           SUM(w) OVER (PARTITION BY qid ORDER BY w DESC, term ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
    FROM qt) WHERE (running - w) < 0.8 * total),
s AS (SELECT qa.qid, dt.id, CAST(SUM(qa.w * dt.w) AS BIGINT) AS score
      FROM dt JOIN qa USING (term) GROUP BY 1, 2),
r AS (SELECT qid, id, score,
      row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank FROM s)
SELECT qid, rank, id, score FROM r WHERE rank <= 10
""",
)
def sparse_mips_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 α-mass query sparsification (α=0.8) then exact scoring
    (`sparse/spmat/spmat.py:16-28`)."""
    from filter_vectordb_spark.operators.sparse import sparse_topk, sparsify_alpha

    qterms, dterms = _sparse_inputs(spark, sf_dir)
    return sparse_topk(sparsify_alpha(qterms, 0.8), dterms, 10).select(
        "qid", "rank", "id", "score"
    )


@register(
    "sparse_mips_budget",
    f"""
WITH {_DT}, {_QT},
qb AS (SELECT qid, term, w FROM (
    SELECT qid, term, w,
           row_number() OVER (PARTITION BY qid ORDER BY w DESC, term ASC) AS rn
    FROM qt) WHERE rn <= 5),
s AS (SELECT qb.qid, dt.id, CAST(SUM(qb.w * dt.w) AS BIGINT) AS score
      FROM dt JOIN qb USING (term) GROUP BY 1, 2),
r AS (SELECT qid, id, score,
      row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank FROM s)
SELECT qid, rank, id, score FROM r WHERE rank <= 10
""",
)
def sparse_mips_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 budget surrogate: score only the 5 heaviest query dims
    (deterministic counterpart of linscan's time budget,
    `sparse/linscan/linscan.py:41-42`)."""
    from filter_vectordb_spark.operators.sparse import budget_truncate, sparse_topk

    qterms, dterms = _sparse_inputs(spark, sf_dir)
    return sparse_topk(budget_truncate(qterms, 5), dterms, 10).select(
        "qid", "rank", "id", "score"
    )


