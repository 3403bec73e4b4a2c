"""index-backed search: IVF / PQ / SQ8 / IVF+PQ / IVF+SQ8 / tag-partition views (registered queries + DuckDB oracles).

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
    _index_cache_dir,
    _is_built,
    _l2,
    register,
)
from filter_vectordb_spark.sources.vectors import DEFAULT_NQ, dense_queries, dense_vectors

# --------------------------------------------------------- index-backed search
#
# The reference separates fit()/load_index() from query()
# (`filter/run.py:15-52`): an index is built ONCE and then served.  The
# registry mirrors that with a deterministic on-disk cache keyed by sf_dir:
# first invocation builds and saves (S5), every later one loads — so the
# bench times SEARCH, not build, exactly like the reference's QPS runs.



@register(
    "ivf_full_probe",
    ORACLES["knn_l2"],
)
def ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3+Q4: KMeans-IVF (built once per sf_dir, served from the saved
    lake layout), searched probing ALL inverted lists — exactly
    brute-force k-NN regardless of clustering, hence the oracle is the
    plain k-NN oracle.  Smaller nprobe is recall-tested in tests/."""
    from filter_vectordb_spark.index.ivf import build_ivf, ivf_search, load_ivf, save_ivf

    q = dense_queries(spark, sf_dir)
    nlist = 16
    out = _index_cache_dir(sf_dir, "ivf16")
    if not _is_built(f"{out}/assignments", f"{out}/centroids"):
        base = dense_vectors(spark, sf_dir)
        assignments, centroids = build_ivf(base.select("id", "emb"), nlist)
        save_ivf(assignments, centroids, out)
    assignments, centroids = load_ivf(spark, out)
    return ivf_search(q, assignments, centroids, 10, nprobe=nlist).select(
        "qid", "rank", "id"
    )


@register(
    "pq_adc_knn",
    ORACLES["knn_l2"],
)
def pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search + exact rescore — the memory-scale
    path for dense ANN (the reference's DiskANN PQ knobs,
    `ood/diskann/diskann-in-mem.py:90-92`, realized as Spark tables).
    Codes table built once per sf_dir (32 B/vector, 8× vs float32) and
    served from the lake; the full-corpus pass reads CODES ONLY, then
    nq×128 survivors are exactly rescored — equal to brute-force k-NN
    whenever the true top-k survive the cut (pinned in tests/test_pq.py
    with margin: refine=64 already achieves recall 1.0 on the fixtures),
    hence the plain k-NN oracle."""
    from filter_vectordb_spark.index.pq import (
        encode_pq,
        load_pq,
        pq_adc_search,
        save_pq,
        train_pq,
    )

    q = dense_queries(spark, sf_dir)
    out = _index_cache_dir(sf_dir, "pq32x64")
    if not _is_built(f"{out}/codes", f"{out}/codebooks"):
        base = dense_vectors(spark, sf_dir).select("id", "emb")
        cb = train_pq(base, nsub=32, ksub=64)
        save_pq(encode_pq(base, cb), cb, out)
    codes, cb = load_pq(spark, out)
    base = dense_vectors(spark, sf_dir).select("id", "emb")
    return pq_adc_search(q, codes, cb, base, 10, refine=128).select(
        "qid", "rank", "id"
    )


@register(
    "sq_knn",
    ORACLES["knn_l2"],
)
def sq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization search + exact rescore — the codec half of
    the reference's faiss indexkey (`IVF16384,SQ8`,
    `filter/faiss/faiss.py:133`).  Codes table (1 byte/component, 4× vs
    float32) built once per sf_dir and served from the lake; the corpus
    pass reads CODES ONLY, survivors are exactly rescored — equal to
    brute-force k-NN whenever the true top-k survive the cut (SQ8's
    per-component error is ≤ half a grid step; margin pinned in
    tests/test_sq.py), hence the plain k-NN oracle."""
    from filter_vectordb_spark.index.sq import (
        encode_sq,
        load_sq,
        save_sq,
        sq_search,
        train_sq,
    )

    q = dense_queries(spark, sf_dir)
    out = _index_cache_dir(sf_dir, "sq8")
    if not _is_built(f"{out}/codes", f"{out}/grid"):
        base = dense_vectors(spark, sf_dir).select("id", "emb")
        vmin, vmax = train_sq(base)
        save_sq(encode_sq(base, vmin, vmax), vmin, vmax, out)
    codes, vmin, vmax = load_sq(spark, out)
    base = dense_vectors(spark, sf_dir).select("id", "emb")
    return sq_search(q, codes, vmin, vmax, base, 10, refine=64).select(
        "qid", "rank", "id"
    )


@register(
    "ivfsq_knn",
    ORACLES["knn_l2"],
)
def ivfsq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+SQ8 composed index — the reference's faiss index architecture
    verbatim (`IVF16384,SQ8`, `filter/faiss/faiss.py:133`): coarse
    partitioner prunes WHICH rows are scanned, the 1-byte affine codes
    decide HOW CHEAPLY; built once per sf_dir, probed full
    (nprobe=nlist) with exact rescore — the oracle-checkable
    configuration.  Partial-nprobe recall pinned in tests/test_sq.py."""
    from filter_vectordb_spark.index.ivfsq import (
        build_ivfsq,
        ivfsq_search,
        load_ivfsq,
        save_ivfsq,
    )

    q = dense_queries(spark, sf_dir)
    nlist = 16
    out = _index_cache_dir(sf_dir, "ivfsq16")
    if not _is_built(f"{out}/entries", f"{out}/centroids", f"{out}/grid"):
        base = dense_vectors(spark, sf_dir).select("id", "emb")
        entries, centroids, vmin, vmax = build_ivfsq(base, nlist=nlist)
        save_ivfsq(entries, centroids, vmin, vmax, out)
    entries, centroids, vmin, vmax = load_ivfsq(spark, out)
    base = dense_vectors(spark, sf_dir).select("id", "emb")
    return ivfsq_search(
        q, entries, centroids, vmin, vmax, base, 10, nprobe=nlist, refine=64
    ).select("qid", "rank", "id")


@register(
    "ivf_incremental_search",
    ORACLES["knn_l2"],
)
def ivf_incremental_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index maintenance: IVF built on the first 3/4 of the base, the rest
    INSERTED by nearest-centroid assignment (no refit — the streaming
    insert contract), then full-probe searched.  Full probe over the
    maintained table is exactly brute force over the whole base, so the
    plain k-NN oracle checks that inserts neither lose nor duplicate
    rows."""
    from filter_vectordb_spark.index.ivf import build_ivf, ivf_insert, ivf_search

    base = dense_vectors(spark, sf_dir).select("id", "emb")
    n = base.count()
    cut = (3 * n) // 4
    nlist = 16
    assignments, centroids = build_ivf(base.filter(F.col("id") < cut), nlist)
    merged = ivf_insert(assignments, centroids, base.filter(F.col("id") >= cut))
    q = dense_queries(spark, sf_dir)
    return ivf_search(q, merged, centroids, 10, nprobe=nlist).select(
        "qid", "rank", "id"
    )


@register(
    "ivfpq_knn",
    ORACLES["knn_l2"],
)
def ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed index (the faiss `IVFx,PQy` architecture as lake
    tables): coarse partitioner prunes WHICH rows are scanned, PQ codes
    decide HOW CHEAPLY; built once per sf_dir, probed full (nprobe=nlist)
    with exact rescore — the oracle-checkable configuration.  Partial
    nprobe recall curve pinned in tests/test_pq.py."""
    from filter_vectordb_spark.index.ivfpq import (
        build_ivfpq,
        ivfpq_search,
        load_ivfpq,
        save_ivfpq,
    )

    q = dense_queries(spark, sf_dir)
    nlist = 16
    out = _index_cache_dir(sf_dir, "ivfpq16_32x64")
    if not _is_built(f"{out}/entries", f"{out}/centroids", f"{out}/codebooks"):
        base = dense_vectors(spark, sf_dir).select("id", "emb")
        entries, centroids, cb = build_ivfpq(base, nlist=nlist, nsub=32, ksub=64)
        save_ivfpq(entries, centroids, cb, out)
    entries, centroids, cb = load_ivfpq(spark, out)
    base = dense_vectors(spark, sf_dir).select("id", "emb")
    return ivfpq_search(
        q, entries, centroids, cb, base, 10, nprobe=nlist, refine=128
    ).select("qid", "rank", "id")


@register(
    "tag_partition_knn",
    f"""
WITH {_B},
q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe,
      CAST(label AS INT) AS qtag FROM embeddings WHERE vec_id < {DEFAULT_NQ}),
d AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist
      FROM q, b WHERE list_contains(b.tags, q.qtag)),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
""",
)
def tag_partition_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2+Q3: tag-partitioned materialized view (built once per sf_dir,
    then served) + partition-pruned search for single-tag queries (exact
    within the tag ⇒ oracle-checkable)."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_partitions,
        tag_partition_knn,
    )

    emb = dense_queries(spark, sf_dir)
    q = emb.select("qid", "qemb", F.col("qtags")[0].alias("qtag"))
    from filter_vectordb_spark.index.tagpart import view_is_built

    out = _index_cache_dir(sf_dir, "tagpart")
    if not view_is_built(out):
        base = dense_vectors(spark, sf_dir)
        build_tag_partitions(base, out, min_freq=0.0)
    return tag_partition_knn(spark, out, q, 10).select("qid", "rank", "id")


@register("tag_pair_partition_knn", _FILTERED_ORACLE)
def tag_pair_partition_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 pair half + Q3: 2-tag queries routed to prebuilt tag-PAIR
    partition views (reference threshold 0.003·nb,
    `filter/faiss/faiss.py:289-337`); below-threshold pairs fall back to
    the exact sig-prefiltered scan, so the result equals the filtered
    brute-force oracle for every query."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_pair_partitions,
        tag_pair_knn,
        view_is_built,
    )

    base = dense_vectors(spark, sf_dir)
    emb = dense_queries(spark, sf_dir)
    q = emb.select(
        "qid",
        "qemb",
        F.least(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_a"),
        F.greatest(F.col("qtags")[0], F.col("qtags")[1]).alias("tag_b"),
    )
    out = _index_cache_dir(sf_dir, "tagpair")
    if not view_is_built(out):
        build_tag_pair_partitions(base, out, min_freq=0.003)
    return tag_pair_knn(spark, out, q, 10, base=base).select("qid", "rank", "id")


