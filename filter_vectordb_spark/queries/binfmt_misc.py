"""uint8 domain, binary vector formats, LSH ANN, pair stats, window rollups, sparse CSR source (registered queries + DuckDB oracles).

Split out of the monolithic registry (VERDICT r6 #8); see
filter_vectordb_spark.queries.core for the shared registry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.queries.core import (
    ORACLES,
    _B,
    _index_cache_dir,
    _is_built,
    _l2,
    register,
)
from filter_vectordb_spark.sources.vectors import DEFAULT_NQ, dense_queries, dense_vectors
from filter_vectordb_spark.functions.text import (
    duckdb_char_hash_sql,
)
from filter_vectordb_spark.queries.textpipe import _TOKS
from filter_vectordb_spark.operators.knn import knn_join

# --------------------------------------------- uint8 domain + binary source

from filter_vectordb_spark.sources.vectors import DUCKDB_QUANTIZE  # noqa: E402

_QX = DUCKDB_QUANTIZE.format(x="x")
_UB = (
    f"ub AS (SELECT vec_id AS id, list_transform(embedding, x -> {_QX}) AS e "
    "FROM embeddings)"
)
_UQ = (
    f"uq AS (SELECT vec_id AS qid, list_transform(embedding, x -> {_QX}) AS qe "
    f"FROM embeddings WHERE vec_id < {DEFAULT_NQ})"
)
_L2I = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS BIGINT) - p[2]) * (CAST(p[1] AS BIGINT) - p[2]))), "
    "(acc, v) -> acc + v)"
)


@register(
    "uint8_knn",
    f"""
WITH {_UQ}, {_UB},
d AS (SELECT uq.qid, ub.id, {_L2I.format(a='uq.qe', b='ub.e')} AS dist FROM uq, ub),
r AS (SELECT qid, id, dist,
      row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
SELECT qid, rank, id, dist FROM r WHERE rank <= 10
""",
)
def uint8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: exact k-NN in the integer (uint8) distance domain with int64
    accumulators — distances themselves are hash-exact, so they are part
    of the oracle contract (the float paths only expose ranks)."""
    from filter_vectordb_spark.functions.distance import l2_sq_int
    from filter_vectordb_spark.operators.topk import per_group_topk
    from filter_vectordb_spark.sources.vectors import dense_vectors_uint8

    base = dense_vectors_uint8(spark, sf_dir)
    q = base.filter(F.col("id") < 8).select(
        F.col("id").alias("qid"), F.col("emb").alias("qemb")
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        "qid", "id", l2_sq_int(F.col("qemb"), F.col("emb")).alias("dist")
    )
    return per_group_topk(
        scored, ["qid"], [F.col("dist").asc(), F.col("id").asc()], 10
    ).select("qid", "rank", "id", "dist")


@register(
    "binfmt_roundtrip",
    f"""
WITH {_UB}
SELECT id, list_reduce(list_prepend(0::BIGINT, list_transform(e, v -> CAST(v AS BIGINT))),
       (a, b) -> a + b) AS emb_sum
FROM ub
""",
)
def binfmt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: write the uint8 base table to the reference's .u8bin format
    (uint32 n/d header + row-major bytes) with the DISTRIBUTED writer
    (tasks seek+write their own id ranges; no driver collect), chunk-read
    it back through the distributed binary source, and checksum each row —
    proving byte-level format parity end to end."""
    import os
    import tempfile

    from filter_vectordb_spark.sources.binfmt import (
        read_dense_bin,
        write_dense_bin_distributed,
    )
    from filter_vectordb_spark.sources.vectors import dense_vectors_uint8

    base = dense_vectors_uint8(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="fvdb_bin_"), "base.u8bin")
    write_dense_bin_distributed(base, path, "u8bin")
    df = read_dense_bin(spark, path, "u8bin", rows_per_chunk=256)
    return df.select(
        "id",
        F.aggregate(
            F.col("emb"),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long"),
        ).alias("emb_sum"),
    )


@register("binfmt_fetch_roundtrip", ORACLES["binfmt_roundtrip"])
def binfmt_fetch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 + S1: stage the uint8 base as a .u8bin artifact once per sf_dir,
    FETCH it through the remote-artifact path (file:// URL — the same
    code path as http, `filter/faiss/faiss.py:195-206` lifecycle), then
    chunk-read distributed and checksum each row."""
    import os

    from filter_vectordb_spark.sources.binfmt import write_dense_bin_distributed
    from filter_vectordb_spark.sources.fetch import fetch_dense_bin
    from filter_vectordb_spark.sources.vectors import dense_vectors_uint8

    out = _index_cache_dir(sf_dir, "u8bin_artifact")
    src = os.path.join(out, "base.u8bin")
    if not os.path.exists(src):
        os.makedirs(out, exist_ok=True)
        tmp = src + ".stage"
        write_dense_bin_distributed(dense_vectors_uint8(spark, sf_dir), tmp, "u8bin")
        os.rename(tmp, src)
    dest = os.path.join(out, "fetched.u8bin")
    df = fetch_dense_bin(spark, f"file://{src}", dest, "u8bin", rows_per_chunk=256)
    return df.select(
        "id",
        F.aggregate(
            F.col("emb"),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long"),
        ).alias("emb_sum"),
    )


@register("lsh_cosine_knn")  # approximate — recall-tested in tests/, rows-only here
def lsh_cosine_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed cosine ANN (bucket-join then exact rescore);
    recall vs the exact cosine plan is pinned in tests/test_index.py.
    The base bucket table is built once per sf_dir and served from disk."""
    from filter_vectordb_spark.index.lsh import lsh_bucket_table, lsh_cosine_knn

    base = dense_vectors(spark, sf_dir).select("id", "emb")
    q = dense_queries(spark, sf_dir)
    dim = len(q.select("qemb").first()[0])
    out = _index_cache_dir(sf_dir, "lsh16")
    if not _is_built(out):
        lsh_bucket_table(base, dim).write.mode("overwrite").parquet(out)
    bb = spark.read.parquet(out)
    return lsh_cosine_knn(q, base, 10, dim, base_buckets=bb).select("qid", "rank", "id")


@register(
    "range_search_uint8",
    f"""
WITH {_UQ}, {_UB}
SELECT uq.qid, ub.id, {_L2I.format(a='uq.qe', b='ub.e')} AS dist
FROM uq, ub
WHERE {_L2I.format(a='uq.qe', b='ub.e')} <= 200000
""",
)
def range_search_uint8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 range query in the exact integer domain: all (query, id) pairs
    within integer squared-L2 radius — declared by the reference's runner
    (`streaming/run.py:49-51`) but unimplemented by every engine there;
    trivial as a Spark predicate, and hash-exact because distances are
    integers."""
    from filter_vectordb_spark.functions.distance import l2_sq_int
    from filter_vectordb_spark.sources.vectors import dense_vectors_uint8

    base = dense_vectors_uint8(spark, sf_dir)
    q = base.filter(F.col("id") < 8).select(
        F.col("id").alias("qid"), F.col("emb").alias("qemb")
    )
    return (
        base.crossJoin(F.broadcast(q))
        .select("qid", "id", l2_sq_int(F.col("qemb"), F.col("emb")).alias("dist"))
        .filter(F.col("dist") <= 200_000)
    )


@register(
    "tag_pair_doc_freq",
    f"""
WITH {_B},
x AS (SELECT id, unnest(tags) AS tag FROM b)
SELECT a.tag AS tag_a, c.tag AS tag_b, count(*) AS ndoc
FROM x a JOIN x c ON a.id = c.id AND a.tag < c.tag
GROUP BY 1, 2
""",
)
def tag_pair_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 (pair half): document frequency of tag PAIRS — the statistic the
    reference uses to decide which tag-pair sub-indexes to prebuild
    (intersection ≥ 0.003·nb, `filter/faiss/faiss.py:308`).  Self-join of
    the exploded tag table on id."""
    from filter_vectordb_spark.operators.postings import explode_tags

    x = explode_tags(dense_vectors(spark, sf_dir))
    a = x.withColumnRenamed("tag", "tag_a")
    b = x.withColumnRenamed("tag", "tag_b")
    return (
        a.join(b, "id")
        .filter(F.col("tag_a") < F.col("tag_b"))
        .groupBy("tag_a", "tag_b")
        .agg(F.count("*").alias("ndoc"))
    )


@register(
    "dedup_filtered_corpus",
    f"""
WITH k AS (
  SELECT doc_id,
         {duckdb_char_hash_sql("array_to_string(list_sort(list_distinct(" + _TOKS + ")), ' ')")} AS group_key
  FROM documents)
SELECT doc_id FROM k
WHERE doc_id = (SELECT min(k2.doc_id) FROM k k2 WHERE k2.group_key = k.group_key)
""",
)
def dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's terminal op: the corpus filtered to canonical
    documents only (what a training-data pipeline actually ships)."""
    from filter_vectordb_spark.operators.dedup import exact_dedup
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    keep = exact_dedup(docs).filter(F.col("is_canonical"))
    return keep.select("doc_id")


@register(
    "knn_l2_batch",
    f"""
WITH q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
           FROM embeddings WHERE vec_id < 256),
{_B},
d AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist FROM q, b),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
""",
)
def knn_l2_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-throughput point: 256 queries through one vectorized k-NN
    join — the reference's QPS figure amortizes per-query index probes;
    Spark amortizes per-batch BLAS blocks, so throughput = nq / wall."""
    base = dense_vectors(spark, sf_dir)
    q = dense_queries(spark, sf_dir, nq=256)
    return knn_join(q, base, 10, metric="l2", strategy="vectorized").select(
        "qid", "rank", "id"
    )


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + aggregate."""
    from filter_vectordb_spark.sources.tables import load_table

    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = load_table(spark, "lineitem", sf_dir)
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "customer_running_total",
    """
SELECT o_custkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
       o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_cents
FROM orders
""",
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum window per customer (cumulative frame, exact cents)."""
    from pyspark.sql import Window

    from filter_vectordb_spark.queries.relational import cents
    from filter_vectordb_spark.sources.tables import load_table

    o = load_table(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        "o_orderkey",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("running_cents"),
    )


@register(
    "sparse_csr_roundtrip",
    f"""
WITH t AS (
  SELECT doc_id AS row, term, count(*) AS w
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  GROUP BY 1, 2
),
v AS (SELECT term, dense_rank() OVER (ORDER BY term) - 1 AS col
      FROM (SELECT DISTINCT term FROM t)),
j AS (SELECT t.row, v.col, t.w FROM t JOIN v USING (term))
SELECT row, count(*) AS nnz, CAST(sum(col) AS BIGINT) AS col_sum,
       CAST(sum(w) AS BIGINT) AS w_sum
FROM j GROUP BY 1
""",
)
def sparse_csr_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: materialize the document term matrix as a reference-format
    spmat CSR blob (int64 [nrow,ncol,nnz] + indptr/indices/data,
    `filter/faiss/faiss.py:63-73`) with the distributed writer, chunk-read
    it back through the distributed CSR source, and checksum each row —
    byte-level format parity for the sparse track.  The file is built once
    per sf_dir (fit/query split); the timed query is the read."""
    import os

    from pyspark.sql import Window

    from filter_vectordb_spark.operators.sparse import docs_to_terms
    from filter_vectordb_spark.sources.spmat import read_spmat, write_spmat_distributed
    from filter_vectordb_spark.sources.tables import load_table

    out = _index_cache_dir(sf_dir, "spmat")
    path = os.path.join(out, "docs.spmat")
    if not os.path.exists(path):
        os.makedirs(out, exist_ok=True)
        dterms = docs_to_terms(load_table(spark, "documents", sf_dir))
        vocab = (
            dterms.select("term")
            .distinct()
            .select(
                "term",
                (F.row_number().over(Window.orderBy("term")) - 1).alias("col"),
            )
        )
        t = dterms.join(F.broadcast(vocab), "term").select(
            F.col("id").alias("row"), "col", F.col("w").cast("float").alias("val")
        )
        dims = t.agg(
            (F.max("row") + 1).alias("nrow"), (F.max("col") + 1).alias("ncol")
        ).collect()[0]
        tmp = path + ".tmp"
        write_spmat_distributed(t, tmp, int(dims["nrow"]), int(dims["ncol"]))
        os.rename(tmp, path)
    df = read_spmat(spark, path, rows_per_chunk=256)
    return df.groupBy("row").agg(
        F.count("*").alias("nnz"),
        F.sum("col").cast("long").alias("col_sum"),
        F.sum(F.col("val").cast("long")).alias("w_sum"),
    )


