"""Dense vector / query tables derived deterministically from the fixtures.

The reference's filter track operates on a base table of vectors with
per-document tag sets (CSR incidence matrix, `filter/faiss/faiss.py:148-149`)
and queries carrying 1-2 conjunctive tags (`filter/faiss/faiss.py:375-377`).
The driver fixtures provide `embeddings(vec_id, embedding, label)`; we derive
the tag sets with pure integer arithmetic so the DuckDB oracle can recompute
byte-identical values:

    tags(v, label) = [label, 10 + v % 7, 20 + v % 13]       (sorted by range)

Tag id ranges: labels 0-9 (10 coarse tags), 10-16 (7 mid tags), 20-32
(13 fine tags) — a mix of high-frequency and low-frequency tags so the
selectivity router (SURVEY.md §2.8) exercises both branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.functions.signature import sig_from_tags
from filter_vectordb_spark.sources.tables import load_table

#: number of fixture rows used as the standing query set
DEFAULT_NQ = 8


def with_tags(df: DataFrame, id_col: str = "vec_id", label_col: str = "label") -> DataFrame:
    """Attach the deterministic tag-set column (sorted int array)."""
    v = F.col(id_col)
    return df.withColumn(
        "tags",
        F.array(
            F.col(label_col).cast("int"),
            (F.lit(10) + (v % 7)).cast("int"),
            (F.lit(20) + (v % 13)).cast("int"),
        ),
    )


def dense_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base table: (id BIGINT, emb ARRAY<FLOAT>, label INT, tags ARRAY<INT>, sig BIGINT).

    Mirrors the reference base table + metadata + 63-bit signature column
    (`filter/faiss/faiss.py:97-124`); the signature is a column, not an
    id-bit-packing trick (SURVEY.md K6: unnecessary on Spark).
    """
    emb = load_table(spark, "embeddings", sf_dir)
    df = with_tags(emb).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
        F.col("label").cast("int").alias("label"),
        "tags",
    )
    return df.withColumn("sig", sig_from_tags(F.col("tags")))


def quantize_uint8(x):
    """Deterministic float→uint8 quantizer: clamp(floor(x·64)+128, 0, 255).

    Mirrors the reference's uint8 storage domain (`bindings.cpp:145`);
    pure integer output so K2 distances are exact.  The DuckDB oracle
    recomputes it with the identical formula.
    """
    q = F.floor(x.cast("double") * 64) + 128
    return F.least(F.greatest(q, F.lit(0)), F.lit(255)).cast("int")


DUCKDB_QUANTIZE = (
    "CAST(least(greatest(floor(CAST({x} AS DOUBLE) * 64) + 128, 0), 255) AS INT)"
)


def dense_vectors_uint8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, emb ARRAY<INT> in 0..255) — the uint8 base table (filter-track
    storage dtype)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), quantize_uint8).alias("emb"),
    )


def dense_queries(spark: SparkSession, sf_dir: str, nq: int = DEFAULT_NQ) -> DataFrame:
    """Query table: (qid BIGINT, qemb ARRAY<FLOAT>, qtags ARRAY<INT>).

    The first `nq` base vectors double as queries (deterministic, mirrors
    the reference's practice of reusing fixture distributions).  Each query
    carries a 2-tag conjunction [label, 10 + qid % 7] — the reference
    asserts 1-2 tags per query (`filter/faiss/faiss.py:375-377`).
    """
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < nq)
    return q.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.array(
            F.col("label").cast("int"),
            (F.lit(10) + (F.col("vec_id") % 7)).cast("int"),
        ).alias("qtags"),
    )
