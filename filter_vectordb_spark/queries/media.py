"""LLM-pipeline multimodal: decode, features, frame sampling (registered queries + DuckDB oracles).

Split out of the monolithic registry (VERDICT r6 #8); see
filter_vectordb_spark.queries.core for the shared registry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.queries.core import (
    register,
)

# -------------------------------------------------- LLM-pipeline: multimodal


@register(
    "media_features",
    """
WITH m AS (
  SELECT doc_id AS id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
p AS (
  SELECT id, media_type, hx, n,
         3 * GREATEST(CAST(floor(sqrt(n)) AS BIGINT), 1)
           * GREATEST(CAST(floor(sqrt(n)) AS BIGINT), 1) AS total
  FROM m
),
b AS (
  SELECT id, media_type,
         strpos('0123456789ABCDEF', substr(hx, CAST(2 * j + 1 AS INT), 1)) - 1 AS bin,
         total // n + CASE WHEN j < total % n THEN 1 ELSE 0 END AS w
  FROM p, unnest(range(n)) AS t(j)
)
SELECT id, media_type, CAST(bin AS INT) AS bin, CAST(sum(w) AS BIGINT) AS count
FROM b GROUP BY 1, 2, 3 HAVING sum(w) > 0
""",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary feature extraction (stubbed decode, real 16-bin byte
    histogram) through mapInPandas, emitted long-form scalar so it hashes.
    Oracle reproduces the fake decode's np.resize cyclic repeat in closed
    form and reads bins off the payload's high hex nibbles."""
    from filter_vectordb_spark.operators.multimodal import (
        feature_histogram_long,
        media_table,
    )
    from filter_vectordb_spark.sources.tables import load_table

    media = media_table(load_table(spark, "documents", sf_dir))
    return feature_histogram_long(media, fake_decode=True)


@register(
    "media_frame_sample",
    """
WITH m AS (
  SELECT doc_id AS id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT id, hx, CAST(fi AS INT) AS frame,
         GREATEST(n // 4, 1) * fi AS off,
         LEAST(GREATEST(n // 4, 1), GREATEST(n - GREATEST(n // 4, 1) * fi, 0)) AS len
  FROM m, unnest(range(4)) t(fi)
),
b AS (
  SELECT id, frame, len,
         (strpos('0123456789ABCDEF', substr(hx, CAST(2 * (off + j) + 1 AS INT), 1)) - 1) * 16
       + (strpos('0123456789ABCDEF', substr(hx, CAST(2 * (off + j) + 2 AS INT), 1)) - 1) AS byte
  FROM fr, unnest(range(len)) t(j)
  WHERE len > 0
)
SELECT id, frame, CAST(any_value(len) AS BIGINT) AS n_bytes, CAST(sum(byte) AS BIGINT) AS byte_sum
FROM b GROUP BY 1, 2
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-chunk frame sampling over binary payloads (stub keyframes);
    the oracle reproduces the byte chunking off the payload's hex form."""
    from filter_vectordb_spark.operators.multimodal import media_table, sample_frames
    from filter_vectordb_spark.sources.tables import load_table

    media = media_table(load_table(spark, "documents", sf_dir))
    return sample_frames(media, n_frames=4)


@register(
    "media_decode_stats",
    """
WITH img AS (
  SELECT i.range AS id, 'image' AS media_type, CAST(576 AS BIGINT) AS n_values,
         CAST(SUM(((xor(i.range*2654435761, (j.range+1)*2246822519)) >> 11) % 251)
              AS BIGINT) AS value_sum
  FROM range(0, 200, 2) i, range(576) j GROUP BY i.range
),
aud AS (
  SELECT i.range AS id, 'audio' AS media_type, CAST(64 AS BIGINT) AS n_values,
         CAST(SUM((((xor(i.range*2654435761, (j.range+1)*2246822519)) >> 11) % 251) - 125)
              AS BIGINT) AS value_sum
  FROM range(1, 200, 2) i, range(64) j GROUP BY i.range
)
SELECT * FROM img UNION ALL SELECT * FROM aud
""",
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end (no fake path): genuine PPM P6 and
    PCM-16 WAV payloads generated from the closed-form pattern, parsed
    by the pure numpy decoders (operators/multimodal.py), pixel/sample
    sums hash-checked against a DuckDB oracle that regenerates the
    payload values — a header-math, row-padding, or sample-width bug
    shows as a value mismatch, not just a crash."""
    from filter_vectordb_spark.operators.multimodal import (
        media_decode_stats as _stats,
        media_real_table,
    )

    return _stats(media_real_table(spark))


