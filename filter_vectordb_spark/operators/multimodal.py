"""Multimodal column plumbing (north-star extension, SURVEY.md §7 P7).

Image/audio/video payloads are opaque BINARY columns with typed metadata;
the heavy per-item work (decode, feature extraction, resize, frame
sampling) runs as Arrow-batched pandas kernels over `mapInPandas` — the
same execution shape as the k-NN kernel, so the 100 TB posture is
identical: payloads never leave their scan partition, only small derived
columns shuffle.

The container has no image/audio codecs, so `decode` is STUBBED exactly
as specified: attempting a real decode raises NotImplementedError, and a
clearly-marked deterministic fake (`fake_decode=True`) stands in so the
Spark-side plumbing — schema, batching, UDF signatures, partition flow —
is real and tested.  Byte-level ops (histogram features, chunk sampling)
are real computations on the binary payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "id BIGINT, media BINARY, media_type STRING, width INT, height INT, duration_ms INT"

FEATURE_DIM = 16


def media_table(docs: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal fixture from `documents`: the
    UTF-8 payload poses as an opaque blob; metadata from stable columns.
    Real pipelines read (path, BINARY content) via
    spark.read.format('binaryFile') — same schema from there on."""
    return docs.select(
        F.col("doc_id").alias("id"),
        F.encode("text", "UTF-8").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def decode_media(payload: bytes, media_type: str, fake_decode: bool) -> np.ndarray:
    """STUB: real decoding needs codec libraries absent from this
    container.  fake_decode=True yields a deterministic byte-derived
    array with the right shape contract (H×W×3 uint8 for images)."""
    if not fake_decode:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "environment; pass fake_decode=True for the deterministic stand-in"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(len(arr) ** 0.5), 1)
    return np.resize(arr, (side, side, 3))


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-item feature vector: decode (stub) → 16-bin byte histogram,
    L1-normalized.  Output (id, media_type, features ARRAY<DOUBLE>) feeds
    straight into the similarity/dedup operators."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, mtype in zip(pdf["media"], pdf["media_type"]):
                arr = decode_media(bytes(payload), mtype, fake_decode)
                hist, _ = np.histogram(arr.ravel(), bins=FEATURE_DIM, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {"id": pdf["id"], "media_type": pdf["media_type"], "features": feats}
            )

    return media.mapInPandas(
        kernel, schema="id BIGINT, media_type STRING, features ARRAY<DOUBLE>"
    )


def feature_histogram_long(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Long-form integer variant of `extract_features`: one row per
    non-empty histogram bin, (id, media_type, bin INT, count BIGINT).

    Scalar columns hash cleanly in result canonicalizers (an ARRAY column
    does not), and integer counts admit an exact SQL oracle: with 16 bins
    over [0,256) the bin index is the byte's high hex nibble, and
    np.resize's cyclic repeat gives each source byte position j a closed
    form weight  total//n + (1 if j < total%n else 0)  where
    total = side*side*3, side = max(floor(sqrt(n)), 1).
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mtypes, bins, counts = [], [], [], []
            for rid, payload, mtype in zip(pdf["id"], pdf["media"], pdf["media_type"]):
                arr = decode_media(bytes(payload), mtype, fake_decode)
                hist, _ = np.histogram(arr.ravel(), bins=FEATURE_DIM, range=(0, 256))
                for b, c in enumerate(hist):
                    if c > 0:
                        ids.append(rid)
                        mtypes.append(mtype)
                        bins.append(b)
                        counts.append(int(c))
            yield pd.DataFrame(
                {"id": ids, "media_type": mtypes, "bin": bins, "count": counts}
            )

    return media.mapInPandas(
        kernel, schema="id BIGINT, media_type STRING, bin INT, count BIGINT"
    )


def resize_images(media: DataFrame, w: int, h: int, fake_decode: bool = True) -> DataFrame:
    """Resize stub: decode (stub) → nearest-neighbor subsample → re-encode
    byte length only (no codec).  Returns (id, width, height, n_bytes)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload, mtype in zip(pdf["media"], pdf["media_type"]):
                arr = decode_media(bytes(payload), mtype, fake_decode)
                ys = np.linspace(0, arr.shape[0] - 1, h).astype(int)
                xs = np.linspace(0, arr.shape[1] - 1, w).astype(int)
                small = arr[ys][:, xs]
                out.append(int(small.nbytes))
            yield pd.DataFrame(
                {"id": pdf["id"], "width": w, "height": h, "n_bytes": out}
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        kernel, schema="id BIGINT, width INT, height INT, n_bytes BIGINT"
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: split the blob into n_frames
    equal byte chunks (stand-in for keyframe extraction) and emit one row
    per frame — the explode-shaped output a real sampler would produce."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, sizes, csums = [], [], [], []
            for rid, payload in zip(pdf["id"], pdf["media"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for fi in range(n_frames):
                    chunk = b[fi * step : (fi + 1) * step]
                    if not chunk:
                        break
                    ids.append(rid)
                    frames.append(fi)
                    sizes.append(len(chunk))
                    csums.append(int(np.frombuffer(chunk, dtype=np.uint8).sum()))
            yield pd.DataFrame(
                {"id": ids, "frame": frames, "n_bytes": sizes, "byte_sum": csums}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        kernel, schema="id BIGINT, frame INT, n_bytes BIGINT, byte_sum BIGINT"
    )
