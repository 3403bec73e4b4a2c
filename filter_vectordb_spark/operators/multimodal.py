"""Multimodal column plumbing (north-star extension, SURVEY.md §7 P7).

Image/audio/video payloads are opaque BINARY columns with typed metadata;
the heavy per-item work (decode, feature extraction, resize, frame
sampling) runs as Arrow-batched pandas kernels over `mapInPandas` — the
same execution shape as the k-NN kernel, so the 100 TB posture is
identical: payloads never leave their scan partition, only small derived
columns shuffle.

Decode boundary (narrowed in r6): formats that need no codec library —
PPM P6 images, uncompressed 24-bit BMP, 16-bit PCM WAV — are decoded
FOR REAL with pure numpy parsers (magic-byte sniffed), exercised
end-to-end by `media_decode_stats` whose DuckDB oracle recomputes the
decoded pixel/sample sums from the closed-form payload generator.
Compressed formats (JPEG/PNG/MP4/…) still need codec libraries absent
from this container, so for those `decode` raises NotImplementedError
unless the clearly-marked deterministic fake (`fake_decode=True`)
stands in — the Spark-side plumbing (schema, batching, UDF signatures,
partition flow) is identical either way.  Byte-level ops (histogram
features, chunk sampling) are real computations on the binary payload.
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


def decode_ppm(b: bytes) -> np.ndarray:
    """REAL decoder — binary PPM (P6): ASCII header (magic, width,
    height, maxval, whitespace/comment separated) then raw RGB triples.
    Returns (H, W, 3) uint8.  Pure parsing; no codec needed."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: three integers after the magic, '#' comments
    # run to end-of-line, a single whitespace byte ends the header
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs no support here")
    pos += 1  # the single whitespace byte after maxval
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def decode_bmp(b: bytes) -> np.ndarray:
    """REAL decoder — uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB): bottom-up rows padded to 4 bytes, BGR order.  Returns
    (H, W, 3) uint8 in RGB."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    header_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if header_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only uncompressed 24-bit BMP decodes without a codec library"
        )
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def decode_wav(b: bytes) -> np.ndarray:
    """REAL decoder — RIFF/WAVE, PCM 16-bit: walk the chunk list to
    `fmt ` and `data`.  Returns int16 samples, shape (n, channels) or
    (n,) for mono.  Pure parsing; no codec needed."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE without fmt/data chunks")
    audio_format, channels, _rate, _bps, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            "only PCM 16-bit WAV decodes without a codec library"
        )
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels) if channels > 1 else samples


def decode_media(payload: bytes, media_type: str, fake_decode: bool) -> np.ndarray:
    """Magic-byte-sniffed decode.  PPM/BMP/PCM-WAV decode FOR REAL (pure
    numpy parsers above); other formats need codec libraries absent from
    this container — fake_decode=True yields a deterministic
    byte-derived array with the right shape contract (H×W×3 uint8 for
    images), else NotImplementedError."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if not fake_decode:
        raise NotImplementedError(
            "compressed media decode (JPEG/PNG/MP4/...) requires codec "
            "libraries not present in this environment; pass "
            "fake_decode=True for the deterministic stand-in"
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


# ----------------------------------------------- real-decoder fixture path

#: Knuth/xxhash multipliers — the same closed-form pattern as
#: sources/synth.py, so a SQL oracle can regenerate every payload value
_MK1 = 2654435761
_MK3 = 2246822519

MEDIA_REAL_N = 200
_PPM_W, _PPM_H = 16, 12
_WAV_SAMPLES = 64


def _media_values(rid: int, n: int) -> np.ndarray:
    js = np.arange(n, dtype=np.int64)
    return (((rid * _MK1) ^ ((js + 1) * _MK3)) >> 11) % 251


def media_real_table(spark, n: int = MEDIA_REAL_N) -> DataFrame:
    """Deterministic GENUINE media payloads — even ids a binary PPM (P6,
    16×12 RGB), odd ids a PCM-16 mono WAV (64 samples) — built from the
    closed-form value pattern so a SQL oracle can recompute what the
    decoders must read back.  Generated partition-parallel; real
    pipelines land the same schema from
    spark.read.format('binaryFile')."""
    import struct

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs, mtypes = [], [], []
            for rid in pdf["id"]:
                rid = int(rid)
                if rid % 2 == 0:
                    px = _media_values(rid, _PPM_W * _PPM_H * 3).astype(np.uint8)
                    blob = (
                        f"P6\n{_PPM_W} {_PPM_H}\n255\n".encode() + px.tobytes()
                    )
                    mtypes.append("image")
                else:
                    sm = (_media_values(rid, _WAV_SAMPLES) - 125).astype("<i2")
                    data = sm.tobytes()
                    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                    blob = (
                        b"RIFF"
                        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                        + b"WAVE"
                        + b"fmt "
                        + struct.pack("<I", len(fmt))
                        + fmt
                        + b"data"
                        + struct.pack("<I", len(data))
                        + data
                    )
                    mtypes.append("audio")
                ids.append(rid)
                blobs.append(blob)
            yield pd.DataFrame({"id": ids, "media": blobs, "media_type": mtypes})

    return spark.range(n).mapInPandas(
        gen, schema="id BIGINT, media BINARY, media_type STRING"
    )


def media_decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode end-to-end: sniff + parse every payload with the pure
    numpy decoders (no fake path — a malformed payload raises), emit
    (id, media_type, n_values, value_sum).  The DuckDB oracle recomputes
    both columns from the closed-form generator, so a parsing bug in
    header math, row padding, channel order, or sample width shows up as
    a value mismatch, not just a crash."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_vals, sums = [], []
            for payload, mtype in zip(pdf["media"], pdf["media_type"]):
                arr = decode_media(bytes(payload), mtype, fake_decode=False)
                n_vals.append(int(arr.size))
                sums.append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_values": n_vals,
                    "value_sum": sums,
                }
            )

    return media.mapInPandas(
        kernel,
        schema="id BIGINT, media_type STRING, n_values BIGINT, value_sum BIGINT",
    )
