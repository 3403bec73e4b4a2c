"""Real media decoders (operators/multimodal.py): pure-numpy parsers for
codec-free formats — PPM P6, uncompressed 24-bit BMP, PCM-16 WAV — must
roundtrip hand-built payloads exactly, and the fake path must stay
clearly gated for codec formats."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from filter_vectordb_spark.operators.multimodal import (
    decode_bmp,
    decode_media,
    decode_ppm,
    decode_wav,
)


def _ppm_bytes(img: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = img.shape
    head = f"P6\n{'# synthetic fixture' if comment else ''}\n{w} {h}\n255\n"
    head = head.replace("\n\n", "\n") if not comment else head
    return head.encode() + img.tobytes()


def _bmp_bytes(img: np.ndarray, bottom_up: bool = True) -> bytes:
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = img[::-1] if bottom_up else img
    raster = bytearray()
    for r in rows:
        raster += r[..., ::-1].tobytes()  # RGB → BGR
        raster += b"\x00" * (stride - w * 3)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
                      len(raster), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(raster)


def _wav_bytes(samples: np.ndarray, channels: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * 2 * channels,
                      2 * channels, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_ppm_roundtrip_exact():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(_ppm_bytes(img)), img)
    assert np.array_equal(decode_ppm(_ppm_bytes(img, comment=True)), img)


def test_bmp_roundtrip_exact_both_row_orders():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)  # stride padding hit
    assert np.array_equal(decode_bmp(_bmp_bytes(img, bottom_up=True)), img)
    assert np.array_equal(decode_bmp(_bmp_bytes(img, bottom_up=False)), img)


def test_wav_roundtrip_exact_mono_and_stereo():
    rng = np.random.RandomState(3)
    mono = rng.randint(-32768, 32767, 64).astype(np.int16)
    assert np.array_equal(decode_wav(_wav_bytes(mono)), mono)
    stereo = rng.randint(-32768, 32767, (32, 2)).astype(np.int16)
    assert np.array_equal(decode_wav(_wav_bytes(stereo.ravel(), channels=2)), stereo)


def test_decode_media_sniffs_real_formats_without_fake_flag():
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(decode_media(_ppm_bytes(img), "image", fake_decode=False), img)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x89PNG\r\n\x1a\n....", "image", fake_decode=False)


def test_media_decode_stats_matches_closed_form(spark):
    """The registered end-to-end path: real payloads → real decoders →
    sums equal to the closed-form generator (the oracle's arithmetic)."""
    from filter_vectordb_spark.operators.multimodal import (
        _media_values,
        media_decode_stats,
        media_real_table,
    )

    pdf = media_decode_stats(media_real_table(spark, n=20)).toPandas()
    assert len(pdf) == 20
    for r in pdf.itertuples():
        if r.media_type == "image":
            want = int(_media_values(int(r.id), 576).sum())
            assert r.n_values == 576
        else:
            want = int((_media_values(int(r.id), 64) - 125).sum())
            assert r.n_values == 64
        assert r.value_sum == want, (r.id, r.media_type)
