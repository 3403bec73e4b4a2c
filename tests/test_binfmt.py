"""Binary matrix format (S1) roundtrip tests for all three dtypes."""

from __future__ import annotations

import os

import numpy as np
import pytest

from filter_vectordb_spark.sources.binfmt import (
    read_dense_bin,
    read_header,
    write_dense_bin,
)


@pytest.mark.parametrize(
    "kind,dtype,lo,hi",
    [("u8bin", np.uint8, 0, 255), ("i8bin", np.int8, -128, 127), ("fbin", np.float32, -1, 1)],
)
def test_roundtrip(spark, tmp_path, kind, dtype, lo, hi):
    rng = np.random.RandomState(7)
    if kind == "fbin":
        mat = rng.uniform(lo, hi, size=(257, 12)).astype(dtype)
    else:
        mat = rng.randint(lo, hi + 1, size=(257, 12)).astype(dtype)
    path = str(tmp_path / f"m.{kind}")
    write_dense_bin(path, mat)
    assert read_header(path) == (257, 12)
    # chunk size < n so multiple tasks exercise the offset math
    df = read_dense_bin(spark, path, kind, rows_per_chunk=100)
    got = df.toPandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 257
    back = np.stack(got["emb"].to_numpy())
    if kind == "fbin":
        assert np.allclose(back, mat, rtol=0, atol=0)
    else:
        assert (back == mat.astype(np.int32)).all()


def test_header_matches_reference_layout(tmp_path):
    """Byte-level check of the header the reference writes
    (`streaming/clustered_data_gen.py:84-88`): uint32 n, uint32 d, LE."""
    mat = np.arange(6, dtype=np.uint8).reshape(2, 3)
    path = str(tmp_path / "t.u8bin")
    write_dense_bin(path, mat)
    raw = open(path, "rb").read()
    assert raw[:4] == (2).to_bytes(4, "little")
    assert raw[4:8] == (3).to_bytes(4, "little")
    assert raw[8:] == bytes(range(6))
