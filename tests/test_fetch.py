"""S7 remote-fetch tests — file:// URLs drive the identical code path
as http(s) without needing network."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from filter_vectordb_spark.sources.binfmt import write_dense_bin
from filter_vectordb_spark.sources.fetch import fetch_artifact, fetch_dense_bin


def _mk_bin(tmp_path, n=40, d=8):
    mat = (np.arange(n * d, dtype=np.int64) % 251).astype(np.uint8).reshape(n, d)
    src = str(tmp_path / "remote" / "base.u8bin")
    (tmp_path / "remote").mkdir()
    write_dense_bin(src, mat)
    return src, mat


def test_fetch_verifies_checksum_and_is_idempotent(tmp_path):
    src, _ = _mk_bin(tmp_path)
    sha = hashlib.sha256(open(src, "rb").read()).hexdigest()
    dest = str(tmp_path / "cache" / "base.u8bin")
    got = fetch_artifact(f"file://{src}", dest, sha256=sha)
    assert got == dest
    mtime = __import__("os").path.getmtime(dest)
    # second fetch: cache hit, no re-download (mtime unchanged)
    fetch_artifact(f"file://{src}", dest, sha256=sha)
    assert __import__("os").path.getmtime(dest) == mtime


def test_fetch_rejects_bad_checksum(tmp_path):
    src, _ = _mk_bin(tmp_path)
    dest = str(tmp_path / "cache" / "bad.u8bin")
    with pytest.raises(ValueError, match="checksum"):
        fetch_artifact(f"file://{src}", dest, sha256="0" * 64)
    assert not __import__("os").path.exists(dest)  # no torn file left


def test_fetch_then_distributed_read(spark, tmp_path):
    src, mat = _mk_bin(tmp_path)
    dest = str(tmp_path / "cache" / "fetched.u8bin")
    df = fetch_dense_bin(spark, f"file://{src}", dest, "u8bin", rows_per_chunk=16)
    pdf = df.toPandas().sort_values("id").reset_index(drop=True)
    assert len(pdf) == len(mat)
    assert [list(r) for r in mat] == [list(e) for e in pdf["emb"]]
