"""Remote artifact fetch (SURVEY.md §2.1 S7).

The reference pulls datasets and PREBUILT indexes from URLs before
loading (`benchmark/dataset_io.download_accelerated`, used at
`filter/faiss/faiss.py:201`, `ood/diskann/diskann-in-mem.py:139-142`).
The Spark-native analog: fetch-once to shared storage with checksum
verification and an atomic rename (concurrent executors/drivers see
either nothing or the complete file, never a torn write), then hand the
local path to the distributed binary sources.

On a real cluster the fetch happens once per shared filesystem — the
distributed READ is where Spark parallelism lives (sources/binfmt.py,
sources/spmat.py); parallelizing the download itself (the reference's "accelerated"
parallel byte-range fetch) is deliberately out of scope in a container
without network: `file://` URLs exercise the identical code path and
are what the tests pin.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def fetch_artifact(url: str, dest: str, sha256: str | None = None, chunk_bytes: int = 1 << 20) -> str:
    """Fetch `url` to `dest` unless it already exists; optional sha256
    verification; atomic rename so a partial download is never visible.
    Returns `dest`."""
    if os.path.exists(dest):
        if sha256 is not None:
            got = _sha256(dest, chunk_bytes)
            if got != sha256:
                raise ValueError(
                    f"existing {dest!r} fails checksum: {got} != {sha256}"
                )
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    h = hashlib.sha256()
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        while True:
            chunk = r.read(chunk_bytes)
            if not chunk:
                break
            h.update(chunk)
            f.write(chunk)
    if sha256 is not None and h.hexdigest() != sha256:
        os.unlink(tmp)
        raise ValueError(f"downloaded {url!r} fails checksum: {h.hexdigest()} != {sha256}")
    os.replace(tmp, dest)  # atomic on POSIX
    return dest


def _sha256(path: str, chunk_bytes: int) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def fetch_dense_bin(
    spark: SparkSession,
    url: str,
    dest: str,
    kind: str,
    sha256: str | None = None,
    rows_per_chunk: int = 65536,
) -> DataFrame:
    """S7 end-to-end: fetch a remote .u8bin/.i8bin/.fbin once, then read
    it through the distributed binary source — the reference's
    download-then-read_index lifecycle (`filter/faiss/faiss.py:195-206`)."""
    from filter_vectordb_spark.sources.binfmt import read_dense_bin

    fetch_artifact(url, dest, sha256)
    return read_dense_bin(spark, dest, kind, rows_per_chunk)


def fetch_spmat(
    spark: SparkSession,
    url: str,
    dest: str,
    sha256: str | None = None,
    rows_per_chunk: int = 65536,
) -> DataFrame:
    """S7 for the sparse track: fetch a spmat CSR blob, read distributed."""
    from filter_vectordb_spark.sources.spmat import read_spmat

    fetch_artifact(url, dest, sha256)
    return read_spmat(spark, dest, rows_per_chunk)
