"""Dense binary matrix reader/writer (SURVEY.md §2.1 S1).

The reference's datasets ship as `.u8bin/.i8bin/.fbin`: a little-endian
header of uint32 `n` and uint32 `d`, then `n × d` row-major values — the
format is visible in the reference's writer (`streaming/clustered_data_gen.py:84-88`)
and reader call sites (`README.md:255`).

Scale design: `spark.read.format("binaryFile")` would materialize whole
files as single rows, so instead the driver reads ONLY the 8-byte header,
plans fixed-size row ranges, and each task `np.fromfile`s its own slice
(shared-storage path, the same pattern as Spark's binary record readers).
A 100 GB file becomes ordinary partition-parallel scan work; ids are the
global row indexes, assigned from the chunk offsets with no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

DTYPES = {"u8bin": np.uint8, "i8bin": np.int8, "fbin": np.float32}


def write_dense_bin(path: str, mat: np.ndarray) -> None:
    """Writer (test fixture / export): uint32 n, uint32 d LE header +
    row-major data."""
    n, d = mat.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<II", n, d))
        f.write(np.ascontiguousarray(mat).tobytes())


def read_header(path: str) -> tuple[int, int]:
    with open(path, "rb") as f:
        n, d = struct.unpack("<II", f.read(8))
    return n, d


def read_dense_bin(
    spark: SparkSession,
    path: str,
    kind: str,
    rows_per_chunk: int = 65536,
) -> DataFrame:
    """(id BIGINT, emb ARRAY<...>) from a dense binary file.

    kind ∈ {u8bin, i8bin, fbin}; uint8/int8 load as ARRAY<INT> (exact
    integer domain for K2 distances), fbin as ARRAY<FLOAT>.
    """
    if kind not in DTYPES:
        raise ValueError(f"kind must be one of {sorted(DTYPES)}")
    np_dtype = DTYPES[kind]
    n, d = read_header(path)
    chunks = [
        (path, start, min(rows_per_chunk, n - start), d)
        for start in range(0, n, rows_per_chunk)
    ]
    plan = spark.createDataFrame(
        chunks, "path STRING, start BIGINT, nrows INT, dim INT"
    ).repartition(max(len(chunks) // 1, 1))

    itemsize = np.dtype(np_dtype).itemsize
    out_elem = "FLOAT" if kind == "fbin" else "INT"

    def read_chunks(it):
        import pandas as pd

        for pdf in it:
            for row in pdf.itertuples():
                offset = 8 + row.start * row.dim * itemsize
                arr = np.fromfile(
                    row.path, dtype=np_dtype, count=row.nrows * row.dim, offset=offset
                ).reshape(row.nrows, row.dim)
                if kind == "fbin":
                    vals = [r.astype(np.float32).tolist() for r in arr]
                else:
                    vals = [r.astype(np.int32).tolist() for r in arr]
                yield pd.DataFrame(
                    {
                        "id": np.arange(row.start, row.start + row.nrows, dtype=np.int64),
                        "emb": vals,
                    }
                )

    return plan.mapInPandas(read_chunks, schema=f"id BIGINT, emb ARRAY<{out_elem}>")
