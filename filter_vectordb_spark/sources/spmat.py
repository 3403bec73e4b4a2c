"""Sparse CSR ("spmat") binary reader/writer (SURVEY.md §2.1 S2).

The reference's sparse datasets ship as a single CSR blob
(`filter/faiss/faiss.py:63-95`): little-endian int64 header
[nrow, ncol, nnz], then indptr int64[nrow+1], indices int32[nnz],
data float32[nnz].  Its reader materializes or mmaps the three arrays
whole; the Spark counterpart of mmap-without-materializing is per-task
offset reads — each task pulls ONLY its row range's indptr slice plus the
indices/data slices those rows cover, so the driver touches 24 bytes and
a 100 GB spmat becomes ordinary partition-parallel scan work.

Output is the long form (row, col, val) — the same shape
`operators/sparse.py` scores, because on Spark the inverted index IS the
long-form table.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HEADER_BYTES = 24  # int64 nrow, ncol, nnz


def write_spmat(
    path: str, indptr: np.ndarray, indices: np.ndarray, data: np.ndarray, ncol: int
) -> None:
    """Driver-side writer (test fixtures / small exports) — byte layout of
    the reference's format exactly."""
    nrow = len(indptr) - 1
    nnz = int(indptr[-1])
    if nnz != len(indices) or nnz != len(data):
        raise ValueError(f"inconsistent CSR: indptr nnz {nnz}, indices {len(indices)}, data {len(data)}")
    with open(path, "wb") as f:
        f.write(struct.pack("<qqq", nrow, ncol, nnz))
        f.write(np.asarray(indptr, dtype=np.int64).tobytes())
        f.write(np.asarray(indices, dtype=np.int32).tobytes())
        f.write(np.asarray(data, dtype=np.float32).tobytes())


def read_spmat_header(path: str) -> tuple[int, int, int]:
    with open(path, "rb") as f:
        nrow, ncol, nnz = struct.unpack("<qqq", f.read(HEADER_BYTES))
    return nrow, ncol, nnz


def write_spmat_distributed(
    t: DataFrame,
    path: str,
    nrow: int,
    ncol: int,
    row_col: str = "row",
    col_col: str = "col",
    val_col: str = "val",
) -> int:
    """Distributed spmat writer: indices/data (the O(nnz) payload) are
    seek-written by tasks at offsets derived from the row prefix sums;
    only the header + indptr (the O(nrow) metadata plane — exactly what
    the reference's own reader holds driver-side) is written by the
    driver.  Rows absent from `t` get empty CSR rows.  Returns nnz.
    """

    spark = t.sparkSession
    counts = (
        t.groupBy(row_col)
        .agg(F.count("*").alias("c"))
        .orderBy(row_col)
        .collect()
    )
    row_nnz = np.zeros(nrow, dtype=np.int64)
    for r in counts:
        row_nnz[int(r[row_col])] = r["c"]
    indptr = np.zeros(nrow + 1, dtype=np.int64)
    np.cumsum(row_nnz, out=indptr[1:])
    nnz = int(indptr[-1])

    indices_base = HEADER_BYTES + (nrow + 1) * 8
    data_base = indices_base + nnz * 4
    with open(path, "wb") as f:
        f.write(struct.pack("<qqq", nrow, ncol, nnz))
        f.write(indptr.tobytes())
        f.truncate(data_base + nnz * 4)

    bc_indptr = spark.sparkContext.broadcast(indptr)
    nparts = min(max(nnz * 8 // (32 << 20), 1), spark.sparkContext.defaultParallelism)

    # within-row rank as a window (CSR stores columns ascending per row);
    # computed plan-side so it stays correct however Arrow batches split
    w = Window.partitionBy(row_col).orderBy(col_col)
    ranked = t.select(
        F.col(row_col).alias("row"),
        F.col(col_col).alias("col"),
        F.col(val_col).alias("val"),
        (F.row_number().over(w) - 1).alias("rk"),
    )

    def write_part(it):
        import pandas as pd

        iptr = bc_indptr.value
        written = 0
        with open(path, "r+b") as f:
            for pdf in it:
                if not len(pdf):
                    continue
                rows = pdf["row"].to_numpy(dtype=np.int64)
                cols = pdf["col"].to_numpy(dtype=np.int32)
                vals = pdf["val"].to_numpy(dtype=np.float32)
                pos = iptr[rows] + pdf["rk"].to_numpy(dtype=np.int64)
                order = np.argsort(pos)
                pos, cols, vals = pos[order], cols[order], vals[order]
                breaks = np.where(np.diff(pos) != 1)[0] + 1
                for seg_pos, seg_c, seg_v in zip(
                    np.split(pos, breaks), np.split(cols, breaks), np.split(vals, breaks)
                ):
                    f.seek(indices_base + int(seg_pos[0]) * 4)
                    f.write(seg_c.tobytes())
                    f.seek(data_base + int(seg_pos[0]) * 4)
                    f.write(seg_v.tobytes())
                written += len(rows)
        yield pd.DataFrame({"n": [written]})

    written = (
        ranked.repartitionByRange(nparts, "row")
        .mapInPandas(write_part, schema="n BIGINT")
        .agg({"n": "sum"})
        .collect()[0][0]
    )
    if int(written or 0) != nnz:
        raise ValueError(f"wrote {written} elements, expected nnz={nnz}")
    return nnz


def read_spmat(
    spark: SparkSession, path: str, rows_per_chunk: int = 65536
) -> DataFrame:
    """(row BIGINT, col INT, val FLOAT) from a spmat CSR file.

    The driver reads the 24-byte header only; each task reads its chunk's
    indptr slice, then exactly the indices/data byte ranges those rows
    span — the distributed analog of the reference's mmap path
    (`filter/faiss/faiss.py:75-87`): no array is ever materialized whole.
    """
    nrow, ncol, nnz = read_spmat_header(path)
    indices_base = HEADER_BYTES + (nrow + 1) * 8
    data_base = indices_base + nnz * 4
    chunks = [
        (path, start, min(rows_per_chunk, nrow - start))
        for start in range(0, nrow, rows_per_chunk)
    ]
    nparts = min(len(chunks), spark.sparkContext.defaultParallelism * 2)
    plan = spark.createDataFrame(
        chunks, "path STRING, start BIGINT, nrows INT"
    ).repartition(nparts)

    def read_chunks(it):
        import pandas as pd

        for pdf in it:
            for r in pdf.itertuples():
                iptr = np.fromfile(
                    r.path, dtype=np.int64, count=r.nrows + 1,
                    offset=HEADER_BYTES + r.start * 8,
                )
                lo, hi = int(iptr[0]), int(iptr[-1])
                if hi == lo:
                    continue
                cols = np.fromfile(
                    r.path, dtype=np.int32, count=hi - lo, offset=indices_base + lo * 4
                )
                vals = np.fromfile(
                    r.path, dtype=np.float32, count=hi - lo, offset=data_base + lo * 4
                )
                rows = np.repeat(
                    np.arange(r.start, r.start + r.nrows, dtype=np.int64),
                    np.diff(iptr),
                )
                yield pd.DataFrame({"row": rows, "col": cols, "val": vals})

    return plan.mapInPandas(read_chunks, schema="row BIGINT, col INT, val FLOAT")
