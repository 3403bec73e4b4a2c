"""Spmat CSR binary source tests (S2): byte-format parity with the
reference layout (`filter/faiss/faiss.py:63-95`), distributed-writer vs
driver-writer equality, and roundtrip through the distributed reader —
including empty rows and multi-chunk reads."""

from __future__ import annotations

import numpy as np

from filter_vectordb_spark.sources.spmat import (
    read_spmat,
    read_spmat_header,
    write_spmat,
    write_spmat_distributed,
)


def _random_csr(rng, nrow, ncol, empty_rows=()):
    indptr = [0]
    indices, data = [], []
    for r in range(nrow):
        if r in empty_rows:
            indptr.append(indptr[-1])
            continue
        nnz_r = rng.randint(1, ncol // 2)
        cols = np.sort(rng.choice(ncol, size=nnz_r, replace=False))
        indices.extend(cols.tolist())
        data.extend(rng.randint(1, 9, size=nnz_r).tolist())
        indptr.append(indptr[-1] + nnz_r)
    return (
        np.asarray(indptr, dtype=np.int64),
        np.asarray(indices, dtype=np.int32),
        np.asarray(data, dtype=np.float32),
    )


def _long_form(indptr, indices, data):
    rows = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
    return sorted(zip(rows.tolist(), indices.tolist(), data.tolist()))


def test_header_and_roundtrip_with_empty_rows(spark, tmp_path):
    rng = np.random.RandomState(7)
    indptr, indices, data = _random_csr(rng, 57, 40, empty_rows={0, 13, 56})
    path = str(tmp_path / "m.spmat")
    write_spmat(path, indptr, indices, data, ncol=40)
    assert read_spmat_header(path) == (57, 40, int(indptr[-1]))
    # rows_per_chunk=10 → 6 chunks; empty rows simply emit nothing
    got = read_spmat(spark, path, rows_per_chunk=10).toPandas()
    assert (
        sorted(zip(got["row"], got["col"], got["val"]))
        == _long_form(indptr, indices, data)
    )


def test_distributed_writer_matches_driver_writer_bytes(spark, tmp_path):
    rng = np.random.RandomState(11)
    indptr, indices, data = _random_csr(rng, 33, 24, empty_rows={5})
    ref_path = str(tmp_path / "ref.spmat")
    write_spmat(ref_path, indptr, indices, data, ncol=24)

    rows = np.repeat(np.arange(32 + 1)[: len(indptr) - 1], np.diff(indptr))
    t = spark.createDataFrame(
        [(int(r), int(c), float(v)) for r, c, v in zip(rows, indices, data)],
        "row BIGINT, col INT, val FLOAT",
    )
    dist_path = str(tmp_path / "dist.spmat")
    nnz = write_spmat_distributed(t, dist_path, nrow=33, ncol=24)
    assert nnz == int(indptr[-1])
    with open(ref_path, "rb") as a, open(dist_path, "rb") as b:
        assert a.read() == b.read()


def test_reader_is_chunk_invariant(spark, tmp_path):
    rng = np.random.RandomState(3)
    indptr, indices, data = _random_csr(rng, 21, 16)
    path = str(tmp_path / "c.spmat")
    write_spmat(path, indptr, indices, data, ncol=16)
    a = read_spmat(spark, path, rows_per_chunk=4).toPandas()
    b = read_spmat(spark, path, rows_per_chunk=1000).toPandas()
    key = lambda df: sorted(zip(df["row"], df["col"], df["val"]))
    assert key(a) == key(b) == _long_form(indptr, indices, data)
