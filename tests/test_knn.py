"""Property tests for the k-NN join and filtered k-NN operators, mirroring
the reference's runtime invariants (SURVEY.md §5: k results, sorted
distances, predicate satisfied, -1 padding)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from filter_vectordb_spark.operators.filtered_knn import filtered_knn
from filter_vectordb_spark.operators.knn import knn_join, topk_as_arrays
from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors
from tests.conftest import SF_DIR

K = 10


@pytest.fixture(scope="module")
def base(spark):
    return dense_vectors(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return dense_queries(spark, SF_DIR).cache()


def test_strategies_agree(spark, base, queries):
    a = knn_join(queries, base, K, strategy="vectorized").select("qid", "rank", "id")
    b = knn_join(queries, base, K, strategy="expr").select("qid", "rank", "id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.mark.parametrize("metric", ["l2", "ip", "cos"])
def test_k_results_sorted(spark, base, queries, metric):
    res = knn_join(queries, base, K, metric=metric).toPandas()
    for qid, grp in res.groupby("qid"):
        assert len(grp) == K
        d = grp.sort_values("rank")["dist"].to_numpy()
        if metric == "l2":
            assert (d[:-1] <= d[1:]).all()
        else:
            assert (d[:-1] >= d[1:]).all()


def test_filtered_results_satisfy_predicate(spark, base, queries):
    res = filtered_knn(queries, base, K)
    joined = (
        res.join(base.select("id", "tags"), "id")
        .join(queries.select("qid", "qtags"), "qid")
        .withColumn("ok", F.size(F.array_intersect("tags", "qtags")) == F.size("qtags"))
    )
    assert joined.filter(~F.col("ok")).count() == 0


def test_padding_rule(spark, base, queries):
    res = knn_join(queries, base, 3)
    arrs = topk_as_arrays(res.filter(F.col("rank") <= 2), 3).toPandas()
    for row in arrs.itertuples():
        assert len(row.neighbors) == 3
        assert row.neighbors[-1] == -1  # padded (`bindings.cpp:787-789`)


def test_vectorized_chunks_above_broadcast_cap(spark, base, queries, monkeypatch):
    """Above the broadcast cap the query set is sliced and unioned — results
    must be identical to the single-shot run (VERDICT r3 'What's wrong' #3)."""
    from filter_vectordb_spark.operators import knn as knn_mod

    want = knn_join(queries, base, K, strategy="vectorized").select(
        "qid", "rank", "id"
    )
    monkeypatch.setattr(knn_mod, "MAX_BROADCAST_QUERIES", 3)  # 8 queries → 3 chunks
    got = knn_join(queries, base, K, strategy="vectorized").select("qid", "rank", "id")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_filtered_scan_chunks_above_broadcast_cap(spark, base, queries, monkeypatch):
    from filter_vectordb_spark.operators import knn as knn_mod
    from filter_vectordb_spark.operators.filtered_knn import filtered_knn_scan

    want = filtered_knn_scan(queries, base, K).select("qid", "rank", "id")
    monkeypatch.setattr(knn_mod, "MAX_BROADCAST_QUERIES", 3)
    got = filtered_knn_scan(queries, base, K).select("qid", "rank", "id")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_byte_budget_chunks_high_dim_queries(spark, base, queries, monkeypatch):
    """VERDICT r6 #3: the broadcast cap is byte-aware — a query set whose
    rows × d × 8 exceeds BROADCAST_BYTES_BUDGET must chunk-and-union even
    below the row cap, with results identical to the single-shot run.
    The fixture queries are 16-d float64 ≈ 136 B/row; a 500-byte budget
    forces ~3-row chunks while MAX_BROADCAST_QUERIES stays at 1M."""
    from filter_vectordb_spark.operators import knn as knn_mod

    want = knn_join(queries, base, K, strategy="vectorized").select(
        "qid", "rank", "id"
    )
    monkeypatch.setattr(knn_mod, "BROADCAST_BYTES_BUDGET", 500)
    got = knn_join(queries, base, K, strategy="vectorized").select("qid", "rank", "id")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_float32_compute_exact_on_integer_vectors(spark):
    """compute_dtype="float32" must be bit-exact on integer-valued uint8
    vectors (products ≤ 65025, partial sums < 2²⁴ — every intermediate is
    a float32-representable integer), for all three metrics' rankings and
    for l2/ip distances (knn_join docstring contract)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base_rows = [(i, rng.randint(0, 251, 192).tolist()) for i in range(400)]
    q_rows = [(i, rng.randint(0, 251, 192).tolist()) for i in range(6)]
    base = spark.createDataFrame(base_rows, "id LONG, emb ARRAY<INT>")
    qs = spark.createDataFrame(q_rows, "qid LONG, qemb ARRAY<INT>")
    for metric in ("l2", "ip"):
        want = (
            knn_join(qs, base, K, metric=metric)
            .orderBy("qid", "rank")
            .collect()
        )
        got = (
            knn_join(qs, base, K, metric=metric, compute_dtype="float32")
            .orderBy("qid", "rank")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want], metric


def test_topk_blocked_matches_argpartition_set():
    """Blocked selection returns exactly the k smallest per row (as a
    set — ordering is the global merge's job) on widths straddling the
    block size, including ragged final blocks and nc <= k."""
    import numpy as np

    from filter_vectordb_spark.operators.knn import topk_blocked

    rng = np.random.RandomState(3)
    for nc in (5, 17, 2048, 2049, 5000):
        key = rng.permutation(nc * 7).reshape(7, nc).astype(np.float64)
        got = topk_blocked(key, 10, block=16)
        want = np.sort(key, axis=1)[:, : min(10, nc)]
        got_vals = np.sort(np.take_along_axis(key, got, axis=1), axis=1)
        assert np.array_equal(got_vals, want), nc


def test_filtered_knn_null_qtags_routes_to_scan(spark, base, queries):
    """ADVICE r7: a null qtags array (None after toPandas) must route
    like the empty conjunction — scan branch, no predicate — in BOTH the
    driver-side router and the scan kernel, not raise TypeError."""
    q_null = queries.select(
        "qid", "qemb", F.lit(None).cast("array<int>").alias("qtags")
    )
    got = filtered_knn(q_null, base, K).select("qid", "rank", "id")
    # no predicate ≡ unfiltered exact k-NN
    want = knn_join(queries, base, K).select("qid", "rank", "id")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_row_payload_bytes_samples_ragged_rows():
    """ADVICE r7: the broadcast byte estimate must not be fooled by a
    short first row of a ragged list column — it samples the first 16
    rows and takes the max list length."""
    import pandas as pd

    from filter_vectordb_spark.operators.knn import _row_payload_bytes

    ragged = pd.DataFrame(
        {
            "qid": range(4),
            "qemb": [[1.0], [1.0] * 100, [1.0] * 50, [1.0] * 100],
        }
    )
    assert _row_payload_bytes(ragged) == 8 + 8 * 100


def test_knn_join_direct_read_equals_dataframe_path(spark, tmp_path):
    """base_dir (the direct pyarrow file read, VERDICT r7 #3) must
    return the exact rows of the DataFrame scan — same kernel over the
    same rows, across metrics and compute dtypes."""
    import numpy as np

    from filter_vectordb_spark.sources.synth import synth_queries, synth_uint8_base

    out = str(tmp_path / "staged_base")
    synth_uint8_base(spark, n=3000).select("id", "emb").repartition(5).write.parquet(out)
    staged = spark.read.parquet(out)
    q = synth_queries(spark, nq=12).select("qid", "qemb")
    for metric, dtype in (("l2", "float64"), ("ip", "float32"), ("cos", "float64")):
        want = knn_join(
            q, staged, K, metric=metric, compute_dtype=dtype
        ).select("qid", "rank", "id", "dist")
        got = knn_join(
            q, staged, K, metric=metric, compute_dtype=dtype, base_dir=out
        ).select("qid", "rank", "id", "dist")
        assert got.exceptAll(want).count() == 0, (metric, dtype)
        assert want.exceptAll(got).count() == 0, (metric, dtype)


def test_knn_join_direct_read_rejects_bad_paths(spark, tmp_path):
    from filter_vectordb_spark.sources.synth import synth_queries, synth_uint8_base

    out = str(tmp_path / "staged_base2")
    synth_uint8_base(spark, n=100).select("id", "emb").write.parquet(out)
    staged = spark.read.parquet(out)
    q = synth_queries(spark, nq=2).select("qid", "qemb")
    with pytest.raises(Exception, match="URI schemes"):
        knn_join(q, staged, K, base_dir="s3://bucket/x").count()
    with pytest.raises(Exception, match="no parquet files"):
        knn_join(q, staged, K, base_dir=str(tmp_path / "nope")).count()


def test_gemm_topk_threshold_pruning_matches_bruteforce():
    """The threshold-pruned selection (r8) must return exactly the k
    best per row on distinct-valued inputs across metrics and dtypes,
    with nb >> chunk so the pruned path and its periodic consolidation
    actually run (chunk=64 forces ~30 threshold chunks and, with
    cap ≈ 4·nq·k, several mid-stream merges)."""
    import numpy as np

    from filter_vectordb_spark.operators.knn import gemm_topk

    rng = np.random.RandomState(11)
    nq, nb, d, k = 7, 2000, 24, 10
    Q64 = rng.rand(nq, d) * 10
    X64 = rng.rand(nb, d) * 10
    for metric in ("l2", "ip", "cos"):
        qn64 = (Q64 * Q64).sum(1)
        xn64 = (X64 * X64).sum(1)
        qn = {"l2": qn64, "ip": None, "cos": np.sqrt(qn64)}[metric]
        xn = {"l2": xn64, "ip": None, "cos": np.sqrt(xn64)}[metric]
        idx, dist = gemm_topk(Q64, qn, X64, xn, metric, k, chunk=64)
        G = Q64 @ X64.T
        if metric == "l2":
            D = qn64[:, None] - 2.0 * G + xn64[None, :]
            want = np.sort(D, axis=1)[:, :k]
            got = np.sort(dist, axis=1)
        else:
            D = G if metric == "ip" else G / (np.sqrt(qn64)[:, None] * np.sqrt(xn64)[None, :])
            want = -np.sort(-D, axis=1)[:, :k]
            got = -np.sort(-dist, axis=1)
        assert np.allclose(got, want, rtol=0, atol=1e-9), metric
        # indices must actually point at those values
        rowv = np.take_along_axis(D, idx, axis=1)
        assert np.allclose(np.sort(rowv, axis=1), np.sort(dist, axis=1)), metric


def test_gemm_topk_threshold_keeps_boundary_ties_f32():
    """f32 scores with many exact boundary ties: the pruned path's
    candidate pool must include tied values (>= / <= compare), so the
    selected VALUE multiset equals brute force even when the k-th place
    ties broadly."""
    import numpy as np

    from filter_vectordb_spark.operators.knn import gemm_topk

    rng = np.random.RandomState(5)
    nq, nb, d, k = 4, 1500, 8, 10
    # coarse integer grid → massive score collisions, f32-exact
    Q = rng.randint(0, 4, size=(nq, d)).astype(np.float32)
    X = rng.randint(0, 4, size=(nb, d)).astype(np.float32)
    idx, dist = gemm_topk(Q, None, X, None, "ip", k, chunk=128)
    D = Q.astype(np.float64) @ X.astype(np.float64).T
    for qi in range(nq):
        want = -np.sort(-D[qi])[:k]
        assert np.array_equal(-np.sort(-dist[qi]), want), qi
