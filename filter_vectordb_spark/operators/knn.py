"""Exact k-NN join (SURVEY.md §2.3 J3) — the engine's fundamental operator.

Semantics: for each query row, the k nearest rows of the base set under a
metric, ties broken by id ascending, results ranked 1..k.  The reference
implements this as brute-force SIMD kernels + per-query heaps
(`filter/faiss/faiss.py:395-418`, `uint8_knn.hpp:39-82`,
`hnsw/bruteforce.h`); the Spark-native design is:

  broadcast(queries)  ×  base (partitioned, arbitrarily large)
        │
        ├─ strategy="expr":  crossJoin + codegen'd distance expression
        │                    + window top-k   (pure JVM, zero Python)
        │
        └─ strategy="vectorized":  mapInPandas over base partitions,
                                   float64 BLAS block — per-Arrow-batch
                                   partial top-k (nq×k rows out per batch)
                                   → global final top-k (W3 merge)

Scale posture (100 TB): the base side is never collected or shuffled in
full — only nq×k rows per Arrow batch leave the scan stage, then one
shuffle of nq×k×nbatches rows for the final merge.  Queries must be the
provably-small side (the reference's query sets are 10k-100k rows; the
broadcast cap guards this).

The vectorized path mirrors the reference's dot-trick kernel
(`uint8_knn.hpp:9-29`: dist = ‖x‖² − 2·x·q + ‖q‖²) but in float64, so
rankings agree with the exact expression path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filter_vectordb_spark.functions.distance import cosine_sim, dot, l2_sq
from filter_vectordb_spark.operators.topk import per_group_topk

#: refuse to broadcast a query side bigger than this (rows)
MAX_BROADCAST_QUERIES = 1_000_000

METRICS = ("l2", "ip", "cos")


def union_query_chunks(qpdf, spark, score_chunk, empty_schema: str) -> DataFrame:
    """Shared above-the-broadcast-cap contract: slice a driver-side query
    frame into ≤MAX_BROADCAST_QUERIES chunks, build one scored scan per
    chunk via `score_chunk(chunk_pdf)`, union the streams.  qids are
    disjoint across chunks, so any per-qid top-k downstream is identical
    to a single-shot run; executor memory stays bounded by one chunk's
    broadcast.  An empty query frame returns an empty typed DataFrame
    (`empty_schema`) instead of crashing in the kernel builder.

    Used by the vectorized k-NN join, the filtered scan, and the PQ/SQ
    ADC scans — one implementation so the cap and empty-input semantics
    cannot drift apart (they did once; see tests)."""
    if len(qpdf) == 0:
        return spark.createDataFrame([], empty_schema)
    cap = MAX_BROADCAST_QUERIES
    parts = [score_chunk(qpdf.iloc[lo : lo + cap]) for lo in range(0, len(qpdf), cap)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def union_query_chunks_df(qdf: DataFrame, score_chunk, empty_schema: str) -> DataFrame:
    """union_query_chunks for a query **DataFrame**: driver memory is
    O(cap), not O(total nq).  Below the cap this is a single Arrow
    collect (one chunk — the unchanged fast path, probed with a
    limit(cap)); above it, chunks stream through toLocalIterator so the
    driver never holds more than one chunk of query rows at a time — the
    difference between an 8k bench batch and a 10M-query offline batch.

    Same chunk-disjoint-qids contract as union_query_chunks; callers
    hand the raw query DataFrame instead of pre-collecting it."""
    import filter_vectordb_spark.operators.knn as _knn  # late-bound cap (tests patch it)

    spark = qdf.sparkSession
    cap = _knn.MAX_BROADCAST_QUERIES
    head = qdf.limit(cap).toPandas()
    if len(head) < cap:
        if len(head) == 0:
            return spark.createDataFrame([], empty_schema)
        return score_chunk(head)
    del head  # above the cap: re-stream the full set chunk-by-chunk
    cols = qdf.columns
    parts: list[DataFrame] = []
    buf: list[tuple] = []

    def flush() -> None:
        nonlocal buf
        parts.append(score_chunk(pd.DataFrame(buf, columns=cols)))
        buf = []

    for row in qdf.toLocalIterator(prefetchPartitions=True):
        buf.append(tuple(row))
        if len(buf) >= cap:
            flush()
    if buf:
        flush()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _order(metric: str):
    """l2: smaller is nearer; ip/cos: larger is nearer. Ties → id asc."""
    if metric == "l2":
        return [F.col("dist").asc(), F.col("id").asc()]
    return [F.col("dist").desc(), F.col("id").asc()]


def knn_join(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    metric: str = "l2",
    strategy: str = "vectorized",
    q_id: str = "qid",
    q_vec: str = "qemb",
    b_id: str = "id",
    b_vec: str = "emb",
) -> DataFrame:
    """Returns (qid BIGINT, id BIGINT, dist DOUBLE, rank INT), rank 1..k."""
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    q = queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qemb"))
    b = base.select(F.col(b_id).alias("id"), F.col(b_vec).alias("emb"))
    if strategy == "expr":
        scored = _score_expr(q, b, metric)
    elif strategy == "vectorized":
        scored = _score_vectorized(q, b, metric, k)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return per_group_topk(scored, ["qid"], _order(metric), k).select(
        "qid", "id", "dist", "rank"
    )


def _score_expr(q: DataFrame, b: DataFrame, metric: str) -> DataFrame:
    """Broadcast-nested-loop scoring with a whole-stage-codegen'd distance
    expression. Exact; used as the in-engine oracle for approximate plans."""
    a, c = F.col("qemb"), F.col("emb")
    expr = {"l2": l2_sq, "ip": dot, "cos": cosine_sim}[metric](a, c)
    return b.crossJoin(F.broadcast(q)).select("qid", "id", expr.alias("dist"))


def _score_vectorized(q: DataFrame, b: DataFrame, metric: str, k: int) -> DataFrame:
    """Arrow-batched numpy kernel: per-batch partial top-k, exact in float64.

    Only the partial top-k (nq×k rows per batch) leaves the scan stage —
    the W3 two-phase merge pattern (SURVEY.md §2.5).

    Above the broadcast cap the query set is sliced into ≤cap chunks, each
    scored by its own scan, and the scored streams unioned — qids are
    disjoint across chunks, so the per-qid top-k downstream is identical
    to a single-shot run.  Memory per executor stays bounded by one
    chunk's broadcast matrix AND driver memory by one chunk's rows
    (union_query_chunks_df streams chunks); total work is nq×N either
    way (that is the semantics, not an artifact of chunking).
    """
    return union_query_chunks_df(
        q,
        lambda ch: _score_vectorized_chunk(ch, b, metric, k),
        "qid LONG, id LONG, dist DOUBLE",
    )


def _score_vectorized_chunk(qpdf, b: DataFrame, metric: str, k: int) -> DataFrame:
    qids = qpdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)
    sc = b.sparkSession.sparkContext
    bc = sc.broadcast((qids, Q))

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bQ = bc.value
        qn = (bQ * bQ).sum(axis=1)
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            G = X @ bQ.T  # (nb, nq) BLAS block
            if metric == "l2":
                xn = (X * X).sum(axis=1)
                D = xn[:, None] - 2.0 * G + qn[None, :]
                np.maximum(D, 0.0, out=D)
                largest = False
            elif metric == "ip":
                D = G
                largest = True
            else:  # cos
                xn = np.sqrt((X * X).sum(axis=1))
                D = G / (xn[:, None] * np.sqrt(qn)[None, :])
                largest = True
            kk = min(k, len(ids))
            # Partition along CONTIGUOUS rows: argpartition down the
            # columns of the row-major (nb, nq) matrix strides nq·8 bytes
            # per element — 50s/batch at nq=8k where the transposed copy
            # (0.2s for 200 MB) plus row-wise partition is <1s.
            keyT = np.ascontiguousarray((-D if largest else D).T)  # (nq, nb)
            if kk < len(ids):
                part = np.argpartition(keyT, kk - 1, axis=1)[:, :kk]
            else:
                part = np.tile(np.arange(len(ids))[None, :], (len(bqids), 1))
            # Emit the partial top-k UNSORTED: ordering/tie-breaks are the
            # global merge's job (per_group_topk orders by (dist, id)), and
            # a per-query sort here is a Python-loop hot spot at large nq
            # (8k queries × batches of lexsorts cost minutes; this gather
            # is pure numpy).  argpartition's boundary-tie pick is
            # deterministic for a given batch composition, which the
            # deterministic sources guarantee.
            qrows = np.arange(len(bqids))[:, None]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(bqids, part.shape[1]),
                    "id": ids[part].ravel(),
                    "dist": D[part, qrows].ravel(),
                }
            )

    return b.mapInPandas(score_batches, schema="qid long, id long, dist double")


def pairwise_scores(
    df: DataFrame, metric: str = "l2", q_vec: str = "qemb", b_vec: str = "emb"
) -> DataFrame:
    """(qid, id, dist): row-aligned exact scores over candidate pairs via
    an Arrow kernel — each row carries its own query vector (the
    candidate-join shape), so this is an elementwise batch op, not a
    matrix product.  metric ∈ METRICS with the J3 semantics (l2 = L2²
    ascending-better, ip/cos descending-better).

    Use this instead of the distance expressions when candidate volume is
    large: Catalyst evaluates higher-order array lambdas interpreted
    (outside whole-stage codegen), which at ~10⁶ pairs × 192-d is minutes
    where the numpy kernel is milliseconds.
    """
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")

    def kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf[q_vec].to_numpy()).astype(np.float64)
            X = np.stack(pdf[b_vec].to_numpy()).astype(np.float64)
            if metric == "l2":
                d = ((Q - X) ** 2).sum(axis=1)
            elif metric == "ip":
                d = (Q * X).sum(axis=1)
            else:  # cos
                d = (Q * X).sum(axis=1) / (
                    np.sqrt((Q * Q).sum(axis=1)) * np.sqrt((X * X).sum(axis=1))
                )
            yield pd.DataFrame(
                {"qid": pdf["qid"], "id": pdf["id"], "dist": d}
            )

    return df.select("qid", "id", q_vec, b_vec).mapInPandas(
        kern, schema="qid long, id long, dist double"
    )


def pairwise_l2_scores(df: DataFrame, q_vec: str = "qemb", b_vec: str = "emb") -> DataFrame:
    """L2² special case of pairwise_scores (the original name, kept for
    the callers that are inherently L2 — PQ/SQ reconstruction rescore)."""
    return pairwise_scores(df, "l2", q_vec, b_vec)


def topk_as_arrays(result: DataFrame, k: int, pad: bool = True) -> DataFrame:
    """Collapse (qid, id, rank) rows into the reference's result-matrix form
    (qid, neighbors ARRAY<BIGINT>), ascending by rank, padded to k with -1
    (`bindings.cpp:787-789` pads with sentinel ids)."""
    arr = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank"), F.col("id")))
        ),
        lambda s: s["id"],
    )
    out = result.groupBy("qid").agg(arr.alias("neighbors"))
    if pad:
        pad_arr = F.array_repeat(F.lit(-1).cast("long"), k)
        out = out.withColumn(
            "neighbors",
            F.slice(F.concat(F.col("neighbors"), pad_arr), 1, k),
        )
    return out
