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

#: byte-aware companion cap (VERDICT r6 #3): a chunk's broadcast payload
#: (rows × ~8 bytes per scalar/list element) must also fit this budget,
#: so a 1536-d query set chunks at ~160k rows instead of shipping a
#: 12 GB broadcast to every executor.  2 GiB keeps the familiar
#: 1M × 192-d bench chunks single-shot (1.5 GB).
BROADCAST_BYTES_BUDGET = 2 << 30

METRICS = ("l2", "ip", "cos")

#: column-block width for blocked per-row top-k selection.  One
#: argpartition over a full (nq, nb) row is erratic on this class of
#: host (measured 0.5-10s on identical 20M-element inputs — introselect's
#: random access pattern is memory-latency-bound); per-block partition +
#: a final partition over nblocks·k survivors is bounded and stable.
TOPK_BLOCK = 2048


def flatten_fixed_list(col, n_rows: int) -> np.ndarray:
    """Zero-copy-ish (n_rows, d) ndarray from an Arrow list column whose
    lists all have equal length d.  ~50× faster than np.stack over the
    per-row object arrays pandas hands back (measured 0.08s vs 4.2s per
    125k × 192 rows) — the reason the scan kernels take Arrow batches."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if n_rows == 0:
        return flat.reshape(0, 0)
    d, rem = divmod(flat.size, n_rows)
    if rem:
        raise ValueError("ragged list column — fixed-length vectors required")
    return flat.reshape(n_rows, d)


def topk_blocked(key: np.ndarray, k: int, block: int = TOPK_BLOCK) -> np.ndarray:
    """Per-row indices of the k SMALLEST entries of an (nr, nc) key
    matrix (unordered — ordering/ties are the global merge's job, exactly
    as with a single argpartition).  Each block is copied contiguous
    before partitioning: introselect over a strided slice of a wide
    matrix is memory-latency-bound (every probe a cache+TLB miss) and
    measured 10-100× the contiguous cost."""
    nr, nc = key.shape
    kk = min(k, nc)
    if kk == nc:
        return np.tile(np.arange(nc), (nr, 1))
    if nc <= block:
        return np.argpartition(np.ascontiguousarray(key), kk - 1, axis=1)[:, :kk]
    cand = []
    for lo in range(0, nc, block):
        blk = np.ascontiguousarray(key[:, lo : lo + block])
        bk = min(k, blk.shape[1])
        if bk == blk.shape[1]:
            cand.append(np.tile(np.arange(lo, lo + bk), (nr, 1)))
        else:
            cand.append(np.argpartition(blk, bk - 1, axis=1)[:, :bk] + lo)
    C = np.concatenate(cand, axis=1)
    V = np.take_along_axis(key, C, axis=1)
    pf = np.argpartition(V, kk - 1, axis=1)[:, :kk]
    return np.take_along_axis(C, pf, axis=1)


def _threshold_merge(
    best_idx: np.ndarray,
    best_val: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    larger: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge sparse (row, col, val) candidates into the dense per-row
    (idx, val) top-kk state; returns (best_idx, best_val, thr) with
    rows sorted best-first so thr (the per-row selection boundary) is
    the last column.  One lexsort over kk·nq + ncand entries — the
    candidate stream is ~kk·ln(nb/chunk) per row on unordered data, so
    this is metadata-sized next to the GEMM."""
    nq, kk = best_idx.shape
    all_r = np.concatenate([np.repeat(np.arange(nq), kk), rows])
    all_c = np.concatenate([best_idx.ravel(), cols])
    all_v = np.concatenate([best_val.ravel(), vals])
    key = -all_v if larger else all_v
    order = np.lexsort((key, all_r))
    ar, ac, av = all_r[order], all_c[order], all_v[order]
    starts = np.flatnonzero(np.r_[True, ar[1:] != ar[:-1]])
    counts = np.diff(np.r_[starts, len(ar)])
    rank = np.arange(len(ar)) - np.repeat(starts, counts)
    keep = rank < kk
    # every row already holds kk dense entries → exactly kk survive per row
    best_idx = ac[keep].reshape(nq, kk)
    best_val = av[keep].reshape(nq, kk)
    return best_idx, best_val, best_val[:, -1].copy()


def gemm_topk(
    Q: np.ndarray,
    qn: np.ndarray | None,
    X: np.ndarray,
    xn: np.ndarray | None,
    metric: str,
    k: int,
    chunk: int = TOPK_BLOCK,
) -> tuple[np.ndarray, np.ndarray]:
    """Fused BLAS + per-row top-k over base rows in CONTIGUOUS chunks:
    G_chunk = Q @ X[lo:hi]ᵀ lands C-contiguous at (nq, chunk), gets its
    per-row top-k immediately, and is freed before the next chunk — peak
    memory is O(nq·chunk) however many rows the Arrow batch carries, and
    no selection ever runs on strided memory (a (nq, 65k) score matrix is
    512 MB whose strided column-blocks cost 10-100× contiguous).

    Selection is THRESHOLD-PRUNED after the first chunk (r8 — the 1M/10M
    exact anchors were selection-bound, not GEMM-bound: introselect costs
    ~10-40 ns/element where a SIMD compare is ~0.5): chunk 0 runs the
    full argpartition and records each row's boundary value; every later
    chunk only compares its scores against that boundary (ties KEPT, so
    the candidate pool matches what argpartition could select from) and
    gathers the few survivors sparsely.  Candidates are merged — and the
    boundary re-tightened — whenever they accumulate past ~4·nq·k, which
    bounds memory and keeps the candidate rate at ~k/seen per element on
    unordered data (≈ nq·k·ln(nb/chunk) total).

    Q/X in the caller's compute dtype; qn/xn float64 squared norms (l2)
    or norms (cos), None for ip.  Returns (idx (nq, kk) into X's rows,
    dist (nq, kk) float64) — unordered within a row.

    Boundary-tie semantics (shared with topk_blocked): when >k candidates
    tie at the k-th distance, the selection keeps an arbitrary — but
    deterministic for a fixed batch/chunk composition — subset; the
    downstream (dist, id asc) ordering then applies only among survivors.
    The deterministic sources make results reproducible run-to-run, but
    a different partitioning could keep a different same-distance id.
    Callers needing strict (dist, id) tie selection must widen k by the
    tie margin or use the expression path — the fixtures' distinct-value
    generators make the case unreachable in every hash-checked row."""
    nq, nb = Q.shape[0], X.shape[0]
    kk = min(k, nb)
    larger = metric in ("ip", "cos")
    best_idx: np.ndarray | None = None
    best_val: np.ndarray | None = None
    thr: np.ndarray | None = None
    cr: list = []  # pending sparse candidates (rows/cols/vals)
    cc: list = []
    cv: list = []
    npend = 0
    cap = max(65_536, 4 * nq * kk)
    for lo in range(0, nb, chunk):
        Xc = X[lo : lo + chunk]
        G = Q @ Xc.T  # (nq, c) C-contiguous
        nc = G.shape[1]
        if metric == "ip":
            # score straight off G (f32 for the integer-exact contract,
            # f64 otherwise) — no full-matrix conversions; only
            # survivors become f64
            D = G
        elif metric == "l2":
            D = qn[:, None] - 2.0 * G.astype(np.float64) + xn[None, lo : lo + chunk]
            np.maximum(D, 0.0, out=D)
        else:  # cos — divide (not reciprocal-multiply) to keep f64
            # rounding identical to the expression path G / (‖q‖·‖x‖)
            D = G.astype(np.float64) / (qn[:, None] * xn[None, lo : lo + chunk])
        if best_idx is None:
            # first chunk: full selection initializes the boundary
            ck = min(kk, nc)
            if ck < nc:
                key0 = -D if larger else D
                p = np.argpartition(key0, ck - 1, axis=1)[:, :ck]
            else:
                p = np.tile(np.arange(nc), (nq, 1))
            v = np.take_along_axis(D, p, axis=1).astype(np.float64)
            if ck < kk:  # nb > chunk but first chunk narrower than kk
                pad = np.zeros((nq, kk - ck), dtype=np.int64)
                fill = np.float64(-np.inf) if larger else np.float64(np.inf)
                v = np.concatenate([v, np.full((nq, kk - ck), fill)], axis=1)
                p = np.concatenate([p, pad], axis=1)
            best_idx, best_val, thr = _threshold_merge(
                (p + lo).astype(np.int64),
                v,
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
                larger,
            )
            continue
        # threshold compare in D's dtype; when the f64 boundary rounds
        # toward "stricter" in f32, step it one ulp looser so no true
        # candidate is lost (ties must stay in the pool)
        if D.dtype == np.float32:
            t = thr.astype(np.float32)
            if larger:
                t = np.where(t > thr, np.nextafter(t, np.float32(-np.inf)), t)
            else:
                t = np.where(t < thr, np.nextafter(t, np.float32(np.inf)), t)
        else:
            t = thr
        m = D >= t[:, None] if larger else D <= t[:, None]
        r, c = np.nonzero(m)
        if len(r):
            cr.append(r)
            cc.append(c + lo)
            cv.append(D[r, c].astype(np.float64))
            npend += len(r)
            if npend > cap:
                best_idx, best_val, thr = _threshold_merge(
                    best_idx,
                    best_val,
                    np.concatenate(cr),
                    np.concatenate(cc),
                    np.concatenate(cv),
                    larger,
                )
                cr, cc, cv = [], [], []
                npend = 0
    if npend:
        best_idx, best_val, thr = _threshold_merge(
            best_idx,
            best_val,
            np.concatenate(cr),
            np.concatenate(cc),
            np.concatenate(cv),
            larger,
        )
    return best_idx, best_val


def _row_payload_bytes(pdf: pd.DataFrame) -> int:
    """Estimated broadcast bytes per query row: 8 per scalar column, 8
    per element of a list/array column (qids + float64 query matrix is
    what the scan kernels actually broadcast).  List lengths are taken
    as the MAX over the first 16 rows (ADVICE r7): fixed-d vector
    columns are unaffected, while ragged columns (variable-length tag
    arrays) no longer let one short first row understate the budget."""
    if len(pdf) == 0:
        return 8
    total = 0
    sample = pdf.iloc[: min(len(pdf), 16)]
    for c in pdf.columns:
        col = sample[c]
        if isinstance(col.iloc[0], (list, tuple, np.ndarray)):
            total += 8 * max(
                (len(v) for v in col if v is not None), default=1
            )
        else:
            total += 8
    return max(total, 8)


def union_query_chunks_df(qdf: DataFrame, score_chunk, empty_schema: str) -> DataFrame:
    """Shared above-the-broadcast-cap contract for a query **DataFrame**:
    slice into chunks of ≤MAX_BROADCAST_QUERIES rows AND
    ≤BROADCAST_BYTES_BUDGET estimated broadcast bytes (rows × 8 per
    scalar/list element — so a 1536-d set chunks ~8× finer than a 192-d
    one), build one scored scan per chunk via `score_chunk(chunk_pdf)`,
    union the streams.  qids are disjoint across chunks, so any per-qid
    top-k downstream is identical to a single-shot run; executor memory
    stays bounded by one chunk's broadcast, and DRIVER memory by one
    chunk's rows.  Below both caps this is a single Arrow collect (one
    chunk — the unchanged fast path, probed with a limit(cap)); above
    the row cap, chunks stream through an Arrow-packed local iterator —
    each executor batch ships as ONE binary IPC blob, so the driver
    decodes columnar buffers instead of converting Rows one at a time
    (the r6 per-row tuple loop measured minutes of driver CPU per 1M-row
    chunk; this path builds a chunk in seconds) and never holds more
    than one chunk of query rows.  An empty query frame returns an empty
    typed DataFrame (`empty_schema`) instead of crashing in the kernel
    builder.

    Used by EVERY scan family — the vectorized k-NN join, the filtered
    scan, the PQ/SQ/IVF/IVF+PQ/IVF+SQ scans, and the tag-pair route —
    one implementation so the caps, streaming, and empty-input semantics
    cannot drift apart (they did once; see tests)."""
    import filter_vectordb_spark.operators.knn as _knn  # late-bound caps (tests patch them)

    spark = qdf.sparkSession
    cap = _knn.MAX_BROADCAST_QUERIES
    head = qdf.limit(cap).toPandas()
    if len(head) == 0:
        return spark.createDataFrame([], empty_schema)
    chunk_rows = int(
        min(cap, max(1, _knn.BROADCAST_BYTES_BUDGET // _row_payload_bytes(head)))
    )
    parts: list[DataFrame] = []
    if len(head) < cap:
        return pandas_query_chunks(head, score_chunk)
    del head  # above the row cap: re-stream the full set chunk-by-chunk

    def pack(it):
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, batch.schema) as w:
                w.write_batch(batch)
            yield pa.RecordBatch.from_pydict(
                {"blob": pa.array([sink.getvalue().to_pybytes()], type=pa.binary())}
            )

    import pyarrow as pa

    packed = qdf.mapInArrow(pack, schema="blob binary")
    pend: list = []  # accumulated Arrow tables, < chunk_rows total
    npend = 0

    def flush() -> None:
        nonlocal pend, npend
        parts.append(score_chunk(pa.concat_tables(pend).to_pandas()))
        pend, npend = [], 0

    for row in packed.toLocalIterator(prefetchPartitions=True):
        t = pa.ipc.open_stream(row["blob"]).read_all()
        while npend + t.num_rows >= chunk_rows:
            take = chunk_rows - npend
            if take:
                pend.append(t.slice(0, take))
                npend += take
            flush()
            t = t.slice(take)
        if t.num_rows:
            pend.append(t)
            npend += t.num_rows
    if npend:
        flush()
    return _union_all(parts)


def pandas_query_chunks(pdf: pd.DataFrame, score_chunk) -> DataFrame:
    """Byte-cap slicing of an ALREADY-COLLECTED query frame: one
    score_chunk per ≤BROADCAST_BYTES_BUDGET slice (also ≤ the row cap),
    streams unioned.  Callers that hold the query batch driver-side
    anyway (the routed filtered k-NN) share the exact cap semantics of
    union_query_chunks_df through this."""
    import filter_vectordb_spark.operators.knn as _knn  # late-bound caps

    chunk_rows = int(
        min(
            _knn.MAX_BROADCAST_QUERIES,
            max(1, _knn.BROADCAST_BYTES_BUDGET // _row_payload_bytes(pdf)),
        )
    )
    if len(pdf) <= chunk_rows:
        return score_chunk(pdf)  # the unchanged single-shot fast path
    return _union_all(
        [
            score_chunk(pdf.iloc[lo : lo + chunk_rows].reset_index(drop=True))
            for lo in range(0, len(pdf), chunk_rows)
        ]
    )


def _union_all(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def task_topk_merge(qids, ids, dists, k: int, largest: bool, col: str = "dist"):
    """Per-qid top-k over a task's accumulated (qid, id, dist) partials,
    kept in the downstream global merge's exact order (dist best-first,
    id asc) — one vectorized lexsort, no per-query Python loop.  Bounds
    what a task ships into the merge shuffle at nq×k rows however many
    groups/batches it scored.  Returns an Arrow RecordBatch."""
    import pyarrow as pa

    key = -dists if largest else dists
    order = np.lexsort((ids, key, qids))
    aq, ai, ad = qids[order], ids[order], dists[order]
    starts = np.flatnonzero(np.r_[True, aq[1:] != aq[:-1]])
    counts = np.diff(np.r_[starts, len(aq)])
    rank = np.arange(len(aq)) - np.repeat(starts, counts)
    keep = rank < k
    return pa.RecordBatch.from_pydict(
        {"qid": aq[keep], "id": ai[keep], col: ad[keep]}
    )


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
    compute_dtype: str = "float64",
    base_dir: str | None = None,
) -> DataFrame:
    """Returns (qid BIGINT, id BIGINT, dist DOUBLE, rank INT), rank 1..k.

    compute_dtype="float32" runs the BLAS block in single precision —
    ~30× faster on this host's OpenBLAS build (502 vs 16 GFLOPS
    measured) and EXACT, not approximate, when both sides are
    integer-valued with |component| ≤ 255 and d ≤ 192: every product
    (≤ 65025) and every partial dot-product sum (≤ 192·65025 < 2²⁴) is
    an integer float32 represents exactly, so G == the float64 result
    bit-for-bit (asserted in tests/test_knn.py).  The distance assembly
    and emitted dist stay float64 either way.  Callers with genuine
    float embeddings must keep the float64 default.

    base_dir (vectorized strategy only): path of the STAGED base's
    parquet directory.  The scan then reads each file directly with
    pyarrow inside the tasks instead of shipping every vector over the
    executor↔Python Arrow socket per run — the serving-path cost model
    of index/ivfsq._ivfsq_score_chunk_direct (VERDICT r7 #3: the 1M/10M
    exact anchors were Arrow-transfer-bound, ~0.8 GB of emb per run
    moving JVM→Python before any math; repeat runs now serve from the
    OS page cache).  Results are identical to the DataFrame scan — the
    same kernel runs over the same rows; `base` must be that staged
    table (it still supplies the session and the b_id/b_vec schema)."""
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    q = queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qemb"))
    b = base.select(F.col(b_id).alias("id"), F.col(b_vec).alias("emb"))
    if strategy == "expr":
        scored = _score_expr(q, b, metric)
    elif strategy == "vectorized":
        scored = _score_vectorized(q, b, metric, k, compute_dtype, base_dir)
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


def _score_vectorized(
    q: DataFrame,
    b: DataFrame,
    metric: str,
    k: int,
    compute_dtype: str = "float64",
    base_dir: str | None = None,
) -> DataFrame:
    """Arrow-batched numpy kernel: per-batch partial top-k, distances in
    float64 (see knn_join for when the float32 BLAS block stays exact).

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
    if base_dir is not None:
        return union_query_chunks_df(
            q,
            lambda ch: _score_vectorized_chunk_direct(
                ch, b.sparkSession, base_dir, metric, k, compute_dtype
            ),
            "qid LONG, id LONG, dist DOUBLE",
        )
    return union_query_chunks_df(
        q,
        lambda ch: _score_vectorized_chunk(ch, b, metric, k, compute_dtype),
        "qid LONG, id LONG, dist DOUBLE",
    )


def _score_vectorized_chunk(
    qpdf, b: DataFrame, metric: str, k: int, compute_dtype: str = "float64"
) -> DataFrame:
    """Scores arrive in (nq, nb) orientation — G = Q @ Xᵀ lands
    C-contiguous per query row, so the per-row top-k partitions run on
    contiguous memory with NO transposed copy (the (nb, nq) orientation
    needed an ascontiguousarray(-D.T) that measured 96s per 2 GB on this
    host's memory system — worse than the GEMM it followed)."""
    dt = np.dtype(compute_dtype)
    qids = qpdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)
    if dt == np.float32:
        # enforce the documented exactness precondition (knn_join): the
        # f32 GEMM is bit-exact only for integer components, |v| ≤ 255,
        # d ≤ 192.  Full check on the query side (cheap — one pass over
        # the chunk); the base side is spot-checked per Arrow batch.
        if Q.shape[1] > 192 or not (
            np.abs(Q).max(initial=0.0) <= 255 and np.array_equal(Q, np.rint(Q))
        ):
            raise ValueError(
                "compute_dtype='float32' requires integer-valued vectors "
                "with |component| <= 255 and d <= 192 (exactness "
                "precondition); use the float64 default for real-valued "
                "embeddings"
            )
    sc = b.sparkSession.sparkContext
    bc = sc.broadcast((qids, Q))

    def score_batches(it):
        import pyarrow as pa

        bqids, bQ = bc.value
        Qc = bQ.astype(dt)
        qn64 = (bQ * bQ).sum(axis=1)  # float64 always — distance assembly
        qfac = {"l2": qn64, "ip": None, "cos": np.sqrt(qn64)}[metric]
        for batch in it:
            nb = batch.num_rows
            if nb == 0:
                continue
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            X = flatten_fixed_list(batch.column("emb"), nb).astype(dt)
            yield pa.RecordBatch.from_pydict(
                _score_ids_X(bqids, Qc, qfac, ids, X, metric, k, dt)
            )

    return b.mapInArrow(score_batches, schema="qid long, id long, dist double")


def _score_ids_X(bqids, Qc, qfac, ids, X, metric, k, dt) -> dict:
    """Shared per-batch scan body of the DataFrame and direct-read
    vectorized paths: f32 precondition spot-check, norm factors, fused
    GEMM + partial top-k.  Returns the (qid, id, dist) pydict of the
    batch's partial — nq×k rows however many base rows came in."""
    if dt == np.float32:
        # spot-check the f32 exactness precondition on the base
        # side (first row per batch — a full pass would cost a
        # memory-bandwidth sweep per batch)
        r0 = X[0].astype(np.float64)
        if not (np.abs(r0).max(initial=0.0) <= 255 and np.array_equal(r0, np.rint(r0))):
            raise ValueError(
                "compute_dtype='float32' exactness precondition "
                "violated by base vectors (non-integer or |v| > 255)"
            )
    if metric == "ip":
        xfac = None
    else:
        Xf = X if dt == np.float64 else X.astype(np.float64)
        xn = (Xf * Xf).sum(axis=1)
        xfac = xn if metric == "l2" else np.sqrt(xn)
    # Emit the partial top-k UNSORTED: ordering/tie-breaks are the
    # global merge's job (per_group_topk orders by (dist, id)), and
    # a per-query sort here is a Python-loop hot spot at large nq.
    # gemm_topk's boundary-tie pick is deterministic for a given
    # batch composition, which the deterministic sources guarantee.
    part, dist = gemm_topk(Qc, qfac, X, xfac, metric, k)
    return {
        "qid": np.repeat(bqids, part.shape[1]),
        "id": ids[part].ravel(),
        "dist": dist.ravel(),
    }


def _score_vectorized_chunk_direct(
    qpdf, spark, base_dir: str, metric: str, k: int, compute_dtype: str = "float64"
) -> DataFrame:
    """Direct-read twin of _score_vectorized_chunk (VERDICT r7 #3): the
    task list is the staged base's parquet FILES (driver-side glob —
    metadata only); each task opens its file with pyarrow straight from
    shared storage, so vectors move disk/page-cache → Python once with
    no JVM Arrow hop, and repeat runs serve from the OS page cache —
    the same resident-data cost model as the IVF+SQ8 direct serving
    path (index/ivfsq._ivfsq_score_chunk_direct, where the rationale
    and the POSIX-path caveat live).  One task per (file, row-slice):
    files bigger than ~256k rows are split by row-group ranges so a
    32-file staging still fans out across all slots at 10M rows."""
    import glob as _glob

    if "://" in base_dir:
        raise ValueError(
            "base_dir must be a local/shared-filesystem path; URI schemes "
            f"are not supported by the direct-read path: {base_dir!r}"
        )
    files = sorted(_glob.glob(f"{base_dir}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {base_dir}")
    dt = np.dtype(compute_dtype)
    qids = qpdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)
    if dt == np.float32:
        if Q.shape[1] > 192 or not (
            np.abs(Q).max(initial=0.0) <= 255 and np.array_equal(Q, np.rint(Q))
        ):
            raise ValueError(
                "compute_dtype='float32' requires integer-valued vectors "
                "with |component| <= 255 and d <= 192 (exactness "
                "precondition); use the float64 default for real-valued "
                "embeddings"
            )
    bc = spark.sparkContext.broadcast((qids, Q))

    # row-group-aligned slices: pyarrow reads row groups whole, so a
    # (file, rg_lo, rg_hi) unit is an exact partition of the rows
    import pyarrow.parquet as pq

    rg_counts = [(p, pq.ParquetFile(p).num_row_groups) for p in files]
    total_rg = sum(n for _, n in rg_counts)
    target = 4 * spark.sparkContext.defaultParallelism
    # ~target units when row groups abound; one unit per row group
    # otherwise (finer than per-file either way, so a slow core's tail
    # is one small task, the ivfsq-direct lesson)
    step = max(1, total_rg // target)
    units = []
    for p, nrg in rg_counts:
        for lo in range(0, nrg, step):
            units.append((p, lo, min(lo + step, nrg)))
    par = max(1, min(len(units), 4 * spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize(units, par),
        "path STRING, rg_lo INT, rg_hi INT",
    )

    def serve(it):
        import pyarrow as pa
        import pyarrow.parquet as pq

        bqids, bQ = bc.value
        Qc = bQ.astype(dt)
        qn64 = (bQ * bQ).sum(axis=1)
        qfac = {"l2": qn64, "ip": None, "cos": np.sqrt(qn64)}[metric]
        for batch in it:
            for path, lo, hi in zip(
                batch.column("path").to_pylist(),
                batch.column("rg_lo").to_pylist(),
                batch.column("rg_hi").to_pylist(),
            ):
                pf = pq.ParquetFile(path)
                tbl = pf.read_row_groups(
                    list(range(lo, hi)), columns=["id", "emb"]
                )
                n = tbl.num_rows
                if n == 0:
                    continue
                ids = tbl.column("id").to_numpy(zero_copy_only=False)
                X = flatten_fixed_list(tbl.column("emb"), n).astype(dt)
                yield pa.RecordBatch.from_pydict(
                    _score_ids_X(bqids, Qc, qfac, ids, X, metric, k, dt)
                )

    return fdf.mapInArrow(serve, schema="qid long, id long, dist double")


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
