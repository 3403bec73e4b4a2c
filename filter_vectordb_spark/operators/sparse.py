"""Sparse top-k MIPS (SURVEY.md §2.8 Q5/Q6, §2.4 A3, §2.2 F6, §2.5 W4).

The reference's sparse track scores SPLADE vectors by inner product via an
inverted index (linscan, `sparse/linscan/linscan.py:44-56`) or sparse
matmul (`sparse/spmat/spmat.py:53-74`).  The Spark-native logical plan is
identical for both physical strategies there: explode query and document
sparse vectors to long form, equi-join on dimension, weighted-sum
groupBy — i.e. the inverted index IS the shuffle-partitioned long form.

Here the fixture corpus is `documents.text`; term-frequency bag-of-words
gives integer weights, so scores are exact integers and ties resolve
identically on Spark and the DuckDB oracle (id-ascending).

Scale posture: the query side (a few thousand rows × ~50 nnz) broadcasts;
the document long form never shuffles before being reduced to (qid, id)
partial sums — map-side join + partial aggregation.  Frequent-term skew
is irrelevant under a broadcast join (no shuffle by term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filter_vectordb_spark.operators.topk import per_group_topk


def docs_to_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Long-form sparse vectors (id, term, w) with term-frequency weights —
    the reference's CSR rows (`filter/faiss/faiss.py:63-73`) as a DataFrame."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count("*").alias("w"))
    )


def sparsify_alpha(qterms: DataFrame, alpha: float) -> DataFrame:
    """F6 `largest_elements` (`sparse/spmat/spmat.py:16-28`): keep the
    minimal set of largest components whose mass ≥ α·total.  α=1 ⇒ identity.

    Ordering (w desc, term asc) is total, so the prefix is deterministic.
    """
    w_tot = Window.partitionBy("qid")
    w_ord = (
        Window.partitionBy("qid")
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        qterms.withColumn("total", F.sum("w").over(w_tot))
        .withColumn("running", F.sum("w").over(w_ord))
        # keep rows whose predecessor-cumsum is still below the target mass
        .filter((F.col("running") - F.col("w")) < F.lit(alpha) * F.col("total"))
        .drop("total", "running")
    )


def budget_truncate(qterms: DataFrame, m: int) -> DataFrame:
    """W4 budget surrogate: the reference's linscan stops scanning posting
    lists when a time budget runs out (`sparse/linscan/linscan.py:41-42`);
    the deterministic Spark counterpart scores only the top-m query
    dimensions by weight (heaviest posting lists first, like linscan's
    ordering)."""
    w = Window.partitionBy("qid").orderBy(F.col("w").desc(), F.col("term").asc())
    return (
        qterms.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= m)
        .drop("_r")
    )


def sparse_topk(qterms: DataFrame, dterms: DataFrame, k: int) -> DataFrame:
    """Top-k maximum inner product: join on term, accumulate, rank (A3+W1).

    qterms: (qid, term, w) — broadcast side.  dterms: (id, term, w).
    Returns (qid, id, score BIGINT, rank INT).
    """
    q = qterms.select(F.col("qid"), F.col("term"), F.col("w").alias("qw"))
    d = dterms.select(F.col("id"), F.col("term"), F.col("w").alias("dw"))
    scored = (
        d.join(F.broadcast(q), "term")
        .groupBy("qid", "id")
        .agg(F.sum(F.col("qw") * F.col("dw")).alias("score"))
    )
    return per_group_topk(
        scored, ["qid"], [F.col("score").desc(), F.col("id").asc()], k
    ).select("qid", "id", "score", "rank")


def sparse_topk_sharded(
    spark, terms_dir: str, qterms: DataFrame, k: int, budget: int | None = None
) -> DataFrame:
    """Segment-sharded sparse top-k MIPS — the million-doc serving shape
    (linscan's regime, BASELINE row 2: 8.84M-doc MSMARCO-SPLADE).

    The join-aggregate plan (sparse_topk) shuffles every matched
    (qid, id) partial — ~Σ_q Σ_t df(t) rows, 10⁸ at 1M docs × 1k
    queries — before any cut.  At segment scale the cut can happen
    inside the scan instead: the staged long-form corpus lives in
    parquet files each holding COMPLETE documents (the staging writes
    one file per doc-partitioned generator partition — the caller's
    contract, parity-tested), so one task per file can compute its
    docs' FULL scores and emit only its local top-k per query — the shuffle carries nq×k×nfiles rows (~10⁵)
    instead of 10⁸.  This is the inverted-index-as-doc-sharded-segments
    layout every distributed text engine uses; at 100 TB the segment
    list is the metadata and each task streams one segment.

    Per-task kernel (pure numpy, no scipy in the container):
    binary-search each broadcast (qid, term, qw) posting into the
    segment's term-sorted rows (the staged layout arrives pre-sorted —
    profiled: an in-kernel 3.7M-row argsort cost more than all scoring
    under 32-way memory contention; unsorted inputs still work and pay
    it), expand the hit ranges vectorized, then scatter the partial
    products into a DENSE (nq × id-range) score block with one bincount
    and cut it with the blocked top-k — the spmat engine's Q·Dᵀ sparse
    matmul with a dense accumulator.  Range-partitioned staging makes
    the id range ≈ the doc count; segments whose nq × range block would
    exceed ~512 MB fall back to a lexsort-group path.

    qterms must fit the broadcast budget (the reference's query sets
    are ≤100k rows × ~tens of nnz).  Returns (qid, id, score, rank) —
    identical to sparse_topk over the same corpus (parity-tested).

    `budget`: linscan's traversal cap (Q5/W4 — `sparse/linscan` scores
    postings in decreasing-impact order until the budget runs out;
    its published 101 QPS row is the budgeted ≥0.9-recall point, not
    exhaustive scoring).  With budget=B, each (query-term, segment)
    range contributes only its FIRST min(B, df) postings — which are
    the highest-weight ones when the staging sorted segments by
    (term asc, w desc), the impact-ordered layout
    (`_synth_sparse8m84_terms_dir`).  Scores become lower bounds;
    recall vs the exact scan is measured and the operating budget is
    picked as the smallest clearing the track's 0.9 gate (the
    reference's own operating-point rule).  budget=None is the exact
    path.  Budgeted matches are sparse, so they take the
    lexsort-group kernel unconditionally — no dense block."""
    import glob as _glob

    import numpy as np

    if "://" in terms_dir:
        raise ValueError(
            "terms_dir must be a local/shared-filesystem path; URI "
            f"schemes are not supported by the direct-read path: {terms_dir!r}"
        )
    files = sorted(_glob.glob(f"{terms_dir}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {terms_dir}")
    qpdf = qterms.select("qid", "term", "w").toPandas()
    bq = (
        qpdf["qid"].to_numpy(dtype=np.int64),
        qpdf["term"].to_numpy(dtype=np.int64),
        qpdf["w"].to_numpy(dtype=np.int64),
    )
    bc = spark.sparkContext.broadcast(bq)
    par = max(1, min(len(files), 4 * spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in files], par),
        "path STRING",
    )

    def serve(it):
        import pyarrow.parquet as pq

        from filter_vectordb_spark.operators.knn import task_topk_merge, topk_blocked

        qid_arr, qterm_arr, qw_arr = bc.value
        # dense query-row index (qids are arbitrary longs in general)
        uq, qrow = np.unique(qid_arr, return_inverse=True)
        nq = len(uq)
        for batch in it:
            for path in batch.column("path").to_pylist():
                tbl = pq.read_table(path, columns=["id", "term", "w"])
                n = tbl.num_rows
                if n == 0:
                    continue
                did = tbl.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
                dterm = tbl.column("term").to_numpy(zero_copy_only=False).astype(np.int64)
                dw = tbl.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
                # posting lists must be binary-searchable term ranges:
                # the staged layout arrives term-sorted (a one-pass
                # check), arbitrary inputs pay the argsort here
                if np.all(dterm[1:] >= dterm[:-1]):
                    st, s_did, sw = dterm, did, dw
                else:
                    order = np.argsort(dterm, kind="stable")
                    st, s_did, sw = dterm[order], did[order], dw[order]
                lo = np.searchsorted(st, qterm_arr, side="left")
                hi = np.searchsorted(st, qterm_arr, side="right")
                counts = hi - lo
                if budget is not None:
                    # impact-ordered traversal cap: the first `budget`
                    # rows of a (term asc, w desc)-sorted range are the
                    # highest-weight postings — linscan's budget scan
                    counts = np.minimum(counts, budget)
                total = int(counts.sum())
                if total == 0:
                    continue
                # vectorized range expansion: positions of every
                # (query-term, matching segment row) pair
                starts = np.repeat(lo, counts)
                cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
                pos = starts + (np.arange(total) - np.repeat(cum, counts))
                pq_ = np.repeat(qrow, counts)
                pval = np.repeat(qw_arr, counts) * sw[pos]
                # dense doc index over the segment's ID RANGE (gap docs
                # just leave zero columns the nz filter drops): no
                # factorize/unique pass at all — the range-partitioned
                # staging makes width ≈ ndocs
                dmin = int(did.min())
                width = int(did.max()) - dmin + 1
                # budgeted matches are sparse (nq x nnz x budget rows,
                # not nq x width candidates) — the dense block would be
                # mostly zero-traffic; group the triplets instead
                if budget is None and nq * width <= 64_000_000:
                    pdoc = s_did[pos] - dmin
                    # dense accumulate: one scatter pass + blocked top-k
                    M = np.bincount(
                        pq_ * width + pdoc, weights=pval, minlength=nq * width
                    ).reshape(nq, width)
                    kk = min(k, width)
                    # integer scores below 2^24 are exactly representable
                    # in f32, so selection on an f32 view compares the
                    # same values at 1/4 the memory bandwidth (measured
                    # 1.51 s -> 0.39 s per 8.84M-corpus segment); the
                    # guard keeps arbitrary-weight corpora on the exact
                    # f64 sweep.  Emitted scores stay the f64 truth.
                    Msel = M if M.max() >= 16_777_216.0 else M.astype(np.float32)
                    part = topk_blocked(-Msel, kk)
                    qrows = np.arange(nq)[:, None]
                    vals = M[qrows, part]
                    nz = vals > 0  # zero score = no shared term, not a hit
                    yield task_topk_merge(
                        np.repeat(uq, kk)[nz.ravel()],
                        (part + dmin).ravel()[nz.ravel()],
                        vals.ravel()[nz.ravel()].astype(np.int64),
                        k,
                        largest=True,
                        col="score",
                    )
                else:
                    # sort-group fallback for sparse/huge id ranges
                    pid = s_did[pos]
                    gorder = np.lexsort((pid, pq_))
                    gq, gi, gv = pq_[gorder], pid[gorder], pval[gorder]
                    bounds = np.flatnonzero(
                        np.r_[True, (gq[1:] != gq[:-1]) | (gi[1:] != gi[:-1])]
                    )
                    sums = np.add.reduceat(gv, bounds)
                    yield task_topk_merge(
                        uq[gq[bounds]],
                        gi[bounds],
                        sums,
                        k,
                        largest=True,
                        col="score",
                    )

    scored = fdf.mapInArrow(serve, schema="qid long, id long, score long")
    return per_group_topk(
        scored, ["qid"], [F.col("score").desc(), F.col("id").asc()], k
    ).select("qid", "id", "score", "rank")
