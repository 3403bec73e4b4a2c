"""IVF+SQ8 composed index — the reference's EXACT faiss indexkey
(`IVF16384,SQ8`, `filter/faiss/faiss.py:133`) as lake tables.

Same architecture as index/ivfpq.py with the product quantizer swapped
for the per-dimension affine codec (index/sq.py): the coarse k-means
partitioner prunes WHICH rows are scanned, the 1-byte-per-component SQ
codes decide HOW CHEAPLY each surviving row is scored.

  build  = IVF assignment (id → centroid_id)  ⋈  SQ codes (id → codes)
           written `partitionBy("centroid_id")`; the affine grid
           (pos, mn, mx) rides alongside — d rows, kilobytes.
  search = rank centroids per query driver-side (nlist rows), scan only
           the probed partitions ONCE with the per-list query groups
           broadcast (each entry row ships once — the probe-pair join
           shape would duplicate the codes per probing query),
           reconstruct-and-score per list, cut to `refine`,
           exact-rescore the cut only.

Scale posture (100 TB, nlist=16k, nprobe=32): nprobe/nlist of the rows ×
1/4 of the bytes are read on the only corpus-touching stage; everything
downstream moves nq×refine rows.  nprobe = nlist + exact rescore is the
oracle-checkable configuration (equal to brute force whenever the true
top-k survive the SQ cut — SQ8 reconstruction error is ≤ half a grid
step per component, so refine=64 has margin; pinned in tests/test_sq.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.index.sq import _scales, encode_sq, train_sq
from filter_vectordb_spark.operators.topk import per_group_topk


def build_ivfsq(
    base: DataFrame,
    nlist: int,
    max_iter: int = 8,
    train_rows: int | None = None,
) -> tuple[DataFrame, DataFrame, np.ndarray, np.ndarray]:
    """Returns (entries, centroids, vmin, vmax): entries = (id,
    centroid_id, codes) — both pruning structures in one table.
    max_iter/train_rows pass through to the coarse k-means (see
    build_ivf — faiss's bounded-sample training protocol)."""
    from filter_vectordb_spark.index.ivf import build_ivf

    assignments, centroids = build_ivf(
        base, nlist, max_iter=max_iter, train_rows=train_rows
    )
    vmin, vmax = train_sq(base)
    codes = encode_sq(base, vmin, vmax)
    entries = assignments.select("id", "centroid_id").join(codes, "id")
    return entries, centroids, vmin, vmax


def save_ivfsq(
    entries: DataFrame,
    centroids: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    out_dir: str,
) -> None:
    from filter_vectordb_spark.index.sq import write_grid

    # one shuffle partition per list before the partitioned write —
    # without it every writer task emits a sliver into every list
    # directory (nlist × tasks small files; 7.6k at nlist=256, where
    # file enumeration then dominated every probe scan)
    entries.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(f"{out_dir}/entries")
    centroids.write.mode("overwrite").parquet(f"{out_dir}/centroids")
    write_grid(entries.sparkSession, vmin, vmax, f"{out_dir}/grid")


def load_ivfsq(spark: SparkSession, out_dir: str):
    from filter_vectordb_spark.index.sq import read_grid

    entries = spark.read.parquet(f"{out_dir}/entries")
    centroids = spark.read.parquet(f"{out_dir}/centroids")
    return (entries, centroids, *read_grid(spark, f"{out_dir}/grid"))


def _ivfsq_score_chunk(
    chunk_pdf,
    entries: DataFrame,
    C: np.ndarray,
    cids: np.ndarray,
    vmin: np.ndarray,
    vmax: np.ndarray,
    nprobe: int,
    refine: int,
    metric: str,
) -> DataFrame:
    """One ≤cap query chunk: rank centroids driver-side, scan only the
    probed partitions ONCE (each entry row ships once, scored against
    every chunk query probing its list — not the probe-pair join shape,
    which duplicates the codes per probing query), emit per-batch partial
    top-`refine` per query."""
    qids_np = chunk_pdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(chunk_pdf["qemb"].to_numpy()).astype(np.float64)
    if metric == "ip":
        # faiss METRIC_INNER_PRODUCT ranks lists by centroid IP descending
        rank = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    else:
        d2 = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + (C * C).sum(1)[None, :]
        rank = np.argsort(d2, axis=1)[:, :nprobe]
    probe_map: dict[int, np.ndarray] = {}
    for qi, row in enumerate(rank):
        for j in row:
            probe_map.setdefault(int(cids[j]), []).append(qi)
    probe_map = {c: np.asarray(v, dtype=np.int64) for c, v in probe_map.items()}

    scale = _scales(vmin, vmax)
    lo = vmin.copy()
    spark = entries.sparkSession
    bc = spark.sparkContext.broadcast((qids_np, Q, probe_map))

    # static IN-list on the partition column (≤ nlist ints — plan-size
    # safe) → static partition pruning on the entries scan, codes only
    probed = sorted(probe_map)
    cand = entries.filter(F.col("centroid_id").isin(probed)).select(
        "centroid_id", "id", "codes"
    )

    def recon(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bQ, groups = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = []
            for cid, grp in pdf.groupby("centroid_id"):
                pos = groups.get(int(cid))
                if pos is None:
                    continue
                ids = grp["id"].to_numpy(dtype=np.int64)
                M = np.stack(grp["codes"].to_numpy()).astype(np.float64) + 128.0
                Xd = lo[None, :] + M * scale[None, :]  # decode ONCE per group
                G = Xd @ bQ[pos].T  # (nb, nq_probing)
                if metric == "ip":
                    D = G
                    keyT = np.ascontiguousarray(-D.T)
                else:
                    D = (
                        (Xd * Xd).sum(1)[:, None]
                        - 2.0 * G
                        + (bQ[pos] * bQ[pos]).sum(1)[None, :]
                    )
                    np.maximum(D, 0.0, out=D)
                    keyT = np.ascontiguousarray(D.T)
                kk = min(refine, len(ids))
                if kk < len(ids):
                    part = np.argpartition(keyT, kk - 1, axis=1)[:, :kk]
                else:
                    part = np.tile(np.arange(len(ids))[None, :], (len(pos), 1))
                qrows = np.arange(len(pos))[:, None]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.repeat(bqids[pos], part.shape[1]),
                            "id": ids[part].ravel(),
                            "adist": D.T[qrows, part].ravel(),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return cand.mapInPandas(recon, schema="qid long, id long, adist double")


def ivfsq_search(
    queries: DataFrame,
    entries: DataFrame,
    centroids: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    base: DataFrame,
    k: int,
    nprobe: int,
    refine: int,
    metric: str = "l2",
    q_id: str = "qid",
    q_vec: str = "qemb",
) -> DataFrame:
    """Probe `nprobe` lists per query, reconstruction-score only their
    codes, cut to `refine`, exact-rescore survivors.  metric ∈ {l2, ip}
    (ip = the OOD track's MIPS; centroid ranking and score ordering flip
    together, as in faiss METRIC_INNER_PRODUCT).  Above the broadcast
    cap the query set chunk-and-unions through union_query_chunks_df —
    driver and executor memory stay O(chunk).  Returns
    (qid, id, dist, rank)."""
    if metric not in ("l2", "ip"):
        raise ValueError("metric must be 'l2' or 'ip'")
    from filter_vectordb_spark.operators.knn import (
        pairwise_scores,
        union_query_chunks_df,
    )

    cpdf = centroids.toPandas()  # nlist rows — tiny by construction
    C = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)
    cids = cpdf["centroid_id"].to_numpy()
    q = queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qemb"))
    scored = union_query_chunks_df(
        q,
        lambda ch: _ivfsq_score_chunk(
            ch, entries, C, cids, vmin, vmax, nprobe, refine, metric
        ),
        "qid LONG, id LONG, adist DOUBLE",
    )
    adist_first = F.col("adist").desc() if metric == "ip" else F.col("adist").asc()
    cut = per_group_topk(
        scored, ["qid"], [adist_first, F.col("id").asc()], refine
    ).select("qid", "id")
    b = base.select("id", "emb")
    pairs_df = b.join(F.broadcast(cut), "id").join(F.broadcast(q), "qid")
    exact = pairwise_scores(pairs_df, metric)
    dist_first = F.col("dist").desc() if metric == "ip" else F.col("dist").asc()
    return per_group_topk(
        exact, ["qid"], [dist_first, F.col("id").asc()], k
    ).select("qid", "id", "dist", "rank")
