"""IVF+SQ8 composed index — the reference's EXACT faiss indexkey
(`IVF16384,SQ8`, `filter/faiss/faiss.py:133`) as lake tables.

Same architecture as index/ivfpq.py with the product quantizer swapped
for the per-dimension affine codec (index/sq.py): the coarse k-means
partitioner prunes WHICH rows are scanned, the 1-byte-per-component SQ
codes decide HOW CHEAPLY each surviving row is scored.

  build  = IVF assignment (id → centroid_id)  ⋈  SQ codes (id → codes)
           written `partitionBy("centroid_id")`; the affine grid
           (pos, mn, mx) rides alongside — d rows, kilobytes.
  search = rank centroids per query driver-side (nlist rows), broadcast
           the (qid, centroid_id) probe pairs against the partitioned
           entries table, reconstruct-and-score survivors row-wise, cut
           to `refine`, exact-rescore the cut only.

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
from filter_vectordb_spark.operators.knn import pairwise_l2_scores
from filter_vectordb_spark.operators.topk import per_group_topk


def build_ivfsq(
    base: DataFrame, nlist: int
) -> tuple[DataFrame, DataFrame, np.ndarray, np.ndarray]:
    """Returns (entries, centroids, vmin, vmax): entries = (id,
    centroid_id, codes) — both pruning structures in one table."""
    from filter_vectordb_spark.index.ivf import build_ivf

    assignments, centroids = build_ivf(base, nlist)
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

    entries.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{out_dir}/entries"
    )
    centroids.write.mode("overwrite").parquet(f"{out_dir}/centroids")
    write_grid(entries.sparkSession, vmin, vmax, f"{out_dir}/grid")


def load_ivfsq(spark: SparkSession, out_dir: str):
    from filter_vectordb_spark.index.sq import read_grid

    entries = spark.read.parquet(f"{out_dir}/entries")
    centroids = spark.read.parquet(f"{out_dir}/centroids")
    return (entries, centroids, *read_grid(spark, f"{out_dir}/grid"))


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
    q_id: str = "qid",
    q_vec: str = "qemb",
) -> DataFrame:
    """Probe `nprobe` lists per query, reconstruction-score only their
    codes, cut to `refine`, exact-rescore survivors.  Returns
    (qid, id, dist, rank)."""
    cpdf = centroids.toPandas()  # nlist rows — tiny by construction
    C = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)
    cids = cpdf["centroid_id"].to_numpy()
    qpdf = queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qemb")).toPandas()
    qids_np = qpdf["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)

    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)[:, :nprobe]
    pairs = [
        (int(qid), int(cids[j])) for qid, row in zip(qpdf["qid"], order) for j in row
    ]
    spark = queries.sparkSession
    probe = spark.createDataFrame(pairs, "qid BIGINT, centroid_id INT")

    scale = _scales(vmin, vmax)
    lo = vmin.copy()
    qpos = {int(q): i for i, q in enumerate(qids_np)}

    # partition pruning: only probed lists are scanned, codes column only
    cand = entries.join(F.broadcast(probe), "centroid_id").select("qid", "id", "codes")

    def recon(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["codes"].to_numpy()).astype(np.float64) + 128.0
            Xd = lo[None, :] + M * scale[None, :]
            qi = pdf["qid"].map(qpos).to_numpy(dtype=np.int64)
            D = ((Xd - Q[qi]) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(dtype=np.int64),
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "adist": D,
                }
            )

    scored = cand.mapInPandas(recon, schema="qid long, id long, adist double")
    cut = per_group_topk(
        scored, ["qid"], [F.col("adist").asc(), F.col("id").asc()], refine
    ).select("qid", "id")
    b = base.select("id", "emb")
    q = queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qemb"))
    pairs_df = b.join(F.broadcast(cut), "id").join(F.broadcast(q), "qid")
    exact = pairwise_l2_scores(pairs_df)
    return per_group_topk(
        exact, ["qid"], [F.col("dist").asc(), F.col("id").asc()], k
    ).select("qid", "id", "dist", "rank")
