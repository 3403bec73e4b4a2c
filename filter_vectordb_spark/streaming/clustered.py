"""B6: clustered-data permutation + drift runbook generation.

The reference's data-drift scenario (`streaming/clustered_data_gen.py`)
k-means-clusters a dataset, permutes rows cluster-contiguously, writes the
permuted matrix in the dense binary format, and emits a YAML runbook that
inserts one cluster per step — replaying it drifts the index's data
distribution cluster by cluster.

Spark-native split:
  labels   — either MLlib KMeans (the production path, same as
             index/ivf.py) or deterministic seed-point quantization
             (`vq(data, centroids)` against fixed seed vectors — scipy's
             assignment step, `clustered_data_gen.py:23`), which keeps
             every downstream artifact SQL-recomputable for the oracle
             gate, the same oracle-checkable-configuration trick as
             ivf_full_probe's nprobe=nlist.
  permute  — new_id = cluster_offset[label] + rank_within_cluster(id):
             the reference's offsets/counters loop (`:28-40`) as a
             per-cluster window + a tiny broadcast offset join; no global
             single-partition window.
  emit     — runbook YAML in the generator's list-of-single-key-dicts
             format (`:79-88`); the permuted matrix itself can be written
             with sources/binfmt.write_dense_bin_distributed (same header
             layout as `:84-88`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filter_vectordb_spark.functions.distance import l2_sq


def quantize_labels(base: DataFrame, centroids: DataFrame) -> DataFrame:
    """(id, emb, label): nearest-centroid assignment against a fixed
    centroid table (cid INT, cemb) — deterministic, tie → smallest cid."""
    d = base.crossJoin(F.broadcast(centroids)).select(
        "id", "emb", "cid", l2_sq(F.col("cemb"), F.col("emb")).alias("dist")
    )
    w = Window.partitionBy("id").orderBy(F.col("dist").asc(), F.col("cid").asc())
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "emb", F.col("cid").alias("label"))
    )


def kmeans_labels(base: DataFrame, num_clusters: int, seed: int = 42) -> DataFrame:
    """(id, emb, label) via MLlib KMeans — the production clustering
    (recall/shape pinned in tests; not SQL-recomputable)."""
    from filter_vectordb_spark.index.ivf import build_ivf

    assignments, _ = build_ivf(base.select("id", "emb"), num_clusters, seed)
    return assignments.withColumnRenamed("centroid_id", "label")


def cluster_permutation(labeled: DataFrame) -> tuple[DataFrame, list[int]]:
    """Cluster-contiguous reindexing of (id, emb, label):
    returns ((new_id, id, emb, label), offsets[num_clusters+1]).

    new_id = offsets[label] + rank-within-label — the reference's
    offsets/counters permutation (`clustered_data_gen.py:28-40`) built
    from a per-cluster window plus a collected per-cluster count table
    (num_clusters rows — metadata scale).
    """
    counts = {
        r["label"]: r["c"]
        for r in labeled.groupBy("label").agg(F.count("*").alias("c")).collect()
    }
    labels_sorted = sorted(counts)
    offsets = [0]
    for lab in labels_sorted:
        offsets.append(offsets[-1] + counts[lab])
    off_df = labeled.sparkSession.createDataFrame(
        [(lab, off) for lab, off in zip(labels_sorted, offsets)],
        "label INT, _off BIGINT",
    )
    w = Window.partitionBy("label").orderBy("id")
    permuted = (
        labeled.join(F.broadcast(off_df), "label")
        .withColumn("new_id", F.col("_off") + F.row_number().over(w) - 1)
        .select("new_id", "id", "emb", "label")
    )
    return permuted, offsets


def generate_delete_runbook(
    offsets: list[int],
    path: str,
    dataset: str = "clustered-delete",
    max_pts: int | None = None,
) -> None:
    """Emit a delete-runbook-shaped YAML (the reference's
    `streaming/delete_runbook.yaml` pattern: cluster-by-cluster inserts
    interleaved with RANGE DELETES of earlier clusters and periodic
    searches, under a capacity cap `max_pts` — `delete_runbook.yaml:2`
    has the cap, `:8-33` the insert/delete/search interleave).  The cap
    defaults to 3/4 of the total so the ST4 consolidation trigger
    (active + unprocessed_deletes ≥ max_pts) FIRES during replay —
    repeatedly, which is what distinguishes this runbook from the
    drift-only one (VERDICT r7 #4: the simple/clustered replays never
    put consolidation under pressure).

    Fixed schedule over nc ≥ 4 clusters (c_i = [offsets[i],
    offsets[i+1])): insert c0,c1 · search · insert c2 · delete first
    half of c0 · search · insert c3 · delete rest of c0 + first half
    of c1 · search · insert c4..c_{nc-1} · delete c2 whole · search.
    With equal cluster sizes and the default cap this fires ≥ 2
    consolidations (pytest-pinned via StreamingReplayer.consolidations).
    """
    import yaml

    nc = len(offsets) - 1
    if nc < 4:
        raise ValueError(f"need >= 4 clusters, got {nc}")
    steps: list[dict] = []

    def ins(c: int) -> None:
        steps.append(
            {"operation": "insert", "start": int(offsets[c]), "end": int(offsets[c + 1])}
        )

    def dele(s: int, e: int) -> None:
        steps.append({"operation": "delete", "start": int(s), "end": int(e)})

    def mid(c: int) -> int:
        return (offsets[c] + offsets[c + 1]) // 2

    ins(0)
    ins(1)
    steps.append({"operation": "search"})
    ins(2)
    dele(offsets[0], mid(0))
    steps.append({"operation": "search"})
    ins(3)
    dele(mid(0), offsets[1])
    dele(offsets[1], mid(1))
    steps.append({"operation": "search"})
    for c in range(4, nc):
        ins(c)
    dele(offsets[2], offsets[3])
    steps.append({"operation": "search"})
    spec: dict = {"max_pts": int(max_pts if max_pts is not None else offsets[-1] * 3 // 4)}
    spec.update({i + 1: s for i, s in enumerate(steps)})
    with open(path, "w") as f:
        yaml.dump({dataset: spec}, f)


def generate_drift_runbook(
    offsets: list[int],
    path: str,
    dataset: str = "clustered",
    search_after: tuple[int, ...] = (),
    delete_first_cluster: bool = False,
) -> None:
    """Emit the drift runbook YAML in the reference generator's format
    (list-of-single-key-dicts steps, `clustered_data_gen.py:79-96`):
    one insert per cluster [offsets[c], offsets[c+1]), optional search
    checkpoints after the given cluster indexes, optionally a trailing
    delete of cluster 0's range + final search."""
    import yaml

    steps: list[list[dict]] = []
    for c in range(len(offsets) - 1):
        steps.append(
            [
                {"operation": "insert"},
                {"start": int(offsets[c])},
                {"end": int(offsets[c + 1])},
            ]
        )
        if c in search_after:
            steps.append([{"operation": "search"}])
    if delete_first_cluster:
        steps.append(
            [
                {"operation": "delete"},
                {"start": 0},
                {"end": int(offsets[1])},
            ]
        )
        steps.append([{"operation": "search"}])
    with open(path, "w") as f:
        yaml.dump({dataset: {i + 1: s for i, s in enumerate(steps)}}, f)
