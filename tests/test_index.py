"""IVF / tag-partition index tests: recall methodology mirroring the
reference (approximate configs measured against the in-engine exact plan,
SURVEY.md §5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from filter_vectordb_spark.index.ivf import build_ivf, ivf_search
from filter_vectordb_spark.operators.knn import knn_join
from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors
from tests.conftest import SF_DIR

K = 10
NLIST = 16


@pytest.fixture(scope="module")
def ivf(spark):
    base = dense_vectors(spark, SF_DIR).select("id", "emb")
    return build_ivf(base, NLIST)


@pytest.fixture(scope="module")
def exact(spark):
    base = dense_vectors(spark, SF_DIR)
    q = dense_queries(spark, SF_DIR)
    return knn_join(q, base, K).select("qid", "id").toPandas()


def _recall(res, exact):
    got = res.select("qid", "id").toPandas()
    g = set(map(tuple, got.values))
    e = set(map(tuple, exact.values))
    return len(g & e) / len(e)


def test_full_probe_is_exact(spark, ivf, exact):
    q = dense_queries(spark, SF_DIR)
    res = ivf_search(q, *ivf, K, nprobe=NLIST)
    assert _recall(res, exact) == 1.0


def test_recall_improves_with_nprobe(spark, ivf, exact):
    q = dense_queries(spark, SF_DIR)
    r1 = _recall(ivf_search(q, *ivf, K, nprobe=1), exact)
    r8 = _recall(ivf_search(q, *ivf, K, nprobe=8), exact)
    assert r8 >= r1
    assert r8 >= 0.5  # probing half the lists should recover most neighbors


def test_assignments_cover_base(spark, ivf):
    assignments, centroids = ivf
    base = dense_vectors(spark, SF_DIR)
    assert assignments.count() == base.count()
    assert assignments.select("centroid_id").distinct().count() <= NLIST


def test_ivf_save_load_roundtrip(spark, ivf, exact, tmp_path):
    """S5: persisted IVF tables reload and search identically; the saved
    assignment table is partitioned by centroid_id."""
    import os

    from filter_vectordb_spark.index.ivf import load_ivf, save_ivf

    out = str(tmp_path / "ivf")
    save_ivf(*ivf, out)
    parts = [d for d in os.listdir(f"{out}/assignments") if d.startswith("centroid_id=")]
    assert len(parts) > 1  # physically partitioned
    assignments, centroids = load_ivf(spark, out)
    q = dense_queries(spark, SF_DIR)
    res = ivf_search(q, assignments, centroids, K, nprobe=NLIST)
    assert _recall(res, exact) == 1.0


def test_tag_partition_scan_prunes(spark, tmp_path):
    """The partition-pruned plan must scan only the queried tag's files."""
    from filter_vectordb_spark.index.tagpart import (
        build_tag_partitions,
        tag_partition_knn,
    )

    base = dense_vectors(spark, SF_DIR)
    out = str(tmp_path / "tagpart")
    tags = build_tag_partitions(base, out, min_freq=0.0)
    assert len(tags) == 30  # 10 labels + 7 mid + 13 fine
    q = dense_queries(spark, SF_DIR).select(
        "qid", "qemb", F.col("qtags")[0].alias("qtag")
    )
    res = tag_partition_knn(spark, out, q, 5)
    # every result belongs to the queried tag
    joined = res.join(base.select(F.col("id"), "tags"), "id").join(
        q.select("qid", "qtag"), "qid"
    )
    bad = joined.filter(~F.array_contains("tags", F.col("qtag"))).count()
    assert bad == 0


def test_router_self_heals_poisoned_tagstats_cache(spark):
    """r3 regression class: a stray non-underscore file inside a cached
    Parquet dir breaks every subsequent read ('Expected magic number at
    tail').  The router must remove the r3-layout stray and still answer."""
    import os

    from filter_vectordb_spark import registry
    from tests.conftest import SF_DIR

    out = registry._index_cache_dir(SF_DIR, "tagstats")
    registry.QUERIES["filtered_knn_router"](spark, SF_DIR).count()  # ensure built
    stray = os.path.join(out, "meta.json")
    with open(stray, "w") as f:
        f.write('{"n_base": 999}')
    res = registry.QUERIES["filtered_knn_router"](spark, SF_DIR)
    assert res.count() > 0
    assert not os.path.exists(stray)


def test_ivf_search_chunks_above_broadcast_cap(spark, ivf, monkeypatch):
    """Chunk-and-union above the broadcast cap must equal single-shot
    (VERDICT r5 #1: every scan family streams the query side)."""
    from filter_vectordb_spark.operators import knn as knn_mod

    q = dense_queries(spark, SF_DIR)
    want = ivf_search(q, *ivf, K, nprobe=NLIST).select("qid", "rank", "id")
    monkeypatch.setattr(knn_mod, "MAX_BROADCAST_QUERIES", 3)
    got = ivf_search(q, *ivf, K, nprobe=NLIST).select("qid", "rank", "id")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
