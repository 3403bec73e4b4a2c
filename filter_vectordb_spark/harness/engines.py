"""Built-in engines for the harness — each wraps one physical plan family
from SURVEY.md §2.8."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.harness.base import BaseEngine
from filter_vectordb_spark.index.ivf import build_ivf, ivf_search
from filter_vectordb_spark.operators.filtered_knn import filtered_knn
from filter_vectordb_spark.operators.knn import knn_join
from filter_vectordb_spark.sources.vectors import dense_vectors


class BruteForceEngine(BaseEngine):
    """Exact scan (Q1/J3) — the recall=1 reference point, like the
    reference's bruteforce runner."""

    name = "bruteforce"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        self.base = dense_vectors(spark, sf_dir).select("id", "emb")

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        strategy = self.query_args.get("strategy", "vectorized")
        return knn_join(queries, self.base, k, metric=self.metric, strategy=strategy)


class IVFEngine(BaseEngine):
    """KMeans-IVF (B3/Q4); query knob: nprobe (the faiss nprobe analog)."""

    name = "ivf"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        nlist = int(self.index_params.get("nlist", 16))
        base = dense_vectors(spark, sf_dir).select("id", "emb")
        self.assignments, self.centroids = build_ivf(base, nlist)
        self.nlist = nlist

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        nprobe = int(self.query_args.get("nprobe", self.nlist))
        return ivf_search(queries, self.assignments, self.centroids, k, nprobe)


class FilteredEngine(BaseEngine):
    """Selectivity-routed filtered k-NN (the reference's hybrid engine);
    query knob: mt_threshold (`filter/faiss/config.yaml:54-63`)."""

    name = "filtered"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        self.base = dense_vectors(spark, sf_dir)
        self.n_base = self.base.count()

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        mt = float(self.query_args.get("mt_threshold", 0.01))
        return filtered_knn(queries, self.base, k, mt_threshold=mt, n_base=self.n_base)


ENGINES = {e.name: e for e in (BruteForceEngine, IVFEngine, FilteredEngine)}
