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

    def load_index(self, spark: SparkSession, sf_dir: str) -> bool:
        """S5: serve from the registry's per-sf_dir cache when the same
        nlist=16 index was already built (fit()/load split, the
        reference's `filter/run.py:15-52` lifecycle)."""
        from filter_vectordb_spark.index.ivf import load_ivf
        from filter_vectordb_spark.registry import _index_cache_dir, _is_built

        if int(self.index_params.get("nlist", 16)) != 16:
            return False
        out = _index_cache_dir(sf_dir, "ivf16")
        if not _is_built(f"{out}/assignments", f"{out}/centroids"):
            return False
        self.assignments, self.centroids = load_ivf(spark, out)
        self.nlist = 16
        return True

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

    def exact_truth(self, spark, sf_dir, queries, k):
        """Ground truth respects the tag predicate (the reference's
        filtered-track GT is the filtered exact top-k)."""
        from filter_vectordb_spark.operators.filtered_knn import (
            filtered_knn_metadata_first,
        )

        return filtered_knn_metadata_first(queries, self.base, k).select("qid", "id")


class LSHEngine(BaseEngine):
    """Hyperplane-LSH cosine ANN (index/lsh.py); query knob: seed."""

    name = "lsh"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        self.base = dense_vectors(spark, sf_dir).select("id", "emb")
        self.dim = len(self.base.select("emb").first()[0])

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        from filter_vectordb_spark.index.lsh import lsh_cosine_knn

        seed = int(self.query_args.get("seed", 42))
        return lsh_cosine_knn(queries, self.base, k, self.dim, seed=seed).select(
            "qid", "id", "rank"
        )


class SparseEngine(BaseEngine):
    """Sparse MIPS track (Q5/Q6); query knobs: alpha (F6 mass truncation)
    and budget (W4 heaviest-dims surrogate).  Queries are the term-table
    form (qid, term, w) — tracks carry their own query schemas, exactly
    as the reference's tracks do."""

    name = "sparse"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        from filter_vectordb_spark.operators.sparse import docs_to_terms
        from filter_vectordb_spark.sources.tables import load_table

        self.dterms = docs_to_terms(load_table(spark, "documents", sf_dir))

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        from filter_vectordb_spark.operators.sparse import (
            budget_truncate,
            sparse_topk,
            sparsify_alpha,
        )

        q = queries
        if "alpha" in self.query_args:
            q = sparsify_alpha(q, float(self.query_args["alpha"]))
        if "budget" in self.query_args:
            q = budget_truncate(q, int(self.query_args["budget"]))
        return sparse_topk(q, self.dterms, k).select(
            "qid", F.col("id"), "rank"
        )

    def default_queries(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        return (
            self.dterms.filter(F.col("id") < 5).withColumnRenamed("id", "qid")
        )

    def exact_truth(self, spark, sf_dir, queries, k):
        from filter_vectordb_spark.operators.sparse import sparse_topk

        return sparse_topk(queries, self.dterms, k).select("qid", "id")


class PQEngine(BaseEngine):
    """PQ ADC scan + exact rescore (index/pq.py); query knob: refine —
    the ADC-cut width, the recall/scan-cost dial."""

    name = "pq"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        from filter_vectordb_spark.index.pq import encode_pq, train_pq

        self.base = dense_vectors(spark, sf_dir).select("id", "emb")
        nsub = int(self.index_params.get("nsub", 32))
        ksub = int(self.index_params.get("ksub", 64))
        self.codebooks = train_pq(self.base, nsub=nsub, ksub=ksub)
        self.codes = encode_pq(self.base, self.codebooks).localCheckpoint()

    def load_index(self, spark: SparkSession, sf_dir: str) -> bool:
        """S5: serve codes + codebooks from the registry's per-sf_dir
        cache when the same nsub=32/ksub=64 index was already built."""
        from filter_vectordb_spark.index.pq import load_pq
        from filter_vectordb_spark.registry import _index_cache_dir, _is_built

        if (
            int(self.index_params.get("nsub", 32)) != 32
            or int(self.index_params.get("ksub", 64)) != 64
        ):
            return False
        out = _index_cache_dir(sf_dir, "pq32x64")
        if not _is_built(f"{out}/codes", f"{out}/codebooks"):
            return False
        self.base = dense_vectors(spark, sf_dir).select("id", "emb")
        self.codes, self.codebooks = load_pq(spark, out)
        return True

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        from filter_vectordb_spark.index.pq import pq_adc_search

        refine = int(self.query_args.get("refine", 4 * k))
        return pq_adc_search(
            queries, self.codes, self.codebooks, self.base, k, refine
        )


class SQEngine(BaseEngine):
    """SQ8 reconstruct scan + exact rescore (index/sq.py); query knob:
    refine — same dial as PQ but over the 1-byte affine codec."""

    name = "sq8"

    def fit(self, spark: SparkSession, sf_dir: str) -> None:
        from filter_vectordb_spark.index.sq import encode_sq, train_sq

        self.base = dense_vectors(spark, sf_dir).select("id", "emb")
        self.vmin, self.vmax = train_sq(self.base)
        self.codes = encode_sq(self.base, self.vmin, self.vmax).localCheckpoint()

    def load_index(self, spark: SparkSession, sf_dir: str) -> bool:
        """S5: serve the codes table + affine grid from the registry's
        per-sf_dir cache when present."""
        from filter_vectordb_spark.index.sq import load_sq
        from filter_vectordb_spark.registry import _index_cache_dir, _is_built

        out = _index_cache_dir(sf_dir, "sq8")
        if not _is_built(f"{out}/codes", f"{out}/grid"):
            return False
        self.base = dense_vectors(spark, sf_dir).select("id", "emb")
        self.codes, self.vmin, self.vmax = load_sq(spark, out)
        return True

    def query(self, queries: DataFrame, k: int) -> DataFrame:
        from filter_vectordb_spark.index.sq import sq_search

        refine = int(self.query_args.get("refine", 4 * k))
        return sq_search(
            queries, self.codes, self.vmin, self.vmax, self.base, k, refine
        )


ENGINES = {
    e.name: e
    for e in (
        BruteForceEngine,
        IVFEngine,
        FilteredEngine,
        LSHEngine,
        SparseEngine,
        PQEngine,
        SQEngine,
    )
}
