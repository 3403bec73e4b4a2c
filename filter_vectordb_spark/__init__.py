"""filter_vectordb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ljqcodelove/Filter-VectorDB.

The reference (a NeurIPS'23 big-ann-benchmarks fork) is a vector-database
benchmark harness with four query tracks: filtered k-NN, sparse top-k MIPS,
out-of-distribution dense ANN, and streaming index maintenance (see
SURVEY.md).  This package re-expresses every capability Spark-first:

- declarative DataFrame/SQL plans that Catalyst + Tungsten optimize
  (predicate pushdown, broadcast joins, whole-stage codegen);
- distributed two-phase top-k instead of per-node heaps;
- posting-list set algebra as explode/groupBy/array functions;
- Arrow-vectorized pandas UDF kernels only where matrix math beats
  expression trees (brute-force k-NN inner loop);
- batch index builds (IVF via MLlib KMeans, tag-partitioned tables,
  bit-signature columns) instead of pointer-chasing graph indexes;
- an op-log streaming replay on a keyed state table instead of in-place
  tombstoned graphs.

Designed for 1000-executor / 100 TB scale: no driver-side materialization
of big sides, broadcast only provably-small sides, partial+final top-k
everywhere, filters pushed to parquet scans.
"""

__version__ = "0.1.0"

from filter_vectordb_spark.session import get_spark  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
