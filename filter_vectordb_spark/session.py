"""SparkSession factory tuned for the local[32] test harness.

The settings mirror what we would set on a real cluster: AQE on (runtime
join-strategy changes + skew-join splitting), Arrow on (all our Python
kernels are pandas-UDF based), shuffle partitions sized to cores rather
than the 200 default, UTC session timezone so results hash-compare against
the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: one BLAS thread per Python worker: with N executor threads each
#: spawning an N-thread OpenBLAS pool, the matmul kernels oversubscribe
#: N² threads and wall time explodes (measured 37s for a ~1.2 GFLOP/batch
#: stage that runs in ~2s single-threaded-per-worker); task-level
#: parallelism is Spark's job, not the BLAS's
_BLAS_ENV = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
}


def get_spark(app_name: str = "filter_vectordb_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # local mode forks Python workers from this process — the env must be
    # set on the driver before the first worker spawns, AND as
    # executorEnv for completeness on a real cluster
    for k, v in _BLAS_ENV.items():
        os.environ.setdefault(k, v)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects;
        # read as long and convert at load (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _BLAS_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
