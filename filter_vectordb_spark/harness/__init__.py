from filter_vectordb_spark.harness.base import BaseEngine  # noqa: F401
from filter_vectordb_spark.harness.runner import load_config, run_benchmark  # noqa: F401
