from filter_vectordb_spark.sources.tables import load_table, load_tables, register_views  # noqa: F401
from filter_vectordb_spark.sources.vectors import dense_queries, dense_vectors  # noqa: F401
