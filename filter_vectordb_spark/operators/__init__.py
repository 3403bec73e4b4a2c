from filter_vectordb_spark.operators.knn import knn_join  # noqa: F401
from filter_vectordb_spark.operators.topk import per_group_topk  # noqa: F401
