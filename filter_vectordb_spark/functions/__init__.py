from filter_vectordb_spark.functions.distance import (  # noqa: F401
    cosine_sim,
    dot,
    l2_sq,
    sq_norm,
)
from filter_vectordb_spark.functions.signature import (  # noqa: F401
    sig_from_tags,
    sig_matches,
    tag_pattern,
)
