"""Query registry — the driver contract's single import surface.

Every runnable query from SURVEY.md §2 registers itself into
queries.core.QUERIES / ORACLES when its topic module is imported; this
module imports them in dependency order (later modules reference
earlier modules' oracles, e.g. the index-backed rows reuse the k-NN
oracle) and re-exports the public surface plus the handful of staging
helpers the tests address by name.

The monolith this replaces grew ~300 lines/round (VERDICT r6 #8); the
topic modules live under filter_vectordb_spark/queries/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from filter_vectordb_spark.queries.core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _index_cache_dir,
    _is_built,
    register,
)

# Topic modules self-register on import.  ORDER MATTERS: the relational
# suite registers inside events_streaming's source slice, and several
# later modules alias earlier oracles (ORACLES["knn_l2"] etc.).
from filter_vectordb_spark.queries import ann  # noqa: E402,F401
from filter_vectordb_spark.queries import events_streaming  # noqa: E402,F401
from filter_vectordb_spark.queries import indexes  # noqa: E402,F401
from filter_vectordb_spark.queries import textpipe  # noqa: E402,F401
from filter_vectordb_spark.queries import dedup_corpus  # noqa: E402,F401
from filter_vectordb_spark.queries import media  # noqa: E402,F401
from filter_vectordb_spark.queries import binfmt_misc  # noqa: E402,F401
from filter_vectordb_spark.queries import scale  # noqa: E402,F401

# staging helpers addressed as registry._name by tests / tooling
from filter_vectordb_spark.queries.events_streaming import (  # noqa: F401
    _runbook_checkpoint_intervals,
)
from filter_vectordb_spark.queries.fixtures import (  # noqa: F401
    _gt_kth_10m,
    _ivfsq_1m,
    _ivfsq_10m,
    _synth1m_base,
    _synth10m_base,
    _synth100k_base,
    _synth_msturing1m,
    _synth_ood_queries_staged,
    _synth_queries_staged,
)

def flagship(spark: SparkSession) -> DataFrame:
    """The driver's smoke entry: filtered k-NN router at sf0.001."""
    return QUERIES["filtered_knn_router"](spark, "/root/testdata/sf0.001")
