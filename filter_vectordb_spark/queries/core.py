"""Shared query-registry core: the QUERIES/ORACLES dicts, the
@register decorator, the DuckDB SQL fragments every topic module's
oracles are built from, and the build-once index-cache helpers.

Split out of the monolithic registry (VERDICT r6 #8) — the topic
modules under filter_vectordb_spark/queries/ register themselves on
import; filter_vectordb_spark.registry is the aggregator that imports
them in order and re-exports the public surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from filter_vectordb_spark.sources.vectors import DEFAULT_NQ

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------- SQL fragments
# DuckDB-side recomputation of the derived dense vector tables
# (see sources/vectors.py for the Spark side — identical arithmetic).
_B = (
    "b AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e, "
    "[CAST(label AS INT), 10 + CAST(vec_id % 7 AS INT), 20 + CAST(vec_id % 13 AS INT)] AS tags "
    "FROM embeddings)"
)
_Q = (
    "q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe, "
    "[CAST(label AS INT), 10 + CAST(vec_id % 7 AS INT)] AS qtags "
    f"FROM embeddings WHERE vec_id < {DEFAULT_NQ})"
)


def _l2(a: str, b: str) -> str:
    """Sequential-fold squared L2 in DOUBLE — bit-identical to Spark's
    aggregate() fold."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"p -> (p[1]-p[2])*(p[1]-p[2]))), (acc, v) -> acc + v)"
    )


def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"p -> p[1]*p[2])), (acc, v) -> acc + v)"
    )


def _sqnorm(a: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform({a}, "
        f"x -> x*x)), (acc, v) -> acc + v)"
    )



_FILTERED_ORACLE = f"""
WITH {_Q}, {_B},
d AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist
      FROM q, b WHERE list_has_all(b.tags, q.qtags)),
r AS (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank FROM d)
SELECT qid, rank, id FROM r WHERE rank <= 10
"""



# ------------------------------------------- build-once index-cache layout
#
# The reference separates fit()/load_index() from query()
# (`filter/run.py:15-52`): an index is built ONCE and then served.  The
# topic modules mirror that with a deterministic on-disk cache keyed by
# sf_dir: first invocation builds and saves (S5), every later one loads —
# so the bench times SEARCH, not build, exactly like the reference's QPS
# runs.

def _index_cache_dir(sf_dir: str, kind: str) -> str:
    import os
    import tempfile

    key = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), "fvdb_index_cache", key, kind)


def _is_built(*parquet_dirs: str) -> bool:
    import os

    return all(os.path.exists(os.path.join(d, "_SUCCESS")) for d in parquet_dirs)
