"""As-of (point-in-time) join — each left row matched to the latest right
row at or before its timestamp, per key.

The classic event-enrichment operator (trades→quotes, purchases→last
click, feature lookups at label time) that plain SQL joins express only
as an O(L×R-per-key) self-join + rank.  Spark has no ASOF JOIN operator;
the scalable declarative form is the UNION + WINDOW trick:

  tag left rows kind=1 and right rows kind=0, union them, and take
  `last(right_id, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, kind,
  id ROWS UNBOUNDED PRECEDING..CURRENT)` — every left row sees exactly
  the latest right row at-or-before it.

One shuffle (the window partition), sort-based, no per-key quadratic
blowup: at 100 TB this is a single exchange on the join key with
sort-merge inside each partition — the same cost profile as the
sessionization op.  Ties: right-before-left at equal ts (inclusive
"at or before"), then id ascending, so the winner at an exactly-shared
timestamp is the highest right id — deterministic, mirrored in the
DuckDB oracle (registry `events_asof_join` avoids DuckDB's native ASOF
JOIN keyword precisely because its equal-ts pick is unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "left_id",
    right_id: str = "right_id",
) -> DataFrame:
    """For each left row: the latest right row with right.ts <= left.ts
    and the same `on` key.  Returns (left_id, on, left_ts, right_id) with
    right_id NULL when no right row precedes.  Column names are taken
    from the given id columns."""
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.col(right_id).alias("_rid"),
        F.lit(None).cast("long").alias("_lid"),
        F.lit(0).alias("_kind"),
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast("long").alias("_rid"),
        F.col(left_id).alias("_lid"),
        F.lit(1).alias("_kind"),
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_kind").asc(),
            F.coalesce(F.col("_rid"), F.col("_lid")).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_match", F.last("_rid", ignorenulls=True).over(w))
        .filter(F.col("_kind") == 1)
        .select(
            F.col("_lid").alias(left_id),
            F.col(on),
            F.col("_ts").alias(left_ts),
            F.col("_match").alias(right_id),
        )
    )
