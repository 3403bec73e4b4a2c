"""As-of join tests (operators/asof.py): inclusive boundary, equal-ts
tie-break, no-match NULLs, and parity with the rank-1 self-join."""

from __future__ import annotations

import pyspark.sql.functions as F

from filter_vectordb_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_latest_at_or_before(spark):
    left = _mk(spark, [(1, 100, 10), (1, 50, 11), (2, 100, 20)], "k INT, ts INT, lid LONG")
    right = _mk(spark, [(1, 40, 900), (1, 99, 901), (1, 101, 902)], "k INT, ts INT, rid LONG")
    out = asof_join(left, right, on="k", left_id="lid", right_id="rid").toPandas()
    got = {int(r.lid): (None if r.rid != r.rid else int(r.rid)) for r in out.itertuples()}
    assert got == {10: 901, 11: 900, 20: None}


def test_asof_equal_ts_inclusive_and_highest_id_wins(spark):
    left = _mk(spark, [(1, 100, 10)], "k INT, ts INT, lid LONG")
    right = _mk(spark, [(1, 100, 900), (1, 100, 905), (1, 60, 901)], "k INT, ts INT, rid LONG")
    out = asof_join(left, right, on="k", left_id="lid", right_id="rid").toPandas()
    assert int(out["rid"].iloc[0]) == 905  # equal-ts match counts; highest rid


def test_asof_matches_rank1_selfjoin_on_fixture(spark):
    """Parity with the quadratic-per-key formulation on real events."""
    from filter_vectordb_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)
    clicks = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("rid")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("lid")
    )
    fast = asof_join(errors, clicks, on="user_id", left_id="lid", right_id="rid")
    from pyspark.sql import Window

    j = errors.alias("l").join(
        clicks.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id")) & (F.col("r.ts") <= F.col("l.ts")),
        "left",
    )
    w = Window.partitionBy("l.lid").orderBy(
        F.col("r.ts").desc(), F.col("r.rid").desc()
    )
    slow = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid"))
    )
    f = fast.select("lid", "rid")
    assert f.exceptAll(slow).count() == 0 and slow.exceptAll(f).count() == 0


def test_asof_plan_has_single_exchange(spark):
    """The union+window plan shuffles once (the window partition), not a
    join explosion."""
    left = _mk(spark, [(1, 100, 10)], "k INT, ts INT, lid LONG")
    right = _mk(spark, [(1, 40, 900)], "k INT, ts INT, rid LONG")
    plan = asof_join(left, right, on="k", left_id="lid", right_id="rid")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
