"""Physical-plan audits — the engine's scale contract, made testable.

The 100 TB posture is only real if the plans hold: filters reach the
parquet scan, small sides broadcast, hot expressions run inside
whole-stage codegen, and partitioned tables prune.  These helpers turn
`.explain("formatted")` into assertions so tests/test_plans.py pins the
plan shape, not just the row values — a plan regression (lost pushdown, a
join flipping to sort-merge-with-shuffle) fails CI before it costs a
cluster-day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in a PushedFilters list of some scan."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    blob = "\n".join(pushed)
    for frag in fragments:
        assert frag in blob, f"filter {frag!r} not pushed; pushed lines:\n{blob}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, saw {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"unplanned cartesian product:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """At least one whole-stage-codegen subtree must exist.  Uses the
    codegen explain mode — with AQE on, the formatted plan hides codegen
    markers until execution."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    assert "Found" in out and "WholeStageCodegen" in out, (
        f"no codegen subtree:\n{out[:2000]}"
    )


def assert_partition_pruned(df: DataFrame) -> None:
    """The scan must carry partition filters (static or dynamic)."""
    plan = physical_plan(df)
    ok = ("PartitionFilters: [" in plan and "PartitionFilters: []" not in plan) or (
        "dynamicpruning" in plan.lower()
    )
    assert ok, f"no partition pruning in plan:\n{plan}"
