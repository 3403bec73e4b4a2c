#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <out_dir> <suffix> [query ...]

With no query list, dumps every registry query that returns a DataFrame
without executing jobs (fixture-staging inside a query function may still
run one-time builds; run bench.py first so the caches exist).

The explain output is the optimizer's initial plan (AdaptiveSparkPlan
isFinalPlan=false) — what the judge checks plan-shape claims against.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from filter_vectordb_spark import get_spark, registry
    from filter_vectordb_spark.plans.audit import physical_plan

    spark = get_spark("dump_plans")
    if not names:
        names = list(registry.QUERIES)
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            plan = physical_plan(fn(spark, sf_dir))
        except Exception:
            plan = "EXPLAIN FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
