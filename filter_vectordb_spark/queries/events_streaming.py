"""relational suite glue, event-time queries, streaming op-log replays (ST1-ST6) (registered queries + DuckDB oracles).

Split out of the monolithic registry (VERDICT r6 #8); see
filter_vectordb_spark.queries.core for the shared registry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.queries.core import (
    _B,
    _Q,
    _index_cache_dir,
    _is_built,
    _l2,
    register,
)
from filter_vectordb_spark.sources.vectors import DEFAULT_NQ, dense_queries, dense_vectors

# --------------------------------------------------------- relational suite

from filter_vectordb_spark.queries import relational as _rel  # noqa: E402

register("tpch_q1_pricing", _rel.Q1_ORACLE)(_rel.q1_pricing_summary)
register("tpch_q3_shipping", _rel.Q3_ORACLE)(_rel.q3_shipping_priority)
register("tpch_q5_region_revenue", _rel.Q5_ORACLE)(_rel.q5_region_revenue)
register("tpch_q6_forecast", _rel.Q6_ORACLE)(_rel.q6_forecast_revenue)
register("top_parts_per_brand", _rel.TOP_PARTS_ORACLE)(_rel.top_parts_per_brand)
register("events_hourly", _rel.EVENTS_HOURLY_ORACLE)(_rel.events_hourly)
register("events_sessionize", _rel.SESSIONIZE_ORACLE)(_rel.sessionize)
register("orders_priority_rollup", _rel.ORDERS_ROLLUP_ORACLE)(_rel.orders_priority_rollup)


@register(
    "events_hourly_stream",
    """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface under the driver gate: the watermarked
    tumbling-window twin of events_hourly, driven through readStream →
    memory sink with processAllAvailable — the streamed result must equal
    the batch oracle exactly (integer cents)."""
    from filter_vectordb_spark.streaming.events import run_stream_to_memory

    return run_stream_to_memory(spark, sf_dir)


@register(
    "events_asof_join",
    """
WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
         c.event_id AS click_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
SELECT purchase_id, user_id, purchase_us, click_id FROM j WHERE rn = 1
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the same user's latest click
    at or before it (NULL when none).  Spark side is the union+window
    plan (one shuffle, sort-merge per key — no per-key quadratic join);
    the oracle spells out the rank-1 pick because DuckDB's native ASOF
    JOIN leaves the equal-ts winner unspecified."""
    from filter_vectordb_spark.operators.asof import asof_join
    from filter_vectordb_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_id="event_id",
        right_id="click_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("purchase_us"),
        "click_id",
    )


# --------------------------------------------------------- streaming replay (ST1-ST6)


@register(
    "streaming_replay",
    f"""
WITH nn AS (SELECT count(*) AS n FROM embeddings),
{_Q}, {_B},
d1 AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist
       FROM q, b, nn WHERE b.id < (3 * nn.n) // 4),
r1 AS (SELECT 1 AS checkpoint, qid, id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS INT) AS rank FROM d1),
d2 AS (SELECT q.qid, b.id, {_l2('q.qe', 'b.e')} AS dist
       FROM q, b, nn WHERE NOT (b.id >= nn.n // 8 AND b.id < nn.n // 4)),
r2 AS (SELECT 2 AS checkpoint, qid, id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS INT) AS rank FROM d2)
SELECT checkpoint, qid, rank, id FROM r1 WHERE rank <= 10
UNION ALL
SELECT checkpoint, qid, rank, id FROM r2 WHERE rank <= 10
""",
)
def streaming_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1-ST5 op-log replay: insert 3/4 of the vectors, search, insert the
    rest, tombstone-delete [n/8, n/4) (triggering threshold consolidation),
    search again.  Exact search per checkpoint ⇒ fully oracle-checkable
    (`streaming/run.py:22-78` semantics)."""
    from filter_vectordb_spark.streaming.runbook import Runbook, RunbookStep, replay

    base = dense_vectors(spark, sf_dir).select("id", "emb")
    q = dense_queries(spark, sf_dir)
    n = base.count()
    rb = Runbook(
        max_pts=n,
        steps=[
            RunbookStep("insert", 0, (3 * n) // 4),
            RunbookStep("search"),
            RunbookStep("insert", (3 * n) // 4, n),
            RunbookStep("delete", n // 8, n // 4),
            RunbookStep("search"),
        ],
    )
    return replay(spark, base, rb, q, k=10).select("checkpoint", "qid", "rank", "id")


@register(
    "streaming_clustered_replay",
    f"""
WITH b AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
c AS (SELECT CAST(vec_id AS INT) AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      FROM embeddings WHERE vec_id < {DEFAULT_NQ}),
asg AS (SELECT id, e, cid,
        row_number() OVER (PARTITION BY id ORDER BY {_l2('ce', 'e')}, cid) AS rn
        FROM b, c),
lab AS (SELECT id, e, cid AS label FROM asg WHERE rn = 1),
lr AS (SELECT id, e, dense_rank() OVER (ORDER BY label) - 1 AS lrank FROM lab),
q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
      FROM embeddings WHERE vec_id < {DEFAULT_NQ}),
sets AS (
  SELECT 1 AS checkpoint, id, e FROM lr WHERE lrank <= 1
  UNION ALL SELECT 2, id, e FROM lr
  UNION ALL SELECT 3, id, e FROM lr WHERE lrank <> 0
),
d AS (SELECT s.checkpoint, q.qid, s.id, {_l2('q.qe', 's.e')} AS dist FROM sets s, q),
r AS (SELECT checkpoint, qid, id,
      row_number() OVER (PARTITION BY checkpoint, qid ORDER BY dist, id) AS rank FROM d)
SELECT checkpoint, qid, rank, id FROM r WHERE rank <= 10
""",
)
def streaming_clustered_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 end-to-end: quantize to fixed seed centroids (the deterministic,
    oracle-recomputable stand-in for kmeans2 — same
    oracle-checkable-configuration trick as ivf_full_probe), permute
    cluster-contiguously, GENERATE the drift runbook YAML in the
    reference generator's format (`streaming/clustered_data_gen.py:66-96`),
    parse it back through parse_runbook_yaml, and replay: insert
    cluster-by-cluster with searches after cluster 1 and after the last,
    then delete cluster 0's range and search again.  Results map back to
    original ids, so every checkpoint is hash-checkable."""
    import os

    from filter_vectordb_spark.streaming.clustered import (
        cluster_permutation,
        generate_drift_runbook,
        quantize_labels,
    )
    from filter_vectordb_spark.streaming.runbook import parse_runbook_yaml, replay

    import json

    out = _index_cache_dir(sf_dir, "clustered")
    ypath = os.path.join(out, "drift_runbook.yaml")
    ppath = os.path.join(out, "permuted")
    opath = os.path.join(out, "offsets.json")
    if not (_is_built(ppath) and os.path.exists(ypath)):
        # offline build, like the reference's generator script: permute
        # once per sf_dir, persist layout + runbook, replay many times
        os.makedirs(out, exist_ok=True)
        base = dense_vectors(spark, sf_dir).select("id", "emb")
        cent = base.filter(F.col("id") < 8).select(
            F.col("id").cast("int").alias("cid"), F.col("emb").alias("cemb")
        )
        permuted_df, offsets = cluster_permutation(quantize_labels(base, cent))
        permuted_df.write.mode("overwrite").parquet(ppath)
        with open(opath, "w") as f:
            json.dump(offsets, f)
        n_clusters = len(offsets) - 1
        generate_drift_runbook(
            offsets,
            ypath,
            search_after=(1, n_clusters - 1),
            delete_first_cluster=True,
        )
    permuted = spark.read.parquet(ppath)
    rb = parse_runbook_yaml(ypath)
    src = permuted.select(F.col("new_id").alias("id"), "emb")
    res = replay(spark, src, rb, dense_queries(spark, sf_dir), k=10)
    idmap = permuted.select("new_id", F.col("id").alias("orig_id"))
    return res.join(idmap, res["id"] == idmap["new_id"]).select(
        "checkpoint", "qid", "rank", F.col("orig_id").alias("id")
    )


# -- S4 multi-format coverage: the reference's own 482-line delete runbook --
#
# `streaming/delete_runbook.yaml` (the "data drift with deletes" scenario,
# BASELINE.md row 4) is parsed AS SHIPPED — 76 steps, 32 search
# checkpoints, interleaved cluster inserts and range deletes under a
# max_pts=6400 cap.  Vectors for its id space [0, 10000) are derived from
# the embeddings fixture by deterministic tiling (component + ⌊id/n⌋), so
# every checkpoint is exactly recomputable by the oracle: per-checkpoint
# live-id intervals fall out of the same pure-Python interval ledger the
# replayer uses for its consolidation accounting.

_DELETE_RUNBOOK_PATH = "/root/reference/streaming/delete_runbook.yaml"


def _runbook_checkpoint_intervals(rb) -> list[tuple[int, list[tuple[int, int]]]]:
    """(checkpoint number, live-id intervals) at each SEARCH checkpoint
    (insert = upsert range, delete = remove range — `streaming/run.py:39-44`
    semantics).  Checkpoint numbers count search AND range steps, matching
    `replay()`'s counter exactly, so a runbook with interleaved range
    queries keeps oracle and replay numbering in sync."""
    from filter_vectordb_spark.streaming.runbook import _sub_interval

    live: list[tuple[int, int]] = []
    out: list[tuple[int, list[tuple[int, int]]]] = []
    checkpoint = 0
    for s in rb.steps:
        if s.operation == "insert":
            live, _ = _sub_interval(live, s.start, s.end)
            live.append((s.start, s.end))
        elif s.operation == "delete":
            live, _ = _sub_interval(live, s.start, s.end)
        elif s.operation == "search":
            checkpoint += 1
            out.append((checkpoint, sorted(live)))
        elif s.operation == "range":
            checkpoint += 1  # replay() numbers range results too
    return out


def _register_delete_replay() -> None:
    import os

    if not os.path.exists(_DELETE_RUNBOOK_PATH):
        return  # reference checkout absent; surface not registrable
    from filter_vectordb_spark.streaming.runbook import parse_runbook_yaml

    rb = parse_runbook_yaml(_DELETE_RUNBOOK_PATH, "random-xs-clustered")
    max_end = max(s.end for s in rb.steps if s.operation == "insert")
    sets = "\nUNION ALL\n".join(
        f"SELECT {c} AS checkpoint, id, e FROM b WHERE "
        # an all-deleted checkpoint has no live intervals: emit FALSE so
        # the generated SQL stays well-formed (0 rows for that checkpoint)
        + (" OR ".join(f"(id >= {a} AND id < {b})" for a, b in ivs) or "FALSE")
        for c, ivs in _runbook_checkpoint_intervals(rb)
    )
    oracle = f"""
WITH nn AS (SELECT count(*) AS n FROM embeddings),
ids AS (SELECT CAST(r.range AS BIGINT) AS id FROM range(0, {max_end}) r),
b AS (SELECT ids.id,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE) + CAST(ids.id // nn.n AS DOUBLE)) AS e
      FROM ids CROSS JOIN nn JOIN embeddings e ON e.vec_id = ids.id % nn.n),
q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
      FROM embeddings WHERE vec_id < {DEFAULT_NQ}),
sets AS ({sets}),
d AS (SELECT s.checkpoint, q.qid, s.id, {_l2('q.qe', 's.e')} AS dist FROM sets s, q),
r AS (SELECT checkpoint, qid, id,
      row_number() OVER (PARTITION BY checkpoint, qid ORDER BY dist, id) AS rank FROM d)
SELECT checkpoint, qid, rank, id FROM r WHERE rank <= 10
"""

    @register("streaming_delete_replay", oracle)
    def streaming_delete_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
        """S4 multi-format + ST1-ST5 at scale: replay the reference's own
        `delete_runbook.yaml` (`random-xs-clustered`: 76 steps, 32 search
        checkpoints, max_pts 6400 — the BASELINE row-4 drift-with-deletes
        scenario) against a deterministically tiled base; every checkpoint
        is an exact search, so all 32 are hash-checked."""
        from filter_vectordb_spark.sources.tables import load_table
        from filter_vectordb_spark.streaming.runbook import (
            parse_runbook_yaml,
            replay,
        )

        rbk = parse_runbook_yaml(_DELETE_RUNBOOK_PATH, "random-xs-clustered")
        emb = load_table(spark, "embeddings", sf_dir)
        n = emb.count()
        hi = max(s.end for s in rbk.steps if s.operation == "insert")
        ids = spark.range(0, hi)
        src = ids.join(
            F.broadcast(emb.select("vec_id", "embedding")),
            ids["id"] % n == F.col("vec_id"),
        ).select(
            "id",
            F.transform(
                F.col("embedding"),
                lambda x: x.cast("double")
                + F.floor(F.col("id") / n).cast("double"),
            ).alias("emb"),
        )
        q = dense_queries(spark, sf_dir)
        return replay(spark, src, rbk, q, k=10).select(
            "checkpoint", "qid", "rank", "id"
        )


_register_delete_replay()


