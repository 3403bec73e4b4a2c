"""Relational analytics suite over the TPC-H-ish fixtures.

The reference has no relational surface (SURVEY.md §1.2: "no general
relational type system"), but the engine we are building is a general
PySpark analytics engine whose vector operators sit alongside ordinary
OLAP: scans with pushdown, hash aggregates, broadcast/sort-merge joins,
windows.  These queries exercise exactly the plan shapes the vector
operators reuse (groupBy = A1/A3, window top-k = W1, broadcast join = J4)
and anchor the bench against classic TPC-H shapes.

Numeric contract (hash-stability vs the DuckDB oracle): the fixture money
columns are 2-decimal, so all money math runs in EXACT integer cents
(round(x*100) — Spark and DuckDB round identical doubles to identical
integers since true .5 fractions cannot arise from 2-decimal data).  Sums
of integers are order-independent, so partial-aggregation order cannot
perturb results; the only doubles emitted are final divisions of identical
integers.  Spark's double→decimal cast (shortest-string + HALF_UP) and
DuckDB's (exact binary expansion) disagree ~1/1500 values at scale 10,
so DECIMAL casts of raw doubles are banned here.

Integer accumulators are summed as DECIMAL(30,0)→(38,0): exact,
overflow-free at 100 TB row counts (int64 would wrap on Σ e6-unit charges
around ~1e12 rows), and DuckDB's HUGEINT sum matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filter_vectordb_spark.sources.tables import load_table


def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal money double."""
    return F.round(col * 100).cast("long")


def isum(col: Column) -> Column:
    """Overflow-free exact sum of an integer column (see module doc)."""
    return F.sum(col.cast("decimal(30,0)"))


def money_sum(col: Column) -> Column:
    """Σ of a 2-decimal money column, exact, emitted as DOUBLE dollars."""
    return isum(cents(col)).cast("double") / 100.0


# SQL oracle counterparts (DuckDB): identical arithmetic.
_CENTS = "CAST(round({c} * 100) AS BIGINT)"


def _money_sum_sql(c: str) -> str:
    return f"CAST(sum({_CENTS.format(c=c)}) AS DOUBLE) / 100.0"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + 2-key hash aggregate with 8 aggregates.
    The shipdate predicate pushes to the parquet scan.

    disc_price/charge run in e4/e6 integer units: cents × (100−disc_pct)
    [× (100+tax_pct)] — exact, matching TPC-H's decimal semantics.
    """
    l = load_table(spark, "lineitem", sf_dir)
    price_c = cents(F.col("l_extendedprice"))
    disc_pct = cents(F.col("l_discount"))  # 0..10 (percent points)
    tax_pct = cents(F.col("l_tax"))
    disc_price_e4 = price_c * (100 - disc_pct)
    charge_e6 = disc_price_e4 * (100 + tax_pct)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (isum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("sum_qty"),
            (isum(price_c).cast("double") / 100.0).alias("sum_base_price"),
            (isum(disc_price_e4).cast("double") / 10000.0).alias("sum_disc_price"),
            (isum(charge_e6).cast("double") / 1000000.0).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "count_order",
        )
    )


Q1_ORACLE = f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         {_CENTS.format(c='l_quantity')} AS qty_c,
         {_CENTS.format(c='l_extendedprice')} AS price_c,
         {_CENTS.format(c='l_discount')} AS disc_pct,
         {_CENTS.format(c='l_tax')} AS tax_pct
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sum(price_c * (100 - disc_pct)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(price_c * (100 - disc_pct) * (100 + tax_pct)) AS DOUBLE) / 1000000.0 AS sum_charge,
       (CAST(sum(qty_c) AS DOUBLE) / 100.0) / count(*) AS avg_qty,
       (CAST(sum(price_c) AS DOUBLE) / 100.0) / count(*) AS avg_price,
       count(*) AS count_order
FROM c GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (broadcast the small dims) + agg + top-10.
    customer is tiny → broadcast; lineitem⋈orders is the shuffle join."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    revenue_e4 = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    joined = l.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey").agg(
        (isum(revenue_e4).cast("double") / 10000.0).alias("revenue"),
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue")
    )


Q3_ORACLE = f"""
SELECT l_orderkey,
       CAST(sum({_CENTS.format(c='l_extendedprice')} * (100 - {_CENTS.format(c='l_discount')})) AS DOUBLE) / 10000.0 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join; every dim side broadcasts."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    revenue_e4 = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    joined = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        (isum(revenue_e4).cast("double") / 10000.0).alias("revenue")
    )


Q5_ORACLE = f"""
SELECT n_name,
       CAST(sum({_CENTS.format(c='l_extendedprice')} * (100 - {_CENTS.format(c='l_discount')})) AS DOUBLE) / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg — the pushdown showcase.
    Discount bounds compared in exact cents to dodge double-literal traps."""
    l = load_table(spark, "lineitem", sf_dir)
    disc_pct = cents(F.col("l_discount"))
    revenue_e4 = cents(F.col("l_extendedprice")) * disc_pct
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_quantity") < 24)
        )
        .filter((disc_pct >= 2) & (disc_pct <= 6))
        .agg((isum(revenue_e4).cast("double") / 10000.0).alias("revenue"))
    )


Q6_ORACLE = f"""
SELECT CAST(sum({_CENTS.format(c='l_extendedprice')} * {_CENTS.format(c='l_discount')}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND {_CENTS.format(c='l_discount')} BETWEEN 2 AND 6
  AND l_quantity < 24
"""


def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (W1 on a relational table): 3 priciest parts
    per brand, deterministic tiebreak by partkey.  Price emitted in exact
    cents (BIGINT) for the hash compare."""
    p = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand").orderBy(
        cents(F.col("p_retailprice")).desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "p_brand",
            "rank",
            "p_partkey",
            cents(F.col("p_retailprice")).alias("price_cents"),
        )
    )


TOP_PARTS_ORACLE = f"""
SELECT p_brand, rank, p_partkey, price_cents FROM (
  SELECT p_brand, p_partkey, {_CENTS.format(c='p_retailprice')} AS price_cents,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY {_CENTS.format(c='p_retailprice')} DESC, p_partkey ASC) AS rank
  FROM part) t
WHERE rank <= 3
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over the event stream table (batch form of
    the Structured Streaming plan in streaming/events.py).  Hour emitted as
    epoch seconds — integer, timezone-proof on both engines."""
    e = load_table(spark, "events", sf_dir)
    return e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        money_sum(F.col("value")).alias("sum_value"),
    )


EVENTS_HOURLY_ORACLE = f"""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*) AS n_events,
       {_money_sum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per user, a new session starts when the gap from the
    previous event exceeds `gap_minutes`.  One row per session.

    Seconds are FLOOR-truncated (Spark's unix_timestamp semantics) on both
    engines so fractional-second timestamps can't flip a session boundary.
    """
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_new = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = with_new.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sid.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_timestamp("ts")).alias("start_epoch"),
            F.max(F.unix_timestamp("ts")).alias("end_epoch"),
        )
        .select("user_id", "session_no", "n_events", "start_epoch", "end_epoch")
    )


SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
s AS (
  SELECT user_id, sec,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no, count(*) AS n_events,
       min(sec) AS start_epoch,
       max(sec) AS end_epoch
FROM s GROUP BY user_id, session_no
"""


def orders_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (grouping-sets surface): order counts by
    status × priority with subtotals.  NULL markers normalized to 'ALL'
    so the hash compare is unambiguous."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


ORDERS_ROLLUP_ORACLE = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       {_money_sum_sql('o_totalprice')} AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""
