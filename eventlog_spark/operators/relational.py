"""Relational operator surface (SURVEY.md §2.2) over the driver testdata.

Every query here is pure declarative DataFrame API (or spark.sql where the
construct is SQL-native, e.g. GROUPING SETS) so Catalyst gets full freedom:
predicate pushdown and column pruning reach the parquet scans, AQE picks
join strategies and splits skew, and everything stays inside whole-stage
codegen — no Python in any hot path.

Scale notes per operator are in the docstrings: which side broadcasts,
where the shuffles are, and why the plan survives 1000×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    """Money column → exact decimal before aggregation (order-independent
    sums ⇒ deterministic across partitionings and engines)."""
    return F.col(col).cast("decimal(12,2)")


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS sum_disc_price,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) * CAST(1.0 + l_tax AS DECIMAL(12,2))) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: scan + filter + hash agg (partial/final).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship. One wide parquet scan with the shipdate predicate pushed
    down, then a partial+final hash aggregate on a 6-value grouping key —
    the map-side combine means the shuffle carries ~6 rows per task no
    matter how many TB the scan reads. Decimal sums are exact so results
    are independent of partition count."""
    li = _t(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)")
    charge = disc * (F.lit(1.0) + F.col("l_tax")).cast("decimal(12,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    doc="ROLLUP hierarchy totals.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup = expand-then-aggregate in Spark; the expand happens before
    the partial aggregate so the shuffle still carries only group rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE over two low-cardinality dims.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(_dec("o_totalprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc="Explicit GROUPING SETS.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_distinct",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc="Mixed distinct + plain aggregates (two-phase distinct agg).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plans count(distinct) as a double shuffle (expand on the
    distinct key, then final agg) with partial aggregation both times —
    scales linearly; no driver-side distinct anywhere."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec("c_acctbal")).alias("sum_bal"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3: 3-way join + agg + top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer(filtered) is small relative to lineitem → broadcast it into
    orders, then shuffle-join the result with lineitem on orderkey. AQE
    demotes/promotes to broadcast automatically from runtime stats; the
    final top-10 is a TakeOrderedAndProject (no global sort)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    doc="TPC-H Q5: 6-way star join + agg.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: region/nation/supplier/customer are dimension
    tables → all broadcast; only the orders⋈lineitem join shuffles, keyed
    on orderkey. At 100 TB that one shuffle is unavoidable (both sides
    huge); co-locating both tables bucketed by orderkey would remove it."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("revenue"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""",
    doc="Left-semi join (EXISTS).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join never widens rows — Spark keeps only the probe side after
    the first match, so the output is bounded by `customer`."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                    AND o_totalprice > 150000)
""",
    doc="Left-anti join (NOT EXISTS): customers with no large urgent order.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast_dim",
    oracle="""
SELECT n_name, r_name, COUNT(*) AS n_customers,
       SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""",
    doc="Fact ⋈ broadcast dims, zero shuffle until the final agg.",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both dims broadcast → the only shuffle is the 25-key aggregate.
    This is the pattern every 100 TB fact-to-dim join should compile to."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).alias("sum_bal"),
        )
    )


@register(
    "join_range",
    oracle="""
WITH buckets(lo, hi, bucket_name) AS (
    VALUES (0.0, 50.0, 'b0'), (50.0, 100.0, 'b1'), (100.0, 150.0, 'b2'),
           (150.0, 200.0, 'b3'), (200.0, 250.0, 'b4'), (250.0, 300.0, 'b5'),
           (300.0, 350.0, 'b6')
)
SELECT bucket_name, event_type, COUNT(*) AS n,
       SUM(CAST(value AS DECIMAL(12,2))) AS sum_value
FROM events JOIN buckets ON value >= lo AND value < hi
GROUP BY bucket_name, event_type
""",
    doc="Range (theta) join against a tiny bucket dim.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta joins have no hash strategy; with a broadcast tiny side Spark
    uses BroadcastNestedLoopJoin, which is O(rows × buckets) — fine at any
    fact size since the bucket dim is constant."""
    ev = _t(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(float(i * 50), float((i + 1) * 50), f"b{i}") for i in range(7)],
        "lo double, hi double, bucket_name string",
    )
    return (
        ev.join(
            F.broadcast(buckets),
            (ev.value >= buckets.lo) & (ev.value < buckets.hi),
        )
        .groupBy("bucket_name", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).alias("sum_value"),
        )
    )


@register(
    "join_asof",
    oracle="""
SELECT event_id, user_id, ts, last_click_ts FROM (
    SELECT event_id, user_id, ts, is_click,
           last_value(click_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_click DESC, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
    FROM (
        SELECT user_id, ts, event_id, CAST(NULL AS TIMESTAMP) AS click_ts, 0 AS is_click
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, NULL, ts, 1
        FROM events WHERE event_type = 'click'
    )
) WHERE is_click = 0
""",
    doc="As-of join: each purchase ⟵ latest click at-or-before it, per user.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window technique: tag both streams, union,
    and carry the last non-null right-side timestamp forward within each
    key. One shuffle on user_id, no N×M expansion — this is the scalable
    formulation (merge_asof-in-applyInPandas would force a Python hop)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(0).alias("is_click"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("is_click") == 0)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
) WHERE rk <= 3
""",
    doc="Top-3 orders per customer via ranked window.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned window → one shuffle on the partition key; Spark 3.5+
    inserts WindowGroupLimit so each task keeps only k rows per key before
    the full sort — survives arbitrarily large groups."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "window_running_total",
    oracle="""
SELECT event_id, user_id, ts,
       SUM(CAST(value AS DECIMAL(12,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value,
       LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
       LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
FROM events
""",
    doc="Running sum + lag/lead chain per user.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(_dec("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("running_value"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "window_sessionize",
    oracle="""
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM (
    SELECT user_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    )
)
GROUP BY user_id, session_id
""",
    doc="Gap-based sessionization (30 min) via lag + running sum.",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic two-window sessionizer; both windows share the same
    partitioning/ordering so Spark computes them in one window exec after
    a single shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")
    is_new = F.when(F.lag("ts").over(w).isNull() | gap, 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k / set ops
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="Global top-k (TakeOrderedAndProject, no full sort).",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject: each task keeps a
    k-row heap, the driver merges heaps — O(n) scan, no global sort."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "setop_union",
    oracle="""
SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT o_custkey AS key, 'orders' AS src FROM orders WHERE o_totalprice > 300000
""",
    doc="UNION ALL of two filtered scans.",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src")).unionByName(
        o.select(F.col("o_custkey").alias("key"), F.lit("orders").alias("src"))
    )


@register(
    "setop_intersect",
    oracle="""
SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    doc="INTERSECT (distinct semantics).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"))
    )
    return c.intersect(o)


@register(
    "setop_except",
    oracle="""
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
""",
    doc="EXCEPT (distinct) — customers with no finished order.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("key"))
    )
    return c.subtract(o)


# ---------------------------------------------------------------------------
# Scalar functions & JSON
# ---------------------------------------------------------------------------


@register(
    "scalar_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTR(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT(p_brand, '#', p_type) AS brand_type,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       ABS(p_size - 25) AS size_dist,
       p_size % 7 AS size_mod
FROM part
""",
    doc="String/math scalar-function projection (pure codegen).",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
       STRFTIME(o_orderdate, '%Y-%m') AS year_month,
       DATE_TRUNC('month', o_orderdate) AS month_start
FROM orders
""",
    doc="Datetime extraction + truncation.",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@register(
    "json_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    doc="JSON payload field extraction + aggregate (schema-on-read).",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object is a JVM-side SIMD-friendly path; at scale, promote
    hot JSON fields to materialized columns (the reference stores payloads
    as raw bytes and never interprets them — SURVEY §1.3)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )
