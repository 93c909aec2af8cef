"""Additional TPC-H-derived queries over the driver testdata.

The testdata is a trimmed TPC-H star schema (no partsupp, no
l_shipmode/l_commitdate/l_receiptdate, no p_container — see TESTDATA.md),
so the classic queries that need those columns (Q2, Q4, Q9, Q11, Q12,
Q16, Q19, Q20) are adapted or out of scope; the ones below preserve the
original plan shapes — selective scans, multi-way joins, group-aggregate
with HAVING, left-outer + double aggregation, conditional aggregation —
on the columns that exist.

Determinism: all money sums go through DECIMAL(12,2) (exact, order
independent); ratios divide two identically-derived doubles. Same rules
as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _disc_price() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)")


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: highly selective scan + ungrouped aggregate.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole query is one parquet scan with every predicate pushed
    down (shipdate range prunes row groups via min/max stats at scale)
    feeding a partial+final agg of exactly one row per task — the shuffle
    carries #tasks rows total. The optimal 100 TB plan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS revenue,
       CAST(c_acctbal AS DECIMAL(12,2)) AS c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem(R-flagged) ⋈ orders(quarter) shuffles on orderkey; the
    customer and nation joins broadcast. Top-20 compiles to
    TakeOrderedAndProject — no global sort of the aggregate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _dec("c_acctbal").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
         ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
""",
    doc="TPC-H Q13: left-outer join + double aggregation (order-count histogram).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer keeps order-less customers (count 0). First agg shuffles
    on custkey (high cardinality, even distribution); the histogram
    re-agg's key space is tiny so its shuffle is negligible."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
       AS promo_revenue_pct,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
    doc="TPC-H Q14: conditional aggregation ratio (promo revenue share).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part broadcasts into the filtered lineitem scan; the conditional
    sums are computed in one pass (no second scan for the denominator).
    Ratio divides two exact decimals cast to double → deterministic."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = _disc_price()
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") * 100.0 / F.sum(disc).cast("double")).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice, sum_qty
FROM (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    doc="TPC-H Q18: group-agg with HAVING, join back to orders/customer, top 100.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING filter runs on the aggregated (small) side before the
    joins, so the orderkey join probes only qualifying orders. At 100 TB
    the lineitem agg is the one big shuffle; bucketing lineitem and
    orders by orderkey would co-locate both it and the join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _dec("o_totalprice").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
