"""User-defined function surface (SURVEY §2.2 UDF/UDAF/UDTF row).

The engine's position is that UDFs are the slow path — every hot-path
operator in this repo is built-in expressions or Arrow-batched pandas.
This module demonstrates each extension point ONCE, oracle-checked, so
users know the supported escape hatches and their cost model:

* ``pandas_udf`` grouped-aggregate (vectorized UDAF): Arrow transfers
  each group's columns as numpy arrays; the reduction runs in C. Still
  a full shuffle on the group key (no partial aggregation — the
  fundamental UDAF trade-off, called out in the docstring).
* Python UDTF (Spark ≥ 3.5): table function with lateral-join
  semantics.

Both compute something the built-in surface could also express — that
is deliberate, so the DuckDB oracle can verify the UDF machinery
end-to-end rather than trusting it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..queries import register
from ..tables import load_table


@register(
    "udaf_pandas_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
                * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 10000.0
       / (CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0)
       AS weighted_avg_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Vectorized UDAF: quantity-weighted average price via pandas_udf grouped-agg.",
)
def udaf_pandas_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf = UDAF without partial aggregation: the
    whole group's columns ship to Python (Arrow-batched), so the shuffle
    carries raw rows, not partial states. Fine for bounded groups (3
    here); for high-cardinality keys prefer built-in aggregates or an
    algebraic reformulation — which is exactly what the oracle shows
    (two decimal SUMs), and why the hot paths in this repo never use
    UDAFs. Decimal inputs keep the Python-side double sums deterministic:
    pandas sums a sorted-by-nothing array, but the products are exact
    decimals rendered to float64, summed with pairwise summation over
    a deterministic Arrow partition order (single group per task)."""

    @pandas_udf("double")
    def weighted_avg(qty: pd.Series, price: pd.Series) -> float:
        # exact integer arithmetic (cents), then the SAME float ops as
        # the oracle: sums are exact int64, every rounding site matches
        q = (qty * 100).round().astype("int64")
        p = (price * 100).round().astype("int64")
        return float((q * p).sum()) / 10000.0 / (float(q.sum()) / 100.0)

    @pandas_udf("long")
    def n_rows(qty: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with built-in aggregates in
        # one agg() — so the count is a (trivial) pandas UDAF too
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_quantity", "l_extendedprice").alias("weighted_avg_price"),
        n_rows("l_quantity").alias("n"),
    )


@register(
    "udtf_span_split",
    oracle="""
SELECT o_orderkey, year_no, order_year
FROM (
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           UNNEST(range(1, 4)) AS year_no
    FROM orders
    WHERE o_totalprice > 400000
)
WHERE year_no <= 3
""",
    doc="Python UDTF: expand each qualifying order into 3 forecast-year rows.",
)
def udtf_span_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF = table-generating extension point (Spark ≥ 3.5). Runs one
    Python process per task with Arrow transfer; rows fan out within
    their partition (narrow, like explode). The selective filter is
    applied BEFORE the UDTF so Python sees only qualifying rows —
    predicates do not push through Python table functions, so order
    the plan manually."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, year_no int, order_year int")
    class SpanSplit:
        def eval(self, o_orderkey: int, order_year: int):
            for i in range(1, 4):
                yield o_orderkey, i, order_year

    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("order_year"))
    )
    spark.udtf.register("span_split", SpanSplit)
    o.createOrReplaceTempView("_udtf_input")
    # LATERAL join: the SQL-native invocation path for table functions
    return spark.sql(
        """
        SELECT t.o_orderkey, t.year_no, t.order_year
        FROM _udtf_input, LATERAL span_split(o_orderkey, order_year) t
        """
    )
