"""functions/ordered.py: global-window equivalence of the bucketed
adjacency decomposition, including the round-5 equi-depth (skewed) path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventlog_spark.functions.ordered import _BKT, with_adjacent


def _zipfish(spark, n=4000):
    """Unique integer keys with heavily non-uniform value density:
    key = i³ (density ∝ v^(-2/3) — most keys crowd near zero)."""
    return spark.range(n).select(
        (F.col("id") * F.col("id") * F.col("id")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )


def _truth(df):
    w = Window.orderBy("k")
    return {
        r.k: (r.lag_v, r.lead_v, r.pmax_v)
        for r in df.select(
            "k",
            F.lag("v").over(w).alias("lag_v"),
            F.lead("v").over(w).alias("lead_v"),
            F.max("v").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("pmax_v"),
        ).collect()
    }


def test_skewed_matches_global_window(spark):
    df = _zipfish(spark)
    got = {
        r.k: (r.v_lag, r.v_lead, r.v_prevmax)
        for r in with_adjacent(
            df, "k", lag_cols=["v"], lead_cols=["v"], running_max_cols=["v"],
            num_partitions=32, skewed=True,
        ).collect()
    }
    assert got == _truth(df)


def test_skewed_buckets_are_balanced_where_equal_width_is_not(spark):
    """On the cubic key, equal-width ranges funnel ~97% of rows into the
    first bucket; equi-depth bounds keep every bucket near rows/n."""
    df = _zipfish(spark)
    n = 32

    def occupancies(skewed: bool):
        # replicate only the bucket-assignment stage
        if skewed:
            probs = [i / n for i in range(1, n)]
            bounds = sorted(set(df.stat.approxQuantile("k", probs, 0.001)))
            b = F.lit(0)
            for x in bounds:
                b = b + F.when(F.col("k") > F.lit(x), 1).otherwise(0)
        else:
            mn, mx = df.agg(F.min("k"), F.max("k")).first()
            import math

            width = max(1, math.ceil((mx - mn + 1) / n))
            b = F.least(F.lit(n - 1), F.floor((F.col("k") - mn) / width))
        return [
            r.c
            for r in df.select(b.cast("int").alias(_BKT))
            .groupBy(_BKT)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]

    total = df.count()
    ideal = total / n
    # equal-width: bucket 0 holds (1/n)^(1/3) of all rows ≈ 10× ideal
    assert max(occupancies(skewed=False)) > 8 * ideal  # the skew problem
    assert max(occupancies(skewed=True)) < 3 * ideal  # the fix


def test_skewed_keeps_single_data_shuffle(spark):
    """The equi-depth path must not add a second exchange over the data:
    same plan shape as the equal-width path — one repartition on the
    bucket id feeding the per-bucket window."""
    df = _zipfish(spark)
    out = with_adjacent(df, "k", lag_cols=["v"], num_partitions=8, skewed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exchanges: the data repartition + the one-row-per-bucket boundary
    # aggregate (and its tiny single-partition window) — no more than
    # the equal-width path produces
    base = with_adjacent(df, "k", lag_cols=["v"], num_partitions=8)
    base_plan = base._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= base_plan.count("Exchange")
