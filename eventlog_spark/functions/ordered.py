"""Ordered-adjacency context (lag / lead / running-max) WITHOUT a
global single-partition sort.

``Window.orderBy(col)`` with no partition spec funnels every row
through ONE task — the classic scale-killer for sequential checks
(previous row's timestamp, chain links) over a 100 TB table. The
reference audits its log sequentially on one machine
(eventlog/file/check_integrity.go:15-94); the distributed rendition
decomposes the same semantics into:

1. bucketize the (integer) order key into ``n`` equal-width value
   ranges — bucket bounds come from a min/max aggregate that parquet
   answers from footer stats, so the extra pass reads no data;
2. ONE hash shuffle on the bucket id; the per-bucket window
   (``partitionBy(bucket).orderBy(order_col)``) is satisfied by that
   same exchange — Catalyst inserts no second shuffle (verified in
   tests/test_plans.py), unlike ``repartitionByRange`` +
   ``partitionBy(spark_partition_id())`` which re-shuffles;
3. a boundary pass over ONE ROW PER BUCKET (last/first/max values per
   range) — physically a ReusedExchange of the same shuffle — where a
   driver-size window fills in the cross-bucket adjacency: the first
   row of bucket b takes its lag value from the last row of the
   nearest earlier non-empty bucket, and running maxima are offset by
   the prefix max over earlier buckets.

Equal-width bucketing balances when key density is roughly uniform —
exactly true for the log's dense versions, true enough for event ids.
A pathological distribution skews buckets but never breaks correctness
(bucket ids only need to be MONOTONE in the order key; the boundary
pass fixes cross-bucket adjacency whatever the occupancy). For
arbitrary skewed keys pass ``skewed=True``: bucket bounds then come
from ``approxQuantile`` — one extra narrow pass over just the order
column — so every bucket holds ≈ 1/n of the ROWS regardless of the
value distribution (equi-depth, the histogram trick). Same single data
shuffle either way; only the bounds derivation differs.

Null caveat: lag/lead fill-in uses ``coalesce`` with the boundary
value, so data columns that can legitimately hold NULLs would be
back-filled incorrectly; use only over non-null columns (version ids,
timestamps — the log envelope guarantees both).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "_ord_bucket"


def with_adjacent(
    df: DataFrame,
    order_col: str,
    lag_cols: Sequence[str] = (),
    lead_cols: Sequence[str] = (),
    running_max_cols: Sequence[str] = (),
    num_partitions: int | None = None,
    skewed: bool = False,
) -> DataFrame:
    """Add ``<c>_lag`` / ``<c>_lead`` / ``<c>_prevmax`` columns as if
    computed by a global ``Window.orderBy(order_col)`` (lag(1), lead(1),
    max over rows strictly before the current one), using the bucketed
    strategy described in the module docstring. ``order_col`` must be a
    unique, non-null integer column (a version / sequence id).

    ``skewed=True`` derives equi-depth bucket bounds from
    ``approxQuantile`` instead of equal-width min/max — use for order
    keys with non-uniform value density (hash keys, quadratic ids),
    where equal-width ranges would funnel most rows into few buckets.
    Results are identical either way (bucketing is an internal
    partitioning choice); only load balance differs."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    if skewed:
        # equi-depth: n-1 interior cut points; bucket id = number of
        # bounds strictly below the value — monotone in the order key,
        # which is the only property the boundary pass needs. The
        # quantile job reads ONE column (pruned scan); bounds are
        # approximate, so occupancy is ≈ rows/n, not exact — both are
        # fine, correctness never depends on the bounds.
        # n == 1 → no interior cut points; approxQuantile rejects an
        # empty probability list, so short-circuit to a single bucket
        # (the equal-width branch already handles n == 1 the same way).
        probs = [i / n for i in range(1, n)]
        bounds = (
            sorted(set(df.stat.approxQuantile(order_col, probs, 0.001)))
            if probs
            else []
        )
        bucket = F.lit(0)
        for b in bounds:
            bucket = bucket + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
        part = df.withColumn(_BKT, bucket.cast("int")).repartition(n, F.col(_BKT))
    else:
        mn, mx = df.agg(F.min(order_col), F.max(order_col)).first()
        if mn is None:  # empty input — bucket id is irrelevant
            mn, mx = 0, 0
        width = max(1, math.ceil((int(mx) - int(mn) + 1) / n))
        part = df.withColumn(
            _BKT,
            F.least(
                F.lit(n - 1),
                F.floor((F.col(order_col) - F.lit(int(mn))) / F.lit(width)),
            ).cast("int"),
        ).repartition(n, F.col(_BKT))

    wloc = Window.partitionBy(_BKT).orderBy(order_col)
    wloc_prev = wloc.rowsBetween(Window.unboundedPreceding, -1)

    out = part
    for c in lag_cols:
        out = out.withColumn(f"_loc_lag_{c}", F.lag(c).over(wloc))
    for c in lead_cols:
        out = out.withColumn(f"_loc_lead_{c}", F.lead(c).over(wloc))
    for c in running_max_cols:
        out = out.withColumn(f"_loc_pmax_{c}", F.max(c).over(wloc_prev))

    # Boundary frame: ONE row per (non-empty) bucket. The unpartitioned
    # window below runs over ≤ num_partitions rows — driver-size by
    # construction, not a scale hazard.
    aggs = []
    for c in dict.fromkeys(lag_cols):
        aggs.append(F.max_by(c, F.col(order_col)).alias(f"_last_{c}"))
    for c in dict.fromkeys(lead_cols):
        aggs.append(F.min_by(c, F.col(order_col)).alias(f"_first_{c}"))
    for c in dict.fromkeys(running_max_cols):
        aggs.append(F.max(c).alias(f"_bmax_{c}"))
    bnd = part.groupBy(_BKT).agg(*aggs)

    wb = Window.orderBy(_BKT)
    sel = [F.col(_BKT)]
    for c in lag_cols:
        sel.append(F.lag(f"_last_{c}").over(wb).alias(f"_prevpart_{c}"))
    for c in lead_cols:
        sel.append(F.lead(f"_first_{c}").over(wb).alias(f"_nextpart_{c}"))
    for c in running_max_cols:
        sel.append(
            F.max(f"_bmax_{c}")
            .over(wb.rowsBetween(Window.unboundedPreceding, -1))
            .alias(f"_prefmax_{c}")
        )
    bnd = bnd.select(*sel)

    out = out.join(F.broadcast(bnd), _BKT, "left")
    for c in lag_cols:
        out = out.withColumn(
            f"{c}_lag", F.coalesce(f"_loc_lag_{c}", f"_prevpart_{c}")
        ).drop(f"_loc_lag_{c}", f"_prevpart_{c}")
    for c in lead_cols:
        out = out.withColumn(
            f"{c}_lead", F.coalesce(f"_loc_lead_{c}", f"_nextpart_{c}")
        ).drop(f"_loc_lead_{c}", f"_nextpart_{c}")
    for c in running_max_cols:
        # greatest() skips NULLs: first row of first bucket → NULL
        out = out.withColumn(
            f"{c}_prevmax", F.greatest(f"_loc_pmax_{c}", f"_prefmax_{c}")
        ).drop(f"_loc_pmax_{c}", f"_prefmax_{c}")
    return out.drop(_BKT)
