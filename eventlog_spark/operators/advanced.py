"""Advanced relational surface: outer joins, subquery decorrelation,
pivot, array/collection functions, ranking-function suite, exact
percentiles.

Rounds out the SURVEY §2.2 checklist beyond the core demos in
relational.py. Determinism rules are the shared ones from queries.py;
collection outputs are rendered as sorted joined strings so the value
hash is engine- and partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


@register(
    "join_full_outer",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
                   SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS cust_bal
            FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey),
     sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp,
                   SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS supp_bal
            FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey, n_cust, cust_bal, n_supp, supp_bal
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
    doc="Full-outer join of two pre-aggregated sides (nation balance rollup).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-join: both sides shrink to ≤25 rows before the
    full-outer, so the join is trivial regardless of input scale — the
    pattern to prefer over outer-joining raw fact tables."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    s = _t(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum(_dec("c_acctbal")).alias("cust_bal")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum(_dec("s_acctbal")).alias("supp_bal")
    )
    return cn.join(sn, cn.c_nk == sn.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        "n_cust",
        "cust_bal",
        "n_supp",
        "supp_bal",
    )


@register(
    "subquery_above_group_avg",
    oracle="""
SELECT p_partkey, p_type, CAST(p_retailprice AS DECIMAL(12,2)) AS p_retailprice
FROM part
WHERE p_retailprice > (
    SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM part p2 WHERE p2.p_type = part.p_type
)
""",
    doc="Correlated scalar subquery (price above type average), decorrelated via window.",
)
def subquery_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated subquery decorrelates to a windowed group average —
    one shuffle on p_type instead of a per-row subquery. This is exactly
    the rewrite Catalyst applies to the SQL form; written explicitly here
    to pin the plan. Average = exact decimal sum / count, so the filter
    threshold is bit-identical across engines."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    avg_price = F.sum(_dec("p_retailprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return (
        p.withColumn("type_avg", avg_price)
        .where(F.col("p_retailprice") > F.col("type_avg"))
        .select("p_partkey", "p_type", _dec("p_retailprice").alias("p_retailprice"))
    )


@register(
    "pivot_returnflag",
    oracle="""
SELECT l_linestatus,
       SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qty_a,
       SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qty_n,
       SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qty_r
FROM lineitem
GROUP BY l_linestatus
""",
    doc="Pivot (long→wide) on return flag; equals conditional aggregation.",
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot values keep the plan static (no extra job to
    discover distinct keys) — required for predictable plans at scale.
    Pivot compiles to exactly the oracle's conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(_dec("l_quantity")))
        .select(
            "l_linestatus",
            F.col("A").alias("qty_a"),
            F.col("N").alias("qty_n"),
            F.col("R").alias("qty_r"),
        )
    )


@register(
    "array_collect_ops",
    oracle="""
SELECT c_mktsegment,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT c_nationkey)), ',') AS nation_keys,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""",
    doc="collect_set + array_sort + array_join (grouped collection agg).",
)
def array_collect_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set is safe only when per-group cardinality is bounded
    (25 nations here); for unbounded groups prefer re-aggregation or
    top-k pruning first. Sorted-then-joined output makes the value
    independent of partition arrival order."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_set("c_nationkey")), ",").alias("nation_keys"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "explode_unnest",
    oracle="""
SELECT word, COUNT(*) AS n, COUNT(DISTINCT p_brand) AS n_brands
FROM (SELECT p_brand, UNNEST(STRING_SPLIT(p_type, ' ')) AS word FROM part)
GROUP BY word
""",
    doc="split + explode (UNNEST): word frequencies across part types.",
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode is a narrow transformation (no shuffle) — rows fan out
    within their partition; only the word-count agg shuffles, keyed on a
    small vocabulary."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_brand", F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
    )


@register(
    "window_rank_suite",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
    doc="Ranking-function suite: rank/dense_rank/ntile/percent_rank/cume_dist.",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five ranking functions share one window spec → a single
    shuffle+sort on (o_orderstatus, o_totalprice desc, o_orderkey) feeds
    one WindowExec. The tie-breaking o_orderkey makes every rank (and
    therefore the hash) deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        _dec("o_totalprice").alias("o_totalprice"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_last_hour,
       SUM(CAST(value AS DECIMAL(12,2))) OVER w AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    doc="RANGE frame: per-user trailing-1-hour count and sum at each event.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) frame — the sliding-window aggregate the
    events stream needs in batch form. One shuffle on user_id; within a
    partition the frame is maintained incrementally by WindowExec (two
    moving pointers), so cost is O(rows), not O(rows × frame). Frame
    bounds are value-based so peer rows (equal ts) share results —
    deterministic without an event_id tie-break.

    The DataFrame API needs a numeric ORDER BY for value ranges:
    cast(ts as double) = epoch seconds incl. fractional micros. A flip
    vs DuckDB's exact interval arithmetic would need two events exactly
    3600.000000s apart (micro-resolution data) — not present, and
    vanishingly unlikely in real event streams."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).alias("sum_last_hour"),
    )


@register(
    "subquery_argmin_per_group",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, CAST(s_acctbal AS DECIMAL(12,2)) AS s_acctbal
FROM supplier
WHERE s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
""",
    doc="Argmin per group (TPC-H Q2 pattern): suppliers with their nation's minimum balance.",
)
def subquery_argmin_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q2 min-cost-supplier pattern on the columns this schema has:
    correlated MIN subquery ≡ windowed group-min + equality filter (one
    shuffle on the group key, no join back). Ties all qualify in both
    engines, so no arbitrary row choice exists and results hash-match.
    min() on doubles is exact (no accumulation), so the equality filter
    is safe."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("nation_min", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("nation_min"))
        .select(
            "s_suppkey",
            "s_name",
            "s_nationkey",
            _dec("s_acctbal").alias("s_acctbal"),
        )
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       QUANTILE_CONT(l_quantity, 0.25) AS qty_p25,
       QUANTILE_CONT(l_quantity, 0.5)  AS qty_median,
       QUANTILE_CONT(l_quantity, 0.75) AS qty_p75,
       MIN(l_quantity) AS qty_min,
       MAX(l_quantity) AS qty_max,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact percentiles (quartiles) of quantity per return flag.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile materializes each group's values — fine for a
    3-group key; at 100 TB with high-cardinality groups switch to
    percentile_approx (t-digest sketch, mergeable map-side). l_quantity
    is integer-valued so linear interpolation is exact in FP on both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("qty_p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("qty_median"),
        F.expr("percentile(l_quantity, 0.75)").alias("qty_p75"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    doc="Exchange-free co-located join: both sides stored bucketed+sorted by the join key.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The storage-level answer to repeated big-big joins: write both
    tables bucketed AND sorted by the join key once, and every
    subsequent join on that key is a zero-shuffle, zero-sort merge —
    the exchange that dominates a 100 TB join simply isn't in the plan
    (test_plans asserts it). This is how a production log table should
    be laid out for its hot join keys; the write cost is paid once and
    amortized over every downstream query. Here the bucketed copies are
    written to a temp warehouse per call (the demo includes the
    one-time cost); the merge hint pins SMJ so the bucketed scan is
    exercised even where stats would pick a broadcast. Result is
    oracle-identical to the plain join.

    Harness-safety (round-2 hardening): table names are unique per
    invocation (no cross-session DROP/overwrite races), the previous
    invocation's tables are dropped lazily at the NEXT call (never
    before the returned lazy DataFrame has been collected), and a
    session where ``saveAsTable`` is unavailable falls back to the
    same join/agg over the raw tables — identical result, just with
    the exchange the bucketed layout would have removed."""
    import tempfile
    import uuid

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(12,2)")

    def join_agg(lib: DataFrame, ob: DataFrame) -> DataFrame:
        return (
            lib.hint("merge")
            .join(ob, lib.l_orderkey == ob.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"), F.sum(disc).alias("revenue"))
        )

    # Drop the *previous* call's demo tables (safe: their results were
    # collected before anyone could call this again).
    for stale in list(_BUCKETED_DEMO_TABLES):
        try:
            spark.sql(f"DROP TABLE IF EXISTS {stale}")
        except Exception:
            pass
        _BUCKETED_DEMO_TABLES.discard(stale)

    tag = uuid.uuid4().hex[:12]
    try:
        wh = tempfile.mkdtemp(prefix=f"bucketed_wh_{tag}_")
        names = (f"li_bkt_{tag}", f"o_bkt_{tag}")
        for name, df, key in (
            (names[0], li, "l_orderkey"),
            (names[1], o, "o_orderkey"),
        ):
            (
                # ROUND-12 OPTIMIZATION (guide §6, small files): without
                # the pre-repartition every scan task writes its own copy
                # of every bucket — 32 tasks × 8 buckets = 256 files per
                # table, each a separately-opened sorted spill target.
                # Hash-repartitioning by the bucket key first routes each
                # bucket's rows to one task: exactly 8 files per table,
                # one sorted run each (the layout a production bucketed
                # table write uses), and the downstream zero-shuffle
                # merge join is unchanged (plans/r12/).
                df.repartition(8, F.col(key))
                .write.format("parquet")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{wh}/{name}")
                .mode("overwrite")
                .saveAsTable(name)
            )
            _BUCKETED_DEMO_TABLES.add(name)
        return join_agg(spark.table(names[0]), spark.table(names[1]))
    except Exception:
        # Catalog-less or write-restricted session: identical semantics
        # via the plain shuffled sort-merge join.
        return join_agg(li, o)


_BUCKETED_DEMO_TABLES: set[str] = set()


N_SALTS = 8


@register(
    "join_skew_salted",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    doc="Skew-resistant salted shuffle join (lineitem ⋈ orders), result identical to the plain join.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual answer to shuffle-join key skew, for when AQE's
    skew-split can't apply (e.g. the skewed side feeds a same-keyed
    aggregate, or stream-static joins where AQE is off): the fact side
    gets a salt in [0, 8) derived from a non-join column, the dimension
    side is exploded ×8 with every salt, and the join key becomes
    (orderkey, salt) — a hot orderkey now lands on 8 reducers instead
    of one. Cost: 8× the dimension-side shuffle volume, zero extra on
    the fact side; result provably identical to the unsalted join (each
    fact row meets each matching dim row exactly once, at its own salt).
    The merge hint forces a real exchange so the demo exercises the
    salted path even where stats would pick a broadcast (where
    broadcast fits, salting is moot — the skewed key never shuffles).

    Scale lesson (round-12, found by the sf3 sweep): this hint was
    previously ``shuffle_hash``, which pins a shuffled hash join —
    and SHJ's per-partition build map CANNOT spill, so its memory
    footprint grows linearly with data per partition: at sf3 the
    x8-exploded orders build side OOMed the executor pool
    ("SparkOutOfMemoryError: not enough memory to build hash map"),
    and at 100 TB it is guaranteed death. Sort-merge spills both
    sides gracefully at any scale and serves the demo identically —
    never pin shuffle_hash on a side that scales with the corpus.
    The oracle IS the plain join: equivalence is the test."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(N_SALTS))
    )
    o = _t(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    )
    disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(12,2)")
    return (
        li.join(o.hint("merge"), (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(disc).alias("revenue"))
    )


# -- SCD2 interval build (warehouse dimension history) ------------------------


@register(
    "scd2_user_state",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
    FROM events
)
SELECT user_id, event_id, event_type, value AS state_value,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CAST(CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM e
""",
    doc="SCD2 history build: per-user validity intervals "
    "(valid_from/valid_to/is_current) from the event stream.",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an append-only event
    stream: each event opens a validity interval that the user's next
    event closes (valid_to = lead(ts)); the open interval is the
    current state. This is the standard warehouse pattern for turning
    the log this engine stores into point-in-time joinable history
    (pair with join_asof for the probe side).

    One shuffle on user_id; the lead() window rides that partitioning.
    Ties break on event_id so the interval chain is a total order on
    both engines. At 100 TB the user_id shuffle is the same exchange a
    downstream as-of join needs — write the result bucketed by user_id
    and the probe join is exchange-free (join_bucketed_colocated shows
    that storage layout)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )


# -- batch MERGE / upsert -----------------------------------------------------

_UPD_MOD = 97     # keys with o_orderkey % 97 == 0 get updated
_INS_MOD = 293    # keys with o_orderkey % 293 == 0 spawn an insert
_INS_OFFSET = 10_000_000


@register(
    "merge_upsert_orders",
    oracle=f"""
WITH changes AS (
    SELECT o_orderkey, 'U' AS c_status, o_totalprice + 100.0 AS c_price
    FROM orders WHERE o_orderkey % {_UPD_MOD} = 0
    UNION ALL
    SELECT o_orderkey + {_INS_OFFSET}, 'N', 42.5
    FROM orders WHERE o_orderkey % {_INS_MOD} = 0
),
merged AS (
    SELECT COALESCE(c.c_status, b.o_orderstatus) AS status,
           COALESCE(c.c_price, b.o_totalprice) AS price
    FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
)
SELECT status AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(price * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM merged GROUP BY status
""",
    doc="Batch MERGE (upsert): update matched keys, insert unmatched; "
    "verified by per-status counts + integer-cent totals over the "
    "whole merged table.",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse MERGE INTO, expressed as Spark's native upsert
    plan: FULL OUTER join base-to-changes on the key, COALESCE picking
    the change side when present — matched keys update, unmatched
    change rows insert, untouched base rows pass through. The output
    aggregates the ENTIRE merged table (per-status row counts +
    exact integer-cent totals), so the check proves all three classes
    survived, not just the touched rows.

    Scale shape: the join shuffles on the merge key — exactly what
    Delta/Iceberg MERGE does under the hood; with the base table
    bucketed by key (join_bucketed_colocated's layout) the base side's
    exchange disappears and only the (small) change set moves. AQE
    broadcasts the change side outright when it fits. Cents are summed
    as BIGINT (floor(x*100+0.5) — identical rounding on both engines,
    order-free integer addition)."""
    ords = load_table(spark, sf_dir, "orders")
    base = ords.select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = base.where(F.col("o_orderkey") % _UPD_MOD == 0).select(
        "o_orderkey",
        F.lit("U").alias("c_status"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("c_price"),
    )
    ins = base.where(F.col("o_orderkey") % _INS_MOD == 0).select(
        (F.col("o_orderkey") + F.lit(_INS_OFFSET)).alias("o_orderkey"),
        F.lit("N").alias("c_status"),
        F.lit(42.5).alias("c_price"),
    )
    changes = upd.unionByName(ins)
    merged = base.join(changes, "o_orderkey", "full_outer").select(
        F.coalesce("c_status", "o_orderstatus").alias("status"),
        F.coalesce("c_price", "o_totalprice").alias("price"),
    )
    cents = F.floor(F.col("price") * 100 + F.lit(0.5)).cast("long")
    return merged.groupBy(F.col("status").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("total_cents"),
    )


# -- incremental aggregate maintenance (partial-state merge) ------------------

_INC_CUTOFF = "1997-01-01 00:00:00"


@register(
    "incremental_agg_merge",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderpriority
""",
    doc="Incremental aggregate maintenance: base partial state + delta "
    "partial state merged algebraically; must equal the full recompute "
    "(the oracle).",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance without full recompute: the
    historical partition's aggregate state (count + integer-cent sum
    per key) merges with the fresh partition's state by ADDITION —
    count and sum are algebraic, so merged-partials == full recompute,
    and the oracle (a plain GROUP BY over everything) proves it
    hash-exactly.

    This is the batch twin of what Structured Streaming's state store
    does per micro-batch, and the pattern that lets a 100 TB nightly
    rollup touch only the new day's partition: the base state is a
    few rows per key read back from the previous run, the delta scan
    prunes to the new partition (partition filter reaches the scan),
    and the merge is a shuffle over |keys| rows, not |rows|."""
    ords = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )

    base_state = partial(ords.where(F.col("o_orderdate") < cutoff))
    delta_state = partial(ords.where(F.col("o_orderdate") >= cutoff))
    return (
        base_state.unionByName(delta_state)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_cents").alias("total_cents"),
        )
    )


# -- Z-order (Morton) layout key ----------------------------------------------

_ZBUCKET_SHIFT = 16  # coarse z-range id: z >> 16


def _spread16(c):
    """Interleave-ready bit spread: low 16 bits of ``c`` moved to the
    even bit positions of a 32-bit value (classic magic-number dilation,
    4 shift+mask rounds, pure codegen)."""
    x = c.bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def _spread16_sql(e: str) -> str:
    """The same dilation in portable SQL (DuckDB `&`/`|`/`<<`)."""
    x = f"(({e}) & 65535)"
    x = f"(({x} | ({x} << 8)) & 16711935)"
    x = f"(({x} | ({x} << 4)) & 252645135)"
    x = f"(({x} | ({x} << 2)) & 858993459)"
    x = f"(({x} | ({x} << 1)) & 1431655765)"
    return x


_Z_SQL = f"({_spread16_sql('l_partkey')} | ({_spread16_sql('l_suppkey')} << 1))"


@register(
    "zorder_layout_key",
    oracle=f"""
SELECT zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(l_partkey) AS BIGINT) AS min_part,
       CAST(MAX(l_partkey) AS BIGINT) AS max_part,
       CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
       CAST(MAX(l_suppkey) AS BIGINT) AS max_supp,
       CAST(SUM(z) AS BIGINT) AS z_checksum
FROM (
    SELECT l_partkey, l_suppkey, {_Z_SQL} AS z,
           {_Z_SQL} >> {_ZBUCKET_SHIFT} AS zbucket
    FROM lineitem
)
GROUP BY zbucket
""",
    doc="Z-order (Morton) layout key over (l_partkey, l_suppkey): "
    "per-z-range row counts and per-dimension min/max bounds.",
)
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data clustering — the Delta/Iceberg OPTIMIZE
    ZORDER primitive, as a pure-codegen expression: interleave the low
    16 bits of two pruning dimensions into one Morton key, then lay the
    table out sorted by it. The per-bucket min/max columns ARE the
    payoff made visible: every z-range covers a tight rectangle in
    (partkey × suppkey), so parquet min/max stats prune selective
    predicates on EITHER dimension — the property a single-column sort
    cannot give.

    At 100 TB the write path is
    ``df.repartitionByRange(N, z).sortWithinPartitions(z)`` → parquet;
    this query is its planning/verification half (bucket occupancy +
    bounding boxes), one scan + one vocabulary-sized aggregate. The
    dilation is 4 shift-mask rounds per dimension, whole-stage codegen,
    no Python."""
    li = load_table(spark, sf_dir, "lineitem")
    z = _spread16(F.col("l_partkey")).bitwiseOR(
        F.shiftleft(_spread16(F.col("l_suppkey")), 1)
    )
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            z.alias("z"),
            F.shiftright(z, _ZBUCKET_SHIFT).alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").cast("long").alias("min_part"),
            F.max("l_partkey").cast("long").alias("max_part"),
            F.min("l_suppkey").cast("long").alias("min_supp"),
            F.max("l_suppkey").cast("long").alias("max_supp"),
            F.sum("z").cast("long").alias("z_checksum"),
        )
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
WITH w AS (
    SELECT l_returnflag,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS quantity,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS extendedprice,
           SUM(CAST(l_discount AS DECIMAL(12,2))) AS discount,
           SUM(CAST(l_tax AS DECIMAL(12,2))) AS tax
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'quantity' AS metric, quantity AS total FROM w
UNION ALL
SELECT l_returnflag, 'extendedprice', extendedprice FROM w
UNION ALL
SELECT l_returnflag, 'discount', discount FROM w
UNION ALL
SELECT l_returnflag, 'tax', tax FROM w
""",
    doc="Unpivot (wide→long): per-returnflag metric sums melted into "
    "(metric, total) rows — the inverse of pivot_returnflag.",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide→long half of the pivot pair (SQL UNPIVOT / melt): four
    per-flag metric sums become (metric, total) rows, the shape a
    metrics store or a generic charting layer consumes. The aggregate
    runs FIRST, so the unpivot's 4× row expansion touches a 3-row
    aggregate, never the corpus — the cheap order at any scale. Spark's
    ``DataFrame.unpivot`` compiles to an Expand node (same machinery as
    rollup), one pass, no join, no shuffle beyond the aggregate's own."""
    li = _t(spark, sf_dir, "lineitem")
    w = li.groupBy("l_returnflag").agg(
        F.sum(_dec("l_quantity")).alias("quantity"),
        F.sum(_dec("l_extendedprice")).alias("extendedprice"),
        F.sum(_dec("l_discount")).alias("discount"),
        F.sum(_dec("l_tax")).alias("tax"),
    )
    return w.unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount", "tax"],
        "metric",
        "total",
    )
