"""Product-analytics operators over the ``events`` stream: ordered
funnel conversion and cohort retention — the query shapes an event-log
engine exists to serve (reference: the scan/aggregate consumers of
romshark/eventlog's append-only log, eventlog/eventlog.go:1-40).

Both are pure DataFrame aggregates/joins — no UDFs, no windows over the
full stream. Timestamps compare as values only (no float math), so
cross-engine determinism is structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table

FUNNEL_STAGES = ("signup", "view", "purchase")


@register(
    "event_funnel",
    oracle="""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
    WHERE e.event_type = 'view'
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
    WHERE e.event_type = 'purchase'
    GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchased,
       CAST((SELECT SUM(epoch_us(t3) - epoch_us(t1))
             FROM s3 JOIN s1 ON s3.user_id = s1.user_id) AS BIGINT) AS total_latency_us
""",
    doc="Ordered funnel signup → view → purchase: users reaching each "
    "stage in order, plus summed end-to-end latency.",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered (strict-sequence) funnel: a view counts only AFTER the
    user's first signup, a purchase only after that view. Each stage is
    a user-keyed partial aggregate followed by a user-keyed join — the
    stage tables shrink monotonically, and every join key is user_id,
    so at 100 TB all three stages reuse ONE hash partitioning (no
    re-shuffle between stages; AQE coalesces the tail). Latency is
    summed as epoch MICROSECONDS — integer-exact, no float time math."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = s3.join(s1, "user_id").agg(
        F.sum(
            F.unix_micros("t3") - F.unix_micros("t1")
        ).alias("total_latency_us")
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_viewed")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased")))
        .crossJoin(lat)
        .select(
            "n_signup",
            "n_viewed",
            "n_purchased",
            F.col("total_latency_us").cast("long").alias("total_latency_us"),
        )
    )


RETENTION_DAYS = 7


@register(
    "event_retention",
    oracle=f"""
WITH first AS (
    SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN first f ON e.user_id = f.user_id
WHERE datediff('day', f.cohort_day, CAST(e.ts AS DATE)) BETWEEN 0 AND {RETENTION_DAYS}
GROUP BY f.cohort_day, datediff('day', f.cohort_day, CAST(e.ts AS DATE))
""",
    doc=f"Cohort retention: users active on day 0..{RETENTION_DAYS} "
    "after their first event, grouped by first-activity date.",
)
def event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D0..D7 retention triangle. The cohort table (one row per
    user) joins back to the event stream on user_id — at scale it
    BROADCASTS if small or reuses the stream's user_id partitioning
    otherwise; the offset filter prunes the joined stream before the
    count-distinct shuffle. day_offset is calendar-date arithmetic
    (integers), so both engines bucket identically."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    off = F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
    return (
        ev.join(first, "user_id")
        .where(off.between(0, RETENTION_DAYS))
        .groupBy("cohort_day", off.alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# -- event-type transition matrix (first-order Markov) ------------------------


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
),
pairs AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
       CAST(n_transitions AS DOUBLE)
           / SUM(n_transitions) OVER (PARTITION BY prev_type) AS p_next
FROM pairs
""",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: bigram counts and conditional next-event probabilities.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix — the 'what happens after X'
    query a product team runs on an event log. Per-user sequences are
    ordered by (ts, event_id) (event_id breaks timestamp ties
    deterministically), adjacent pairs come from one LAG window, and
    probabilities are integer-count ratios (exact in both engines).

    Scale shape: ONE shuffle of the stream on user_id; the lag window
    rides it. The bigram table is |event_types|² rows, so the
    normalizing window (partition by prev_type) runs on a vocabulary-
    sized intermediate, never the stream."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    n_from = F.sum("n_transitions").over(wp)
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        n_from.cast("long").alias("n_from"),
        (F.col("n_transitions").cast("double") / n_from).alias("p_next"),
    )


# -- value anomalies (z-score outliers) ---------------------------------------

_VAL_FP = 1_000_000  # fixed-point: floor(value * 1e6) — exact, order-free sums
_Z_SIGMA2 = 9  # flag beyond 3 standard deviations


@register(
    "event_value_outliers",
    oracle=f"""
WITH fp AS (
    SELECT event_type, value,
           CAST(FLOOR(value * {_VAL_FP}) AS BIGINT) AS v_fp,
           CAST(FLOOR(value * value * {_VAL_FP}) AS BIGINT) AS v2_fp
    FROM events
),
st AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(v_fp) AS BIGINT) AS sum_fp,
           CAST(SUM(v2_fp) AS BIGINT) AS sumsq_fp
    FROM fp GROUP BY event_type
),
z AS (
    SELECT event_type, n, sum_fp, sumsq_fp,
           CAST(sum_fp AS DOUBLE) / (n * {_VAL_FP}.0) AS mean_value,
           CAST(sumsq_fp AS DOUBLE) / (n * {_VAL_FP}.0)
               - (CAST(sum_fp AS DOUBLE) / (n * {_VAL_FP}.0))
                 * (CAST(sum_fp AS DOUBLE) / (n * {_VAL_FP}.0)) AS var_value
    FROM st
)
SELECT f.event_type, z.n, z.mean_value, z.var_value,
       CAST(SUM(CASE WHEN (f.value - z.mean_value) * (f.value - z.mean_value)
                          > {_Z_SIGMA2} * z.var_value
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM fp f JOIN z ON f.event_type = z.event_type
GROUP BY f.event_type, z.n, z.mean_value, z.var_value
""",
    doc="Per-type z-score anomaly counts: mean/variance from exact "
    "fixed-point sums, outliers beyond 3σ.",
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric anomaly detection over the event stream. The statistical
    moments come from FIXED-POINT integer sums (floor(v·1e6),
    floor(v²·1e6)) — exact and order-free where a distributed float
    sum would depend on partition order; mean and variance are then
    derived as doubles from identical integers on both engines, and
    the 3σ test squares the residual instead of calling sqrt.

    Scale shape: the stats table is |event_types| rows (one partial-agg
    pass, map-side combined) and BROADCASTS back onto the stream; the
    outlier count is the stream's single shuffle (the final per-type
    rollup). Two scans of events — at 100 TB cache the fp projection
    or fuse with the ingest pass."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    fp = ev.select(
        "event_type",
        "value",
        F.floor(F.col("value") * _VAL_FP).cast("long").alias("v_fp"),
        F.floor(F.col("value") * F.col("value") * _VAL_FP).cast("long").alias("v2_fp"),
    )
    st = fp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_fp").alias("sum_fp"),
        F.sum("v2_fp").alias("sumsq_fp"),
    )
    mean = F.col("sum_fp").cast("double") / (F.col("n") * float(_VAL_FP))
    var = F.col("sumsq_fp").cast("double") / (F.col("n") * float(_VAL_FP)) - mean * mean
    z = st.select("event_type", "n", mean.alias("mean_value"), var.alias("var_value"))
    resid = F.col("value") - F.col("mean_value")
    return (
        fp.join(F.broadcast(z), "event_type")
        .groupBy("event_type", "n", "mean_value", "var_value")
        .agg(
            F.sum(
                F.when(resid * resid > _Z_SIGMA2 * F.col("var_value"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
    )


# -- daily EWMA smoothing (α = 1/2: exact dyadic weights) ---------------------

_EWMA_TERMS = 8
# 0.5, 0.25, ... 2^-8 — every weight is an exact power of two, so the
# weighted sum is the same double on any IEEE engine (no pow() calls).
_EWMA_W = [0.5 ** (k + 1) for k in range(_EWMA_TERMS)]


def _ewma_sql() -> str:
    terms = ["0.5 * x"] + [
        f"{_EWMA_W[k]!r} * COALESCE(LAG(x, {k}) OVER w, 0.0)"
        for k in range(1, _EWMA_TERMS)
    ]
    return " + ".join(terms)


@register(
    "event_daily_ewma",
    oracle=f"""
WITH daily AS (
    SELECT event_type,
           DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_fp
    FROM events GROUP BY 1, 2
),
x AS (SELECT event_type, day_idx, CAST(sum_fp AS DOUBLE) / 1000000 AS x FROM daily)
SELECT event_type, day_idx, x AS daily_value,
       {_ewma_sql()} AS ewma
FROM x
WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
""",
    doc="Per-type daily value totals smoothed by an 8-term EWMA with "
    "dyadic weights (α = 1/2).",
)
def event_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series smoothing over the event stream — the dashboard /
    alerting shape (is today's total anomalous vs the trailing trend?).
    Daily totals come from exact fixed-point integer sums; the EWMA is
    the 8-term truncation of s_t = αx_t + (1-α)s_{t-1} with α = 1/2,
    chosen because every weight 2^-k is EXACTLY representable — the
    weighted sum adds identical doubles in identical left-assoc order
    on both engines, no pow(), no drift.

    Scale shape: one shuffle aggregates the stream to |types|×|days|
    rows; the lag window runs on that vocabulary-sized table, riding
    the same partitioning (partition by event_type)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "day_idx"
            ),
            F.floor(F.col("value") * 1_000_000).cast("long").alias("v_fp"),
        )
        .groupBy("event_type", "day_idx")
        .agg(F.sum("v_fp").alias("sum_fp"))
        .select(
            "event_type",
            "day_idx",
            (F.col("sum_fp").cast("double") / 1_000_000).alias("x"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day_idx")
    ewma = F.lit(0.5) * F.col("x")
    for k in range(1, _EWMA_TERMS):
        ewma = ewma + F.lit(_EWMA_W[k]) * F.coalesce(
            F.lag("x", k).over(w), F.lit(0.0)
        )
    return daily.select(
        "event_type", "day_idx", F.col("x").alias("daily_value"), ewma.alias("ewma")
    )


# -- event-type co-occurrence lift --------------------------------------------


@register(
    "event_type_lift",
    oracle="""
WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
c AS (SELECT event_type, COUNT(*) AS n_type FROM u GROUP BY event_type),
p AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
    FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_both,
       CAST(ca.n_type AS BIGINT) AS n_a,
       CAST(cb.n_type AS BIGINT) AS n_b,
       CAST(n.n_users AS BIGINT) * p.n_both
           / (CAST(ca.n_type AS DOUBLE) * cb.n_type) AS lift
FROM p
JOIN c ca ON ca.event_type = p.type_a
JOIN c cb ON cb.event_type = p.type_b
CROSS JOIN n
""",
    doc="Pairwise event-type lift: P(a∧b) / (P(a)·P(b)) over distinct "
    "users — association strength between behaviors.",
)
def event_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over the event log: which behaviors
    co-occur beyond chance (lift > 1)? Probabilities are ratios of
    integer user counts — transcendental-free (lift is the monotone
    core of PMI without the log), so both engines emit bit-identical
    doubles.

    Scale shape: the distinct (user, type) projection shrinks the
    stream to ≤|users|·|types| rows in one partial-agged shuffle; the
    pair join stays keyed on user_id (same partitioning), and its
    output collapses to |types|² rows. The per-type and total counts
    are broadcast-sized."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct()
    n = ev.agg(F.count_distinct("user_id").alias("n_users"))
    c = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    a = u.select("user_id", F.col("event_type").alias("type_a"))
    b = u.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("type_b"))
    p = (
        a.join(b, (a.user_id == b.uid_b) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = c.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a"))
    cb = c.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b"))
    return (
        p.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_users").cast("long") * F.col("n_both")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )
