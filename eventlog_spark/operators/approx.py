"""Approximate / sampled analytics with bit-exact cross-engine oracles.

Sketch-based aggregation is what makes interactive analytics possible at
100 TB: a KMV or HyperLogLog pass answers COUNT(DISTINCT) in one
map-side-combinable aggregate over fixed-size state, where the exact
answer needs a full shuffle of every distinct key. The reference has no
sketches (its queries are key-addressed scans); these are part of the
relational surface this engine adds (SURVEY §2.2 aggregation).

The novelty here is that the sketches are *deterministic and
cross-engine exact*: instead of engine-private hash functions
(Spark's HLL++ vs DuckDB's approx_count_distinct would never agree),
every hash is the md5-derived 60-bit integer from dedup.py, the
estimator state is kept in exact integer arithmetic (order-independent),
and the final float expressions have identical shapes in both engines.
So the DuckDB oracle reproduces the Spark estimate bit-for-bit — the
approximation itself is hash-verified, not just sanity-checked.

* sample_hash_stats   — deterministic hash-sampling (TABLESAMPLE analog
                        that is reproducible across engines and runs).
* approx_distinct_kmv — k-minimum-values distinct-count estimator
                        (order statistics of the hash space).
* approx_distinct_hll — HyperLogLog with integer-exact register state
                        (max-rank per bucket, powers of two summed as
                        longs, one shared float constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table
from .dedup import md5_int_col, md5_int_sql

# -- shared constants ---------------------------------------------------------

KMV_K = 256
HASH_SPACE = float(1 << 60)  # md5_int is uniform on [0, 2^60)

HLL_M = 512  # 2^9 buckets
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^52 folded into ONE double literal so both engines
# evaluate a single constant-over-sum division (no ordering ambiguity).
HLL_EST_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 52)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "sample_hash_stats",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_sampled,
       SUM(CAST(value AS DECIMAL(12,2))) AS sum_value
FROM events
WHERE {md5_int_sql("CAST(event_id AS VARCHAR)")} % 20 = 0
GROUP BY event_type
""",
    doc="Deterministic 5% hash-sample of events + per-type aggregate (reproducible TABLESAMPLE).",
)
def sample_hash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE BERNOULLI is non-deterministic and varies by engine;
    hash-sampling on a key (md5(event_id) mod 20 = 0 → 5%) gives the
    same sample everywhere, is stable under re-runs and appends, and
    composes with pushdown: the predicate evaluates in the scan stage,
    so only the sample is ever shuffled. The same technique scales a
    100 TB exploratory query down to any fraction without a prior
    pass."""
    ev = _t(spark, sf_dir, "events")
    keep = md5_int_col(F.col("event_id").cast("string")) % 20 == 0
    return (
        ev.where(keep)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
        )
    )


@register(
    "approx_distinct_kmv",
    oracle=f"""
WITH h AS (
    SELECT DISTINCT {md5_int_sql("CAST(l_orderkey AS VARCHAR)")} AS h FROM lineitem
),
kmin AS (SELECT h FROM h ORDER BY h LIMIT {KMV_K}),
s AS (SELECT MAX(h) AS kth_hash, COUNT(*) AS k FROM kmin),
ex AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
SELECT k, kth_hash,
       (CAST(k AS DOUBLE) - 1.0) * {HASH_SPACE!r} / CAST(kth_hash AS DOUBLE) AS est_distinct,
       exact_distinct,
       ((CAST(k AS DOUBLE) - 1.0) * {HASH_SPACE!r} / CAST(kth_hash AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) - 1.0 AS rel_err
FROM s, ex
""",
    doc="K-minimum-values distinct estimator (k=256) for COUNT(DISTINCT l_orderkey), with exact-count comparison.",
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV: hash every key onto [0, 2^60); if n distinct values fall
    uniformly, the k-th smallest hash sits near k/n of the space, so
    n ≈ (k-1) * 2^60 / kth_hash. The k smallest hashes come back via
    TakeOrdered (per-partition top-k, then a k-row merge on one
    reducer) — state is O(k) regardless of input size, which is the
    whole point at 100 TB. The estimate and the exact count (computed
    alongside for the error column) are joined as two 1-row broadcasts.
    Hash-exact vs the oracle because kth_hash is an integer order
    statistic and the float estimator has one shape on both sides."""
    li = _t(spark, sf_dir, "lineitem")
    hs = li.select(md5_int_col(F.col("l_orderkey").cast("string")).alias("h")).distinct()
    s = (
        hs.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth_hash"), F.count(F.lit(1)).alias("k"))
    )
    ex = li.agg(F.count_distinct("l_orderkey").alias("exact_distinct"))
    est = (F.col("k").cast("double") - F.lit(1.0)) * F.lit(HASH_SPACE) / F.col(
        "kth_hash"
    ).cast("double")
    return (
        s.crossJoin(F.broadcast(ex))
        .select(
            "k",
            "kth_hash",
            est.alias("est_distinct"),
            "exact_distinct",
            (est / F.col("exact_distinct").cast("double") - F.lit(1.0)).alias("rel_err"),
        )
    )


@register(
    "approx_distinct_hll",
    oracle=f"""
WITH h AS (
    SELECT DISTINCT {md5_int_sql("CAST(l_orderkey AS VARCHAR)")} AS h FROM lineitem
),
ranks AS (
    SELECT h % {HLL_M} AS bucket,
           CASE WHEN h // {HLL_M} = 0 THEN 52
                ELSE 52 - length(bin(h // {HLL_M})) END AS rank
    FROM h
),
regs AS (SELECT bucket, MAX(rank) AS max_rank FROM ranks GROUP BY bucket),
buckets AS (SELECT t.range AS bucket FROM range({HLL_M}) t),
weights AS (
    SELECT b.bucket,
           CAST(pow(2.0, 52 - COALESCE(r.max_rank, 0)) AS BIGINT) AS weight
    FROM buckets b LEFT JOIN regs r ON b.bucket = r.bucket
),
s AS (SELECT CAST(SUM(weight) AS BIGINT) AS sum_weights, COUNT(*) AS n_buckets FROM weights),
ex AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
SELECT n_buckets, sum_weights,
       {HLL_EST_NUM!r} / CAST(sum_weights AS DOUBLE) AS est_distinct,
       exact_distinct,
       ({HLL_EST_NUM!r} / CAST(sum_weights AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) - 1.0 AS rel_err
FROM s, ex
""",
    doc="HyperLogLog (m=512) distinct estimator with integer-exact registers, vs the exact count.",
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog with every engine-divergence squeezed out: bucket =
    low 9 hash bits, rank = leading-zero count of the remaining 51 bits
    + 1 (computed exactly as 52 - length(bin(suffix)) — no float log),
    registers combine with MAX (order-free), and the harmonic-mean
    denominator Σ 2^-rank is scaled by 2^52 into a LONG sum (≤ 2^61,
    exact, order-free). The only float op is one constant/sum division.

    As a Spark plan this is the textbook sketch shape: the ranks agg is
    map-side combinable to ≤ m rows per task, the 512-bucket join is a
    broadcast, and the final state is O(m) no matter the input — the
    100 TB COUNT DISTINCT without the 100 TB shuffle. (The standard
    small-range linear-counting correction is omitted: it needs ln(),
    whose libm rounding differs across engines; at this cardinality the
    raw estimator is in range anyway.)"""
    li = _t(spark, sf_dir, "lineitem")
    hs = li.select(md5_int_col(F.col("l_orderkey").cast("string")).alias("h")).distinct()
    suffix = F.shiftright(F.col("h"), 9)  # h // 512 in exact integer arithmetic
    rank = F.when(suffix == 0, F.lit(52)).otherwise(
        F.lit(52) - F.length(F.bin(suffix))
    )
    regs = (
        hs.select((F.col("h") % HLL_M).alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    buckets = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    weights = buckets.join(F.broadcast(regs), "bucket", "left").select(
        F.pow(F.lit(2.0), F.lit(52) - F.coalesce(F.col("max_rank"), F.lit(0)))
        .cast("long")
        .alias("weight")
    )
    s = weights.agg(
        F.sum("weight").alias("sum_weights"), F.count(F.lit(1)).alias("n_buckets")
    )
    ex = li.agg(F.count_distinct("l_orderkey").alias("exact_distinct"))
    est = F.lit(HLL_EST_NUM) / F.col("sum_weights").cast("double")
    return (
        s.crossJoin(F.broadcast(ex))
        .select(
            "n_buckets",
            "sum_weights",
            est.alias("est_distinct"),
            "exact_distinct",
            (est / F.col("exact_distinct").cast("double") - F.lit(1.0)).alias("rel_err"),
        )
    )


# per-language keep rates (percent) for the stratified sample
STRATA_PCT = {"en": 25, "de": 50, "fr": 75, "es": 60, "zh": 40}


@register(
    "sample_stratified",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM (
    SELECT lang, n_chars,
           {md5_int_sql("CAST(doc_id AS VARCHAR)")} % 100 <
           CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 50 WHEN 'fr' THEN 75
                     WHEN 'es' THEN 60 WHEN 'zh' THEN 40 ELSE 100 END AS kept
    FROM documents
)
GROUP BY lang
""",
    doc="Stratified deterministic sampling: per-language keep rates via "
    "md5-hash thresholding; per-stratum kept counts + char mass.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixing for a training corpus: each stratum keeps
    a target fraction, selected by hashing the stable doc_id (not RNG) —
    the sample is reproducible across engines, runs, and cluster
    layouts, and composes with incremental ingestion (a re-crawled doc
    keeps its fate). One narrow projection + one partial+final agg; the
    kept-chars sum proves both engines selected the SAME rows, not just
    the same counts."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(100)
    for lang, pct in STRATA_PCT.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    kept = (md5_int_col(F.col("doc_id").cast("string")) % 100) < rate
    return (
        docs.select("lang", "n_chars", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
        )
    )


HIST_WIDTH = 64  # chars per histogram bucket
HIST_MAX_BUCKET = 9


@register(
    "corpus_length_histogram",
    oracle=f"""
SELECT LEAST({HIST_MAX_BUCKET}, n_chars // {HIST_WIDTH}) AS bucket,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
""",
    doc="Corpus length histogram: fixed-width doc-length buckets with "
    "per-bucket doc/source counts and char mass.",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The length-distribution report a curation run starts from (what
    to truncate, what to drop, token budget per bucket). Bucket id is
    integer arithmetic (floor-div, capped) so both engines bin
    identically; the whole query is one partial+final aggregate keyed
    by ≤ 10 buckets — the shuffle carries ~10 rows per task at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.lit(HIST_MAX_BUCKET), F.floor(F.col("n_chars") / HIST_WIDTH)
    ).cast("long")
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# -- count-min sketch ---------------------------------------------------------

CMS_D = 4     # independent hash rows
CMS_W = 256   # counters per row
CMS_PROBES = ("table", "spark", "row", "filter", "zzz_absent")
_CMS_PROBE_SQL = "('" + "','".join(CMS_PROBES) + "')"


@register(
    "sketch_count_min",
    oracle=f"""
WITH w AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
cells AS (
    SELECT d, {md5_int_sql("CAST(d AS VARCHAR) || ':' || word")} % {CMS_W} AS col,
           COUNT(*) AS cnt
    FROM w CROSS JOIN ds
    GROUP BY 1, 2
),
probes AS (SELECT unnest({list(CMS_PROBES)!r}) AS word),
truth AS (
    SELECT p.word, COALESCE(t.cnt, 0) AS true_cnt
    FROM probes p LEFT JOIN (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word) t
      ON p.word = t.word
),
est AS (
    SELECT p.word, MIN(COALESCE(c.cnt, 0)) AS cms_est
    FROM probes p CROSS JOIN ds
    LEFT JOIN cells c
      ON c.d = ds.d
     AND c.col = {md5_int_sql("CAST(ds.d AS VARCHAR) || ':' || p.word")} % {CMS_W}
    GROUP BY p.word
)
SELECT truth.word, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(cms_est AS BIGINT) AS cms_est
FROM truth JOIN est ON truth.word = est.word
""",
    doc=f"Count-Min sketch ({CMS_D}×{CMS_W}) word-frequency estimates "
    "vs true counts for fixed probe words.",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min [Cormode/Muthukrishnan'05]: frequency estimation in
    D×W integer counters — fixed-size, merge-by-addition state, so the
    sketch builds as ONE map-side-combinable aggregate regardless of
    corpus size, and the finished sketch (4 KB here) broadcasts to any
    consumer. Estimates upper-bound true counts (min over D rows).
    Counters are exact integer sums of md5-derived bucket assignments —
    order-free, so both engines build the identical sketch; the oracle
    verifies the ESTIMATES, not just plumbing. In production the heavy
    hitters found here feed the stop-shingle caps in the dedup family."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    # collapse token occurrences to (word, count) FIRST: the md5 bucket
    # assignment then runs once per vocabulary word (tens of thousands),
    # not once per token occurrence (millions) — the word shuffle it costs
    # is map-side-combined, so at 100 TB this trades a tiny shuffle for
    # a ~100× cut in hash work. Counter values are identical (sum of
    # per-word counts == count of occurrences).
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("wcnt"))
    ds = spark.range(CMS_D).select(F.col("id").cast("int").alias("d"))
    hash_col = (
        md5_int_col(F.concat(F.col("d").cast("string"), F.lit(":"), F.col("word")))
        % CMS_W
    )
    cells = (
        wc.crossJoin(F.broadcast(ds))
        .select("d", hash_col.alias("col"), "wcnt")
        .groupBy("d", "col")
        .agg(F.sum("wcnt").alias("cnt"))
    )
    probes = spark.createDataFrame([(p,) for p in CMS_PROBES], "word string")
    truth = probes.join(wc, "word", "left").select(
        "word", F.coalesce("wcnt", F.lit(0)).alias("true_cnt")
    )
    probe_cells = probes.crossJoin(F.broadcast(ds)).select(
        "word", "d", hash_col.alias("col")
    )
    est = (
        probe_cells.join(cells, ["d", "col"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
    return truth.join(est, "word").select(
        "word",
        F.col("true_cnt").cast("long").alias("true_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
    )


# -- bloom filter -------------------------------------------------------------

BLOOM_K = 4      # hash functions
BLOOM_M = 4096   # bits
BLOOM_PROBES = ("table", "spark", "row", "zzzz", "qqqq", "filter")


@register(
    "sketch_bloom_filter",
    oracle=f"""
WITH vocab AS (
    SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents
),
ks AS (SELECT unnest([0, 1, 2, 3]) AS k),
bits AS (
    SELECT DISTINCT {md5_int_sql("CAST(k AS VARCHAR) || ':' || word")} % {BLOOM_M} AS pos
    FROM vocab CROSS JOIN ks
),
stats AS (SELECT COUNT(*) AS n_bits_set FROM bits),
probes AS (SELECT unnest({list(BLOOM_PROBES)!r}) AS word),
checks AS (
    SELECT p.word,
           CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_hit
    FROM probes p CROSS JOIN ks
    LEFT JOIN bits b ON b.pos = {md5_int_sql("CAST(ks.k AS VARCHAR) || ':' || p.word")} % {BLOOM_M}
    GROUP BY p.word
)
SELECT c.word,
       CAST(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_corpus,
       CAST(CASE WHEN c.k_hit = {BLOOM_K} THEN 1 ELSE 0 END AS BIGINT) AS bloom_positive,
       CAST(s.n_bits_set AS BIGINT) AS n_bits_set
FROM checks c
LEFT JOIN vocab v ON v.word = c.word
CROSS JOIN stats s
""",
    doc=f"Bloom filter ({BLOOM_K} hashes, {BLOOM_M} bits) over the "
    "corpus vocabulary; membership verdicts for fixed probes.",
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership over the vocabulary: the set-bit table is a
    DISTINCT over md5-derived positions — order-free, fixed ≤ M rows of
    state, built in one aggregate pass and broadcastable (512 B of
    bitmap here). A probe is positive iff all K positions are set: no
    false negatives, false positives at the classic (1-exp(-kn/m))^k
    rate — the 'zzzz'/'qqqq' probes document the honest verdict. At
    100 TB this is the cheap pre-filter in front of an expensive
    anti-join (e.g. URL-seen checks in a crawler)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(F.explode(F.split("text", " ")).alias("word")).distinct()
    ks = spark.range(BLOOM_K).select(F.col("id").cast("int").alias("k"))
    pos_col = (
        md5_int_col(F.concat(F.col("k").cast("string"), F.lit(":"), F.col("word")))
        % BLOOM_M
    )
    bits = (
        vocab.crossJoin(F.broadcast(ks)).select(pos_col.alias("pos")).distinct()
    )
    stats = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    probes = spark.createDataFrame([(p,) for p in BLOOM_PROBES], "word string")
    probe_pos = probes.crossJoin(F.broadcast(ks)).select("word", pos_col.alias("pos"))
    checks = (
        probe_pos.join(bits.withColumn("hit", F.lit(1)), "pos", "left")
        .groupBy("word")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("k_hit"))
    )
    return (
        checks.join(vocab.withColumn("present", F.lit(1)), "word", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "word",
            F.coalesce("present", F.lit(0)).cast("long").alias("in_corpus"),
            F.when(F.col("k_hit") == BLOOM_K, 1).otherwise(0).cast("long").alias(
                "bloom_positive"
            ),
            F.col("n_bits_set").cast("long").alias("n_bits_set"),
        )
    )
