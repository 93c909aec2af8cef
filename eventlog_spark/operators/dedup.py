"""Deduplication operators over the ``documents`` table — the core of a
training-data pipeline at 100 TB.

Five families, each a registered query with a DuckDB oracle wherever the
semantics are SQL-expressible:

* exact        — hash-groupBy on the full text (md5); one shuffle on the
                 16-byte digest, never on the document body.
* n-gram Jaccard — word-3-gram shingles, exact pairwise similarity via a
                 shingle-inverted-index join (never an O(n²) cross join).
* MinHash+LSH  — 8 permutation-min signatures, 4 bands × 2 rows,
                 band-bucket self-join for candidate pairs. The scale
                 path: cost ∝ colliding candidates, not pairs.
* SimHash      — 32-bit sign-of-weighted-sum fingerprint per document.
* embedding cosine — near-dup pairs by cosine over the 64-d embeddings.

Cross-engine determinism: every hash is derived from ``md5`` (available
and bit-identical in both Spark and DuckDB) — the first 15 hex chars
parsed as a 60-bit integer, then mixed with integer-only arithmetic
((a·x + b) mod p, p = 2^31-1, products bounded < 2^62). No engine-
specific hash function appears anywhere, so the oracle can reproduce
every signature exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table, spread

_HEX = "0123456789abcdef"
P31 = 2_147_483_647  # 2^31 - 1, Mersenne prime
# fixed odd mixing constants (a_j, b_j) for the 8 minhash permutations
MINHASH_AB = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (69_069, 362_437),
    (1_566_083_941, 1_732_584_193),
    (747_796_405, 2_891_336_453 % P31),
]
N_BANDS = 4  # 4 bands × 2 rows = 8 signature slots
SIMHASH_BITS = 32
JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.4


# -- md5 → 60-bit integer, identical in both engines -------------------------


def md5_int_col(c: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative 60-bit long (Spark)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    """Same value in portable SQL: positional hex-digit expansion
    (DuckDB has no hex→int cast; strpos arithmetic is exact)."""
    terms = [
        f"(strpos('{_HEX}', substr(md5({expr}), {k}, 1)) - 1) * {16 ** (15 - k)}"
        for k in range(1, 16)
    ]
    return "(" + " + ".join(terms) + ")"


# -- shared shingle pipeline --------------------------------------------------


def _words(df: DataFrame) -> DataFrame:
    return df.withColumn("w", F.split("text", " "))


def shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → distinct word n-gram shingles, hashed to 60-bit ints
    *before* the distinct so every downstream shuffle (distinct, index
    join, signature groupBy) carries an 8-byte key instead of the
    shingle text — at 100 TB that is the difference between shuffling
    terabytes of n-gram strings and shuffling longs. transform+slice
    stays in whole-stage codegen; explode fans out JVM-side. Hash
    collisions (≈ n²/2⁶¹) merge two shingles identically in Spark and
    the DuckDB oracle, so comparisons stay exact."""
    arr = F.transform(
        F.sequence(F.lit(1), F.size("w") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice("w", i, n)),
    )
    return (
        _words(df)
        .where(F.size("w") >= n)
        .select("doc_id", F.explode(arr).alias("sh"))
        .select("doc_id", md5_int_col(F.col("sh")).alias("shh"))
        .distinct()
    )


def shingles_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, shh) corpus shingle table as a session-shared
    artifact. Five near-dup operators start from this identical
    projection (ngram-Jaccard's inverted index, the MinHash signature
    feeding LSH pairs / connected components / LSH-verify, and the
    verify stage's shingle sets); before sharing, each re-ran the
    tokenize→shingle→hash→distinct pipeline over the full documents
    table (~100 s of the sf1 suite, round-5 verdict item 3). At 100 TB
    this is a persisted intermediate table written once per corpus
    snapshot; the session-scoped localCheckpoint is the single-session
    stand-in, exactly like the ANN artifacts."""
    from .artifacts import shared

    return shared(
        spark,
        sf_dir,
        "doc_shingles",
        lambda: shingles(spread(load_table(spark, sf_dir, "documents"))),
    )


_SHINGLES_SQL = f"""
SELECT DISTINCT doc_id, {md5_int_sql('sh')} AS shh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                  i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 3
)
"""


# -- exact dedup ---------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
WITH corpus AS (
    SELECT doc_id, text, 1 AS copy_no FROM documents
    UNION ALL
    SELECT doc_id, text, 2 AS copy_no FROM documents
)
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM corpus
GROUP BY md5(text)
HAVING COUNT(*) > 1
""",
    doc="Exact dedup: hash-groupBy on content digest (double-crawl corpus).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle key is the 16-byte digest, not the document body —
    at 100 TB the exchange moves hashes + ids only. The doubled corpus
    simulates a re-crawl so the operator has real duplicates to collapse
    (the synthetic table itself has none)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.withColumn("copy_no", F.lit(1)).unionByName(
        docs.withColumn("copy_no", F.lit(2))
    )
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


# -- n-gram Jaccard -------------------------------------------------------------


# Stop-shingle cap for the inverted-index join: a shingle present in
# more than this many documents is dropped from BOTH the index and the
# per-doc sizes before pairing (the CCNet/suffix-array-literature move).
# One pathological shingle in d documents otherwise contributes d²/2
# candidate pairs — the one way this join goes quadratic at web scale.
# The cap is far above any df in the test corpora (max df 25 at sf3),
# so results are unchanged there; the ORACLE applies the identical
# filter, so the comparison stays exact even where it binds.
NGRAM_MAX_DF = 10_000


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh0 AS ({_SHINGLES_SQL}),
hot AS (SELECT shh FROM sh0 GROUP BY shh HAVING COUNT(*) > {NGRAM_MAX_DF}),
sh AS (SELECT * FROM sh0 WHERE shh NOT IN (SELECT shh FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.shh = b.shh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
""",
    doc="Near-dup pairs by exact 3-gram Jaccard via inverted-index join "
    f"with a stop-shingle cap (df > {NGRAM_MAX_DF} dropped).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index formulation: only documents sharing a shingle ever
    meet, so cost tracks true overlap instead of n² — PROVIDED no single
    shingle is shared by a quadratic-sized document set. The stop-
    shingle filter enforces that: dfs are one map-side-combined count
    over the shared shingle artifact, the > NGRAM_MAX_DF survivors
    (tiny by construction — at most |shingles|/NGRAM_MAX_DF of them)
    broadcast into a left-anti join, and the pair join runs on the
    capped index. Candidate volume is then ≤ Σ min(df, cap)·df — the
    same guarantee CCNet's stop-words and Lee et al.'s suffix-array
    filters buy. Non-binding at the test corpora (max df 25 at sf3),
    so values are unchanged there; the oracle replays the filter."""
    sh_all = shingles_shared(spark, sf_dir)
    hot = (
        sh_all.groupBy("shh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > NGRAM_MAX_DF)
        .select("shh")
    )
    sh = sh_all.join(F.broadcast(hot), "shh", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shh") == F.col("b.shh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# -- MinHash + LSH ---------------------------------------------------------------


def _minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles_shared(spark, sf_dir)
    x = F.col("shh") % P31
    aggs = [
        F.min((F.lit(a) * x + F.lit(b)) % P31).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_signature_sql() -> str:
    x = f"(shh % {P31})"
    cols = ", ".join(
        f"MIN(({a} * {x} + {b}) % {P31}) AS mh{j}" for j, (a, b) in enumerate(MINHASH_AB)
    )
    return f"WITH sh AS ({_SHINGLES_SQL}) SELECT doc_id, {cols} FROM sh GROUP BY doc_id"


# Hot-bucket cull (found by the sf1z Zipf rehearsal, tools/skew_probe.py):
# a bucket of m co-hashing docs emits m(m-1)/2 candidate pairs — 25% of
# a corpus sharing one boilerplate prefix measured a 510× pair explosion
# (7.7k → 3.9M pairs at 50k docs). Buckets larger than this cap switch
# to a STAR pattern: every member pairs with the bucket's min-doc_id
# representative only — m-1 pairs, and dedup_connected_components still
# groups the whole bucket (all members reach each other through the
# rep), so cluster-level dedup semantics are unchanged. Non-binding on
# uniform corpora; the oracle replays the same rule.
LSH_MAX_BUCKET = int(os.environ.get("SPARK_GRAFT_LSH_MAX_BUCKET", 256))

_LSH_PAIRS_SQL = f"""
WITH sig AS ({_minhash_signature_sql()}),
keys AS (
    {" UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, mh{2 * band} AS k1, mh{2 * band + 1} AS k2 FROM sig"
        for band in range(N_BANDS)
    )}
),
keyed AS (
    SELECT doc_id, band, k1, k2,
           COUNT(*) OVER (PARTITION BY band, k1, k2) AS bn,
           MIN(doc_id) OVER (PARTITION BY band, k1, k2) AS rep
    FROM keys
)
SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM (SELECT * FROM keyed WHERE bn <= {LSH_MAX_BUCKET}) a
    JOIN (SELECT * FROM keyed WHERE bn <= {LSH_MAX_BUCKET}) b
    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
       AND a.doc_id < b.doc_id
    UNION ALL
    SELECT rep AS doc_a, doc_id AS doc_b
    FROM keyed WHERE bn > {LSH_MAX_BUCKET} AND doc_id <> rep
)
"""


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b) candidate pairs with doc_a < doc_b — the LSH body,
    shared by dedup_minhash_lsh and dedup_connected_components.

    The scale path for near-dup: signatures are one groupBy over
    shingles; candidate generation is ONE equi-join on (band, band-key)
    after melting the signature into 4 band rows per doc — not a join
    per band. Both join sides then share an identical exchange, which
    Spark's ReuseExchange computes once; a per-band join loop would
    re-run the whole shingle+signature pipeline for every band. The
    band key is an equi-join key (hash join, AQE-skew-splittable) — no
    similarity is ever computed for non-colliding pairs. Verify
    candidates with dedup_ngram_jaccard semantics downstream if
    exactness is needed.

    Session-shared artifact: THREE queries consume this exact pair set
    (dedup_minhash_lsh, dedup_connected_components, dedup_lsh_verified)
    — one materialization serves all of them."""
    from .artifacts import shared

    return shared(
        spark,
        sf_dir,
        "doc_lsh_pairs",  # NOT "lsh_pairs" — that names the ANN embedding-LSH artifact (similarity.py)
        lambda: _lsh_candidate_pairs_build(spark, sf_dir),
    )


def _lsh_candidate_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _minhash_signature(spark, sf_dir)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.col(f"mh{2 * band}").alias("k1"),
                F.col(f"mh{2 * band + 1}").alias("k2"),
            )
            for band in range(N_BANDS)
        ]
    )
    keys = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band", "bk.k1", "bk.k2"
    )
    # hot-bucket star cull (see LSH_MAX_BUCKET): bucket occupancy rides
    # the SAME band-key shuffle the join needs — one window pass, no
    # extra exchange; oversized buckets emit member→representative
    # edges (linear) instead of all-pairs (quadratic)
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "k1", "k2")
    keyed = keys.withColumn("bn", F.count(F.lit(1)).over(w)).withColumn(
        "rep", F.min("doc_id").over(w)
    )
    small = keyed.where(F.col("bn") <= LSH_MAX_BUCKET)
    a = small.alias("a")
    b = small.alias("b")
    all_pairs = (
        a.join(b, ["band", "k1", "k2"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    star_pairs = keyed.where(
        (F.col("bn") > LSH_MAX_BUCKET) & (F.col("doc_id") != F.col("rep"))
    ).select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    return all_pairs.unionByName(star_pairs).distinct()


@register(
    "dedup_minhash_lsh",
    oracle=_LSH_PAIRS_SQL,
    doc="MinHash(8) + LSH(4 bands × 2 rows) candidate pairs.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See lsh_candidate_pairs for the plan rationale."""
    return lsh_candidate_pairs(spark, sf_dir)


# -- duplicate clustering: connected components ---------------------------------


@register(
    "dedup_connected_components",
    oracle=f"""
WITH RECURSIVE
pairs AS ({_LSH_PAIRS_SQL}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(lab) AS component_id FROM reach GROUP BY node
""",
    doc="Duplicate clustering: connected components over LSH candidate pairs (iterative min-label propagation).",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair lists aren't enough to deduplicate a corpus — near-dup is
    not transitive, so A~B and B~C must land in ONE keep-group. This
    clusters the LSH candidate graph into components by iterative
    min-label propagation (the standard large-graph method: Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14):
    every vertex starts labeled with its own id; each round every
    vertex takes the min of its own and its neighbors' labels; fixpoint
    after diameter rounds. component_id = min doc_id of the cluster —
    exactly what a keep-one-per-cluster dedup policy needs.

    Each round is one join (edges ⋈ labels on vertex) + one groupBy
    min — both shuffle on doc_id, so AQE reuses the exchange layout;
    state per round is O(V+E), never materializing pairs².
    localCheckpoint truncates the growing lineage (on a cluster, use
    checkpoint() to HDFS for executor-loss tolerance). Convergence is
    detected with an exact decimal label-sum fingerprint (labels only
    ever decrease, so an unchanged sum ⟺ fixpoint) — one scalar per
    round instead of a changed-row join. Dup clusters have tiny
    diameter, so rounds ≈ 3; the hard cap is a safety net.

    The oracle reaches the same fixpoint as a recursive CTE (min over
    all reachable labels in the undirected graph)."""
    return doc_components_shared(spark, sf_dir)


def doc_components_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component_id) over the LSH candidate graph, session-
    shared: the min-label-propagation iterations run once per dataset
    and serve every consumer (dedup_connected_components,
    dedup_keep_best) — the same train-once/serve-many split as the ANN
    artifacts, one tier up the dedup pipeline."""
    from .artifacts import shared

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        return connected_components(docs, lsh_candidate_pairs(spark, sf_dir))

    return shared(spark, sf_dir, "doc_components", build)


def connected_components(
    vertices: DataFrame, pairs: DataFrame, max_rounds: int = 15
) -> DataFrame:
    """Min-label propagation over an undirected graph.

    vertices: one column ``doc_id``; pairs: ``doc_a``, ``doc_b``.
    Returns (doc_id, component_id) with component_id = min doc_id of the
    component. See dedup_connected_components for the scale rationale.
    """
    # ROUND-12 OPTIMIZATION (guide §1.2): symmetrize with explode, not a
    # union of two selects — the union's branches each embed their own
    # static copy of the `pairs` subtree, so the checkpoint
    # materialization paid the full candidate pipeline twice (for
    # pipeline_curate that includes both survivor semi-joins). One
    # computation, two generated rows per pair; the edge multiset is
    # identical.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()
    )
    # Only vertices touching an edge can ever change label; iterate over
    # that (tiny) subset and re-attach the untouched majority as
    # singleton components at the end. At corpus scale this is the
    # difference between shuffling |V| rows per round and |V(E)| rows.
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("lab")
    ).localCheckpoint()
    prev_fp = None
    for _ in range(max_rounds):
        msgs = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "lab"
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint()
        )
        fp = labels.agg(F.sum(F.col("lab").cast("decimal(38,0)"))).first()[0]
        if fp == prev_fp:
            break
        prev_fp = fp
    singletons = vertices.join(
        edges.select(F.col("src").alias("doc_id")).distinct(), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("lab"))
    return labels.unionByName(singletons).select(
        "doc_id", F.col("lab").alias("component_id")
    )


# -- SimHash ----------------------------------------------------------------------


def _simhash_bit_sums_sql() -> str:
    h = md5_int_sql("word")
    sums = ", ".join(
        f"SUM(CASE WHEN (h // {1 << j}) % 2 = 1 THEN tf ELSE -tf END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH tfs AS (
    SELECT doc_id, word, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ) GROUP BY doc_id, word
),
hashed AS (SELECT doc_id, tf, {h} AS h FROM tfs)
SELECT doc_id, {sums} FROM hashed GROUP BY doc_id
"""


@register(
    "dedup_simhash",
    oracle=f"""
WITH bitsums AS ({_simhash_bit_sums_sql()})
SELECT doc_id,
       {" + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS))} AS simhash
FROM bitsums
""",
    doc="32-bit SimHash fingerprint per document (tf-weighted).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode + two partial-aggregating groupBys; every bit test is
    integer arithmetic on the md5-derived word hash, so the fingerprint
    is engine-independent. Near-dup = small Hamming distance; pair it
    with a band join on simhash prefixes for retrieval at scale.

    ROUND-12 OPTIMIZATION (guide §2.4 — share one exchange): the raw
    documents are hash-repartitioned by doc_id ONCE, up front; both
    groupBys' clustering requirements (doc_id+word, then doc_id) are
    satisfied by that partitioning, so the exploded word rows and the
    tf rows never shuffle at all. The previous plan paid a round-robin
    spread of the raw text PLUS a (doc_id, word) exchange of the tf
    rows plus a (doc_id) exchange — 3 exchanges → 1, and the one that
    remains carries the same raw-text bytes the spread already moved
    (plans/r12/dedup_simhash_{before,after}.txt). Result unchanged:
    grouping/partitioning choices are invisible to the aggregates."""
    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    tfs = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = md5_int_col(F.col("word"))
    hashed = tfs.withColumn("h", h)
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("h").bitwiseAND(F.lit(1 << j))) != 0, F.col("tf")).otherwise(
                    -F.col("tf")
                )
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return bit_sums.select("doc_id", simhash.alias("simhash"))


# -- embedding cosine near-dup ------------------------------------------------------


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine over float arrays, computed exactly like the SQL oracle:
    cast each element to double BEFORE multiplying, sum sequentially."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    nb = F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


# The exact all-pairs baseline is QUADRATIC BY DESIGN (it is the
# measuring stick approximate methods are judged against) — so it runs
# over a fixed-size deterministic hash-sample, the same gating as
# IVF-PQ training (curation.py:PQ_TRAIN_CAP): the EMB_EXACT_CAP vectors
# with the smallest (md5(vec_id), vec_id). Non-binding below 4096
# vectors (sf0.01: 500, sf0.1: 2000 — results unchanged there); at sf1
# (20k) and beyond the baseline stays a bounded 4096² tile job instead
# of growing n². Oracle replays the sample via ORDER BY/LIMIT.
EMB_EXACT_CAP = 4096

_COSINE_SQL = (
    "list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH sids AS (
    SELECT vec_id FROM (
        SELECT vec_id, {md5_int_sql("CAST(vec_id AS VARCHAR)")} AS h FROM embeddings
    ) ORDER BY h, vec_id LIMIT {EMB_EXACT_CAP}
),
e AS (SELECT emb.vec_id, emb.embedding FROM embeddings emb JOIN sids s ON s.vec_id = emb.vec_id)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_COSINE_SQL} >= {COSINE_THRESHOLD}
""",
    doc="Embedding near-dup pairs by exact cosine over a fixed-size "
    "hash-sample (the labeled quadratic baseline; LSH variant in similarity.py).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs cosine as a TILED block matmul — no driver
    gather, no broadcast, no memory bound beyond one tile pair per task.

    Vectors get range blocks on vec_id (~100k rows ≈ 51 MB dense per
    block); every unordered block pair (i ≤ j) becomes one cogroup:
    the left leg replicates each vector to pairs (blk, j ≥ blk), the
    right leg to (i ≤ blk, blk), and ``applyInPandas`` over the
    cogroup runs one BLAS matmul per tile, emitting only id pairs over
    the threshold. Each unordered vector pair lands in exactly one tile
    (range blocks: a < b ⇒ blk(a) ≤ blk(b)), and the va < vb mask
    handles the diagonal tiles — no dedup pass needed.

    Scale: shuffle volume is N × √P tile replicas for P tile pairs —
    the replication IS the price of exact all-pairs; bound it by raising
    the block size, or drop to ann_lsh_bucketed (similarity.py) when
    approximate recall is acceptable. Dense linear algebra stays in
    BLAS (50× over codegen'd per-pair scalar ops); ids-only output
    keeps the oracle comparison away from float formatting (a decision
    flip needs |cos − τ| ≲ 1e-12, impossible in random data)."""
    import math

    import numpy as np
    import pandas as pd

    def sample_ids() -> DataFrame:
        # the EMB_EXACT_CAP gate (see constant above): smallest
        # (md5(vec_id), vec_id) — TakeOrdered over a one-column scan.
        # fresh=True for the same leg-independence reason as gated_scan.
        return (
            load_table(spark, sf_dir, "embeddings", fresh=True)
            .select("vec_id", md5_int_col(F.col("vec_id").cast("string")).alias("h"))
            .orderBy("h", "vec_id")
            .limit(EMB_EXACT_CAP)
            .select("vec_id")
        )

    # Skip the sample gate entirely when it cannot bind (round-6 verdict
    # item 7): below EMB_EXACT_CAP rows the hash-sample contains every
    # vec_id, so the TakeOrdered + broadcast join is ~2 s of pure fixed
    # overhead at small SF for an identical result. One cheap count
    # decides; the oracle's ORDER BY/LIMIT is equally non-binding there.
    gated = (
        load_table(spark, sf_dir, "embeddings").select("vec_id").count()
        > EMB_EXACT_CAP
    )

    def gated_scan() -> DataFrame:
        # fresh=True: each call must be an INDEPENDENT plan instance —
        # the two cogroup legs below share no attribute ids (the memoized
        # reader would hand both legs one instance, which
        # flatMapCoGroupsInPandas cannot disambiguate; see load_table)
        t = load_table(spark, sf_dir, "embeddings", fresh=True).select(
            "vec_id", "embedding"
        )
        return t.join(F.broadcast(sample_ids()), "vec_id") if gated else t

    emb = gated_scan()
    mn, mx, n = emb.agg(
        F.min("vec_id"), F.max("vec_id"), F.count(F.lit(1))
    ).first()
    if not n:
        return spark.createDataFrame([], "vec_a long, vec_b long")
    rows_per_block = 100_000
    n_blocks = max(1, math.ceil(n / rows_per_block))
    width = max(1, math.ceil((int(mx) - int(mn) + 1) / n_blocks))

    def tagged() -> DataFrame:
        # independent scan per leg: a self-cogroup over one shared plan
        # would leave both legs with identical attribute ids, and the
        # analyzer's dedup then strips the right leg's data columns
        t = gated_scan()
        return t.withColumn(
            "blk",
            F.least(
                F.lit(n_blocks - 1),
                F.floor((F.col("vec_id") - F.lit(int(mn))) / F.lit(width)),
            ).cast("int"),
        )

    left = tagged().withColumn(
        "kb", F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1)))
    ).withColumnRenamed("blk", "ka")
    right = tagged().withColumn(
        "ka", F.explode(F.sequence(F.lit(0), F.col("blk")))
    ).withColumnRenamed("blk", "kb")

    def tile(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64")}
            )
        A = np.stack(lpdf["embedding"].to_numpy()).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        Bm = np.stack(rpdf["embedding"].to_numpy()).astype(np.float64)
        Bm /= np.linalg.norm(Bm, axis=1, keepdims=True)
        sims = A @ Bm.T
        rows, cols = np.where(sims >= COSINE_THRESHOLD)
        va = lpdf["vec_id"].to_numpy()[rows]
        vb = rpdf["vec_id"].to_numpy()[cols]
        mask = va < vb
        return pd.DataFrame({"vec_a": va[mask], "vec_b": vb[mask]})

    return (
        left.groupBy("ka", "kb")
        .cogroup(right.groupBy("ka", "kb"))
        .applyInPandas(tile, "vec_a long, vec_b long")
    )


# -- corpus-wide segment-level exact dedup (CCNet-style) ----------------------

SEG_WORDS = 8  # words per segment ("paragraph" unit on the synthetic corpus)

_SEG_HASH_SQL = md5_int_sql(
    f"array_to_string(list_slice(w, (j-1)*{SEG_WORDS}+1, j*{SEG_WORDS}), ' ')"
)


@register(
    "dedup_segments",
    oracle=f"""
WITH s AS (
    SELECT doc_id,
           unnest(range(1, nseg + 1)) - 1 AS seg_no,
           unnest(list_transform(range(1, nseg + 1), j -> {_SEG_HASH_SQL})) AS segh
    FROM (SELECT doc_id, w, CAST(ceil(len(w) / {SEG_WORDS}.0) AS BIGINT) AS nseg
          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
),
r AS (
    SELECT doc_id, seg_no,
           ROW_NUMBER() OVER (PARTITION BY segh ORDER BY doc_id, seg_no) AS rn
    FROM s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM r GROUP BY doc_id
""",
    doc=f"Corpus-wide exact dedup of {SEG_WORDS}-word segments "
    "(first occurrence kept); per-doc kept/dropped counts.",
)
def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup in the CCNet style [Wenzek+ '20]: the
    corpus is cut into fixed-width word segments, every repeated segment
    after its global first occurrence is dropped, and each doc reports
    how much of it survived — the signal that catches boilerplate and
    quoted blocks that whole-doc hashing (dedup_exact) misses and
    winnowing only pairs up.

    Scale shape: segments shuffle ONCE on their 60-bit hash (never the
    text), first-occurrence is a row_number over that same partitioning
    (no extra exchange), and the per-doc rollup partial-aggregates
    map-side. "First occurrence" is the total order (doc_id, seg_no) —
    deterministic on both engines, no timestamps involved. At 100 TB
    hot boilerplate segments skew the hash partition; AQE skew-split
    handles it (the per-key payload is just (doc_id, seg_no))."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    nseg = F.ceil(F.size("w") / SEG_WORDS).cast("int")
    seghs = F.transform(
        F.sequence(F.lit(1), nseg),
        lambda j: md5_int_col(
            F.concat_ws(" ", F.slice("w", (j - F.lit(1)) * SEG_WORDS + F.lit(1), F.lit(SEG_WORDS)))
        ),
    )
    s = d.select("doc_id", F.posexplode(seghs).alias("seg_no", "segh"))
    rn = F.row_number().over(
        Window.partitionBy("segh").orderBy("doc_id", "seg_no")
    )
    r = s.select("doc_id", rn.alias("rn"))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
    )


# -- semantic dedup within embedding clusters (SemDeDup-style) ----------------

SEM_TAU = 0.3  # within-cluster cosine threshold
SEM_BLOCKS = 4  # row-block tiles per cluster (memory + parallelism knob)


@register(
    "dedup_semantic_cluster",
    oracle=f"""
SELECT a.label AS label, a.vec_id AS keep_id, b.vec_id AS dup_id
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COSINE_SQL} >= {SEM_TAU}
""",
    doc=f"SemDeDup: within-cluster cosine >= {SEM_TAU} near-dup pairs "
    "(lower vec_id kept).",
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup [Abbas+ '23]: semantic near-dup removal searches ONLY
    within an embedding cluster — here the pre-assigned ``label``
    column (embedding_centroid_assign is the Lloyd step that would
    produce it). Work is grouped by the cluster id, so the quadratic
    blowup is bounded by cluster occupancy, never corpus size — the
    whole point of the method at 100 TB, where all-pairs
    (dedup_embedding_cosine's tiled exact baseline) is the thing
    you're avoiding. Keep-lowest-id is the deterministic stand-in for
    SemDeDup's keep-one-per-group choice.

    Execution shape: the cluster's pair matrix is ROW-BLOCK TILED —
    each task owns one (cluster, row-block) and computes its block's
    rows of the Gram matrix against the whole cluster, emitting the
    pair (a, b) from the block that owns the smaller vec_id (each
    unordered pair exactly once). This is the overflow strategy a hot
    cluster needs at 100 TB made real: an n-vector cluster never
    materializes an n×n block in one task, only (n/B)×n, and the
    quadratic work spreads over B tasks per cluster instead of one
    (sf1: 10×~2k-vector clusters went from 10 single-task Grams to
    40 cache-friendlier tiles — 6.1 → ~2 s). The cost is shipping the
    cluster's row set to each of its B tiles (B·n·d floats — the
    standard block-nested-loop trade).

    Bit-exactness: per pair, the dot and both norms accumulate
    DIM-SEQUENTIALLY (``acc = acc + col_blk·col_allᵀ`` over the 64
    dims, starting from 0.0) — per matrix entry that is bit-for-bit
    the fold order the oracle's ``list_sum(list_transform(...))``
    computes, and tiling never changes any entry's operation sequence,
    so cosine values — and the ``>= τ`` cut — match the SQL oracle
    exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    rowstruct = F.struct("vec_id", "embedding")
    ids_of = lambda c: F.transform(c, lambda s: s["vec_id"])  # noqa: E731
    flat_of = lambda c: F.flatten(  # noqa: E731
        F.transform(c, lambda s: s["embedding"])
    )
    blk = (F.col("vec_id") % SEM_BLOCKS).cast("int")
    # ship each side as (sorted id array, flattened row-major float
    # matrix): ONE contiguous Arrow buffer per cell instead of n nested
    # structs — the struct form spent more time in Arrow->pandas
    # conversion than in the Gram itself.
    blocks = (
        emb.select("label", blk.alias("blk"), rowstruct.alias("r"))
        .groupBy("label", "blk")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .select(
            "label", "blk", ids_of("rs").alias("bids"), flat_of("rs").alias("bemb")
        )
    )
    full = (
        emb.select("label", rowstruct.alias("r"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .select("label", ids_of("rs").alias("fids"), flat_of("rs").alias("femb"))
    )
    # pin one tile per task: the joined frame is only k·B rows (a few
    # MB), so AQE coalesces the aggregate exchange to 1-2 partitions by
    # byte size and a hash repartition on (label, blk) is removed as
    # redundant with the aggregate's partitioning. An explicit
    # round-robin repartition with a fixed partition count survives
    # both rules and gives every Gram tile its own task.
    joined = (
        blocks.join(full, "label")
        .select("label", "bids", "bemb", "fids", "femb")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def _tile_pairs(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                bids = np.asarray(row["bids"])
                fids = np.asarray(row["fids"])
                nb, nf = len(bids), len(fids)
                Eb = np.asarray(row["bemb"], dtype=np.float64).reshape(nb, -1)
                Ef = np.asarray(row["femb"], dtype=np.float64).reshape(nf, -1)
                d = Eb.shape[1]
                sqb, sqf = np.zeros(nb), np.zeros(nf)
                gram = np.zeros((nb, nf))
                for j in range(d):  # dim-sequential: oracle fold order
                    cb, cf = Eb[:, j], Ef[:, j]
                    sqb = sqb + cb * cb
                    sqf = sqf + cf * cf
                    gram = gram + np.multiply.outer(cb, cf)
                cos = gram / np.multiply.outer(np.sqrt(sqb), np.sqrt(sqf))
                # the block owning the SMALLER id emits the pair
                m = (cos >= SEM_TAU) & (bids[:, None] < fids[None, :])
                bi, fi = np.nonzero(m)
                yield pd.DataFrame(
                    {
                        "label": np.full(len(bi), row["label"], dtype=np.int32),
                        "keep_id": bids[bi],
                        "dup_id": fids[fi],
                    }
                )

    return joined.mapInPandas(_tile_pairs, "label int, keep_id long, dup_id long")


# -- exact-substring dedup (Lee et al. 2022 style) ----------------------------

SUBSTR_K = 20  # duplicated-span detection length, in characters


@register(
    "dedup_substring_exact",
    oracle=f"""
WITH d AS (SELECT doc_id, text, n_chars FROM documents),
g AS (SELECT doc_id, i AS pos,
             {md5_int_sql(f"substr(text, i, {SUBSTR_K})")} AS h
      FROM d, unnest(generate_series(1, n_chars - {SUBSTR_K} + 1)) AS t(i)
      WHERE n_chars >= {SUBSTR_K}),
dp AS (SELECT doc_id, pos FROM (
           SELECT doc_id, pos,
                  COUNT(*) OVER (PARTITION BY h) AS cnt
           FROM g
       ) WHERE cnt > 1),
x AS (SELECT doc_id, pos,
             lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS np
      FROM dp),
c AS (SELECT doc_id,
             COUNT(*) AS n_dup_grams,
             SUM(LEAST({SUBSTR_K}, COALESCE(np - pos, {SUBSTR_K}))) AS dup_chars
      FROM x GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(c.dup_chars, 0) AS BIGINT) AS dup_chars,
       CAST(COALESCE(c.dup_chars, 0) AS DOUBLE) / d.n_chars AS dup_frac
FROM d LEFT JOIN c USING (doc_id)
""",
    doc="Exact substring dedup: per-doc count of corpus-duplicated "
    f"{SUBSTR_K}-char grams and the exact character coverage of the "
    "duplicated spans (interval-union via a lead() window).",
)
def dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    operator the sampling families deliberately approximate: winnowing
    SAMPLES fingerprints and MinHash estimates set overlap, but exact
    dedup must see EVERY length-K window. Per document it reports how
    many of its K-char grams occur more than once in the corpus
    (within-doc repeats count too, as in the paper) and the exact number
    of characters covered by those duplicated spans.

    Spark-first plan, no Python anywhere: ``sequence`` + ``explode``
    enumerates the stride-1 gram start positions (codegen, stays in the
    document's partition) and each gram immediately collapses to its
    60-bit md5-derived integer — the shuffle carries 8-byte hashes, not
    K-char strings (the production trick; collision odds ~n²/2⁶⁰, and
    the ORACLE computes the identical hash, so even a collision cannot
    diverge the engines). Corpus-wide frequency is ONE count-over-window
    partitioned by the hash — a single pass over the gram stream, no
    groupBy-plus-join-back replaying the explode — and the span-union
    length is computed EXACTLY with a per-doc ``lead()`` window: a
    position covers ``min(K, next_pos - pos)`` fresh characters, so
    summing that over sorted duplicated positions is the union length
    of the fixed-width intervals — no interval-merge UDF.

    Scale: stride-1 gram rows are a K-fold blow-up of the corpus in ROW
    COUNT but only ~8 bytes/char in shuffle BYTES (at 100 TB the hash
    shuffle is the cost, exactly as the suffix-array build is in the
    paper). The hash key is uniformly distributed — no skew — and the
    per-doc window shuffles only the DUPLICATED positions. Measured at
    sf1 (13M grams): groupBy-gram-string + join-back 19.6 s → this
    hash-window plan 2.0 s.
    Reference scope: the eventlog reference has no relational engine;
    this extends SURVEY.md §2.2's LLM-curation family.
    """
    k = SUBSTR_K
    from pyspark.sql.window import Window

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    g = (
        d.where(F.col("n_chars") >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_chars") - k + 1)).alias("pos"),
            "text",
        )
        .select(
            "doc_id",
            "pos",
            md5_int_col(F.expr(f"substring(text, pos, {k})")).alias("h"),
        )
    )
    wh = Window.partitionBy("h")
    dp = (
        g.withColumn("cnt", F.count(F.lit(1)).over(wh))
        .where("cnt > 1")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    x = dp.withColumn("np", F.lead("pos").over(w))
    c = x.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.sum(
            F.least(F.lit(k), F.coalesce(F.col("np") - F.col("pos"), F.lit(k)))
        ).alias("dup_chars"),
    )
    return d.join(c, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
        (F.coalesce("dup_chars", F.lit(0)).cast("double") / F.col("n_chars")).alias(
            "dup_frac"
        ),
    )


# -- incremental dedup: new batch vs accumulated corpus -----------------------

INCR_NEW_SOURCE = "src0"  # the "freshly crawled" batch in the synthetic corpus


@register(
    "dedup_incremental_minhash",
    oracle=f"""
WITH pairs AS ({_LSH_PAIRS_SQL}),
nb AS (SELECT doc_id FROM documents WHERE source = '{INCR_NEW_SOURCE}'),
ex AS (
    SELECT doc_a AS d, doc_b AS p FROM pairs
    UNION ALL
    SELECT doc_b AS d, doc_a AS p FROM pairs
)
SELECT n.doc_id,
       CAST(COALESCE(SUM(CASE WHEN pn.doc_id IS NOT NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_cand_new,
       CAST(COALESCE(SUM(CASE WHEN e.p IS NOT NULL AND pn.doc_id IS NULL
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cand_corpus,
       CAST(CASE WHEN COUNT(e.p) > 0 THEN 1 ELSE 0 END AS BIGINT)
           AS is_dup_candidate
FROM nb n
LEFT JOIN ex e ON n.doc_id = e.d
LEFT JOIN nb pn ON e.p = pn.doc_id
GROUP BY n.doc_id
""",
    doc=f"Incremental dedup: the '{INCR_NEW_SOURCE}' batch probed against "
    "the accumulated corpus — per new doc, LSH candidate partners split "
    "into batch-internal vs corpus matches.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the shape production actually runs: a 100 TB
    corpus is deduplicated ONCE, and every new crawl batch is then
    probed against the accumulated index; re-running full-corpus dedup
    per ingest is exactly what you avoid. Here the 'src0' source
    plays the new batch: its documents' LSH band keys probe the
    corpus-wide band index, and each new document reports its candidate
    partners split into batch-internal matches vs matches already in
    the corpus (the latter mean "drop or link before ingest").

    Plan shape: the signature table and its melted band keys are the
    SAME pipeline the full-corpus queries share (one shingle
    materialization per session); the probe is an equi-join of the
    NEW-side keys (|batch| · bands rows) against the full key index —
    cost ∝ new-batch collisions, never corpus². At 100 TB the corpus
    band index is the persisted artifact (the `persisted_bundle`
    pattern the ANN and BPE families already use) and each ingest joins
    only its own batch against it. The oracle derives the same answer
    from the full symmetric pair set restricted to new-batch endpoints
    — equivalent because band collision is symmetric.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = _minhash_signature(spark, sf_dir)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.col(f"mh{2 * band}").alias("k1"),
                F.col(f"mh{2 * band + 1}").alias("k2"),
            )
            for band in range(N_BANDS)
        ]
    )
    keys = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", "bk.band", "bk.k1", "bk.k2"
    )
    new_ids = docs.where(F.col("source") == INCR_NEW_SOURCE).select("doc_id")
    new_keys = keys.join(F.broadcast(new_ids), "doc_id")
    cand = (
        new_keys.alias("a")
        .join(keys.alias("b"), ["band", "k1", "k2"])
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("partner"))
        .distinct()
    )
    par = cand.join(
        F.broadcast(
            new_ids.select(F.col("doc_id").alias("partner")).withColumn(
                "p_new", F.lit(1)
            )
        ),
        "partner",
        "left",
    )
    agg = par.groupBy("doc_id").agg(
        F.sum(F.coalesce("p_new", F.lit(0))).alias("n_cand_new"),
        F.sum(F.when(F.col("p_new").isNull(), 1).otherwise(0)).alias(
            "n_cand_corpus"
        ),
    )
    return new_ids.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_cand_new", F.lit(0)).cast("long").alias("n_cand_new"),
        F.coalesce("n_cand_corpus", F.lit(0)).cast("long").alias("n_cand_corpus"),
        F.when(
            F.coalesce("n_cand_new", F.lit(0)) + F.coalesce("n_cand_corpus", F.lit(0))
            > 0,
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_dup_candidate"),
    )


# -- duplicate-graph triangle census ------------------------------------------

TRI_FXP = 1_000_000  # fixed-point scale for the clustering coefficient


@register(
    "graph_triangle_count",
    oracle=f"""
WITH pairs AS ({_LSH_PAIRS_SQL}),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT doc_a AS node FROM pairs
        UNION ALL
        SELECT doc_b AS node FROM pairs
    ) GROUP BY node
),
w AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
    FROM deg
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs),
tri AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e2.doc_a = e1.doc_b
    JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
       CAST(CASE WHEN n_wedges = 0 THEN 0
                 ELSE 3 * n_triangles * {TRI_FXP} // n_wedges END
            AS BIGINT) AS clustering_fp
FROM w CROSS JOIN m CROSS JOIN tri
""",
    doc="Triangle census of the near-dup candidate graph: vertex/edge/"
    "wedge/triangle counts and the global clustering coefficient "
    "(3T/wedges, fixed point) — how clique-like duplicate clusters are.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure audit of the duplicate graph the components query
    clusters: a high clustering coefficient means near-dup candidates
    form tight cliques (template families, mirrored sites — safe to
    keep one representative); a low one means chains of marginal pairs
    (transitive merge is collapsing documents that are NOT mutually
    similar — tighten the LSH threshold before deduplicating). Classic
    compact-forward triangle counting: edges oriented doc_a < doc_b, a
    wedge join (e1.b = e2.a gives a < b < c for free), then a closing
    semi-check against the edge list. All counts exact integers; the
    coefficient is one truncating fixed-point division.

    Scale shape: rides the shared ``doc_lsh_pairs`` artifact (built
    once per session, reused by 5 queries); two hash joins over the
    EDGE list (never the corpus), each shuffling on a single id key —
    AQE splits skewed hubs. Wedge volume is Σ deg² of the candidate
    graph, which the LSH band scheme already occupancy-bounds; at
    extreme skew the standard refinement is degree-orientation
    (orient edges low-degree → high-degree) on top of the same joins."""
    edges = lsh_candidate_pairs(spark, sf_dir)
    deg = (
        edges.select(F.col("doc_a").alias("node"))
        .unionByName(edges.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    w = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
    )
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    cc = F.when(F.col("n_wedges") == 0, F.lit(0).cast("long")).otherwise(
        F.expr(f"3 * n_triangles * {TRI_FXP} div n_wedges")
    )
    return (
        w.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            cc.cast("long").alias("clustering_fp"),
        )
    )


# -- n-gram novelty curve (corpus redundancy over ingestion order) ------------

NOV_BUCKETS = 10
NOV_FXP = 1_000_000


@register(
    "corpus_ngram_novelty",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
first_seen AS (SELECT shh, MIN(doc_id) AS fd FROM sh GROUP BY shh),
per_doc AS (
    SELECT s.doc_id,
           COUNT(*) AS n_grams,
           SUM(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END) AS n_novel
    FROM sh s JOIN first_seen f ON f.shh = s.shh
    GROUP BY s.doc_id
),
mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents)
SELECT CAST(doc_id * {NOV_BUCKETS} // m AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) * {NOV_FXP} // SUM(n_grams) AS BIGINT) AS novelty_fp
FROM per_doc CROSS JOIN mx
GROUP BY doc_id * {NOV_BUCKETS} // m
""",
    doc=f"N-gram novelty curve: per ingestion-order decile "
    f"({NOV_BUCKETS} id buckets), the fraction of each document's "
    "distinct 3-gram shingles never seen in any earlier document "
    "(fixed point).",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diminishing-returns curve of continued crawling: a shingle
    is NOVEL for the document that introduces it (minimum doc_id over
    the corpus), and each ingestion-order decile reports what fraction
    of its shingle mass was new — the number that tells you when the
    crawl stopped adding information and the dedup budget should take
    over (Villalobos et al., "Will we run out of data?", spiritually).
    On this corpus the planted duplicate families pull later deciles
    down, which the tests assert.

    Scale shape: rides the shared shingle artifact; first-seen is one
    groupBy on the 8-byte shingle hash, and the join back to the
    shingle stream reuses the same (shh) exchange layout. The per-doc
    rollup shuffles ids only; the decile rollup is {NOV_BUCKETS} rows
    with a broadcast 1-row max. All counts integer, ratio via
    truncating fixed-point division."""
    sh = shingles_shared(spark, sf_dir)
    # ROUND-12 OPTIMIZATION (guide §2.4/§3.3 — don't join what an
    # aggregation already knows): the shingle table is DISTINCT per
    # (doc_id, shh), so a document's novel-gram count is exactly the
    # number of first_seen rows it introduced — group first_seen by its
    # introducing doc instead of joining it back onto the full shingle
    # stream. The old shape broadcast first_seen (|distinct shingles| —
    # a scale hazard at 100 TB) and probed every shingle row through
    # the join before re-aggregating; this shape never materializes a
    # join of the stream at all: two partial-aggregating groupBys plus
    # one |docs|-sized merge join. A doc with zero novel shingles
    # coalesces to 0; docs with no shingles (< 3 words) are absent from
    # both sides, exactly as before (and as in the oracle).
    first_seen = sh.groupBy("shh").agg(F.min("doc_id").alias("fd"))
    novel = first_seen.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    grams = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    per_doc = grams.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
    )
    mx = (
        load_table(spark, sf_dir, "documents")
        .agg((F.max("doc_id") + 1).alias("m"))
    )
    return (
        per_doc.crossJoin(F.broadcast(mx))
        .groupBy(
            F.expr(f"doc_id * {NOV_BUCKETS} div m").cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
            F.expr(f"sum(n_novel) * {NOV_FXP} div sum(n_grams)")
            .cast("long")
            .alias("novelty_fp"),
        )
    )


# -- quality-aware canonical selection per duplicate cluster -------------------

_KEEP_BEST_COMP_SQL = f"""
WITH RECURSIVE
pairs AS ({_LSH_PAIRS_SQL}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lab) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lab) AS component_id FROM reach GROUP BY node)
"""


@register(
    "dedup_keep_best",
    oracle=_KEEP_BEST_COMP_SQL
    + """,
feats AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           len(list_filter(string_split(text, ' '),
                           x -> x IN ('the','a','to','of','in','and'))) AS n_stop
    FROM documents
),
ranked AS (
    SELECT c.component_id, f.doc_id, f.n_words,
           CASE WHEN f.n_words BETWEEN 20 AND 95
                 AND f.n_stop * 50 >= f.n_words
                THEN 1 ELSE 0 END AS is_q,
           ROW_NUMBER() OVER (
               PARTITION BY c.component_id
               ORDER BY CASE WHEN f.n_words BETWEEN 20 AND 95
                              AND f.n_stop * 50 >= f.n_words
                             THEN 1 ELSE 0 END DESC,
                        f.n_words DESC, f.doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY c.component_id) AS n_members
    FROM comp c JOIN feats f USING (doc_id)
)
SELECT component_id,
       CAST(n_members AS BIGINT) AS n_members,
       doc_id AS kept_doc_id,
       CAST(is_q AS INT) AS kept_is_quality,
       CAST(n_words AS BIGINT) AS kept_n_words
FROM ranked WHERE rk = 1 AND n_members > 1
""",
    doc="Quality-aware canonical document per near-dup cluster: connected "
    "components over the LSH pairs, keep the best member by "
    "(quality-gate, length, id) instead of blind min-id.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which duplicate SURVIVES matters as much as finding duplicates:
    min-id keepers (``pipeline_curate``, reference-style) can discard a
    clean page in favor of its boilerplate-wrapped twin. This ranks
    every near-dup cluster's members by (passes the quality gate,
    word count, doc_id) and keeps the top one — the quality-aware
    representative selection production curation runs (RefinedWeb /
    FineWeb keep one representative per MinHash cluster; pairing the
    choice with a quality signal is the standard refinement).

    Composition, all reused work: the cluster ids come from the
    session-shared components artifact (ONE min-label-propagation run
    serves this and ``dedup_connected_components``, which itself sits
    on the shared LSH pair artifact); the quality features
    are ``text_quality``'s exact expressions (integer form: stop_ratio
    >= 0.02 becomes n_stop * 50 >= n_words — no float compare). The
    only new work is one projection over documents and a row_number
    window partitioned by component_id — duplicate clusters are tiny,
    so no skew. Output: multi-member clusters only (singletons keep
    themselves by definition).

    Scale: components are the dominant cost and are already bounded to
    edge-touching vertices; the argmax adds one |V|-row window, grouped
    by cluster — at 100 TB the ranking shuffle is the corpus's (id,
    features) projection, a few bytes per row."""
    from .text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    comp = doc_components_shared(spark, sf_dir)
    w = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
    )
    is_q = (
        F.col("n_words").between(20, 95)
        & (F.col("n_stop") * 50 >= F.col("n_words"))
    ).cast("int")
    from pyspark.sql import Window

    win = Window.partitionBy("component_id")
    order = win.orderBy(
        F.desc("is_q"), F.desc("n_words"), F.asc("doc_id")
    )
    return (
        comp.join(feats, "doc_id")
        .withColumn("is_q", is_q)
        .withColumn("rk", F.row_number().over(order))
        .withColumn("n_members", F.count(F.lit(1)).over(win))
        .where((F.col("rk") == 1) & (F.col("n_members") > 1))
        .select(
            "component_id",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("doc_id").alias("kept_doc_id"),
            F.col("is_q").alias("kept_is_quality"),
            F.col("n_words").cast("long").alias("kept_n_words"),
        )
    )
