"""Text-analysis operators over ``documents``: quality scoring, token
counting, language-ID heuristics, fingerprinting.

All pure JVM-side column expressions (split / regexp / aggregate) —
these run at full codegen speed over any corpus size; there is no
Python in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table, spread
from .dedup import md5_int_col, md5_int_sql

STOPWORDS = ("the", "a", "to", "of", "in", "and")
_STOP_SQL = "('" + "','".join(STOPWORDS) + "')"


@register(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       n_words,
       n_stop,
       CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       CAST(sum_word_len AS DOUBLE) / n_words AS avg_word_len,
       CASE WHEN n_words BETWEEN 20 AND 95
             AND CAST(n_stop AS DOUBLE) / n_words >= 0.02
            THEN 1 ELSE 0 END AS is_quality
FROM (
    SELECT doc_id,
           len(w) AS n_words,
           len(list_filter(w, x -> x IN {_STOP_SQL})) AS n_stop,
           list_sum(list_transform(w, x -> length(x))) AS sum_word_len
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
)
""",
    doc="Per-doc quality features: word count, stopword ratio, avg word length.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate (the C4/Gopher-rule family): cheap
    length/ratio features computed in one projection, used to filter a
    crawl before expensive model-based scoring."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    base = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)), F.lit(0), lambda acc, v: acc + v
        ).alias("sum_word_len"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    return base.select(
        "doc_id",
        "n_words",
        "n_stop",
        stop_ratio.alias("stop_ratio"),
        (F.col("sum_word_len").cast("double") / F.col("n_words")).alias("avg_word_len"),
        F.when(
            F.col("n_words").between(20, 95) & (stop_ratio >= 0.02), 1
        ).otherwise(0).alias("is_quality"),
    )


@register(
    "text_token_count",
    oracle=r"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS re_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
""",
    doc="Corpus token accounting per source (whitespace + BPE-ish regex tokens).",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting for a training corpus: the regex tokenizer
    approximates BPE pre-tokenization (letter runs / digit runs /
    punctuation). regexp_extract_all is codegen'd — no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("ws_tokens"),
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))
        ).alias("re_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "text_lang_stats",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
                     / len(string_split(text, ' ')) >= 0.02
                THEN 1 ELSE 0 END) AS BIGINT) AS predicted_en
FROM documents
GROUP BY lang
""",
    doc="Language-ID heuristic (stopword-vote) scored against the lang label.",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID — the mechanism used before fasttext-
    class models. NOTE: the synthetic corpus draws every language from
    one English-ish vocabulary, so the predictor marks most docs 'en';
    the query's value is the per-language accounting shape, which is
    exactly what a real pipeline reports."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    stop_ratio = (
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double") / F.size(w)
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(stop_ratio >= 0.02, 1).otherwise(0)).alias("predicted_en"),
    )


ROLL_B = 31
ROLL_M = 1_000_003


@register(
    "text_rolling_hash",
    oracle=f"""
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split_regex(text, ''), x -> CAST(ascii(x) AS BIGINT))),
                   (a, c) -> (a * {ROLL_B} + c) % {ROLL_M}) AS roll_full,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split_regex(substr(text, 1, 64), ''), x -> CAST(ascii(x) AS BIGINT))),
                   (a, c) -> (a * {ROLL_B} + c) % {ROLL_M}) AS roll_prefix
FROM documents
""",
    doc="Rabin-Karp polynomial rolling hash (full doc + 64-char prefix).",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash (base 31 mod 1e6+3) folded over the
    character stream with a built-in higher-order aggregate — no UDF,
    no Python. The same fold over a sliding k-char window (subtract the
    outgoing char's B^(k-1) term, multiply, add) gives winnowing-style
    local fingerprints; per-doc full/prefix hashes are the degenerate
    windows and the join-friendly corpus fingerprint. The char-level
    fold is the most CPU-dense projection in the suite — spread()
    unpins it from the source file's 1-2 row-group splits."""
    docs = spread(load_table(spark, sf_dir, "documents"))

    def poly(col):
        codes = F.transform(F.split(col, ""), lambda x: F.ascii(x).cast("long"))
        return F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, c: (a * ROLL_B + c) % ROLL_M
        )

    return docs.select(
        "doc_id",
        poly(F.col("text")).alias("roll_full"),
        poly(F.substring("text", 1, 64)).alias("roll_prefix"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       substr(md5(text), 1, 16) AS fp_hex,
       {md5_int_sql("text")} AS fp_int
FROM documents
""",
    doc="Content fingerprint per document (md5-derived 60-bit int + hex).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-friendly fixed-width fingerprints: the 60-bit int shuffles/
    sorts as a primitive long (vs 32-char strings) — at corpus scale
    that halves dedup shuffle volume."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp_hex"),
        md5_int_col(F.col("text")).alias("fp_int"),
    )


DECON_N = 4  # n-gram size for contamination matching


@register(
    "text_decontaminate",
    oracle=f"""
WITH g AS (
    SELECT doc_id, source, {md5_int_sql('sh')} AS shh FROM (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(w) - {DECON_N - 2}),
                      i -> array_to_string(list_slice(w, i, i + {DECON_N - 1}), ' '))) AS sh
        FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
        WHERE len(w) >= {DECON_N}
    )
),
eg AS (SELECT DISTINCT shh FROM g WHERE source = 'src0'),
tg AS (SELECT DISTINCT doc_id, source, shh FROM g WHERE source <> 'src0')
SELECT tg.doc_id, tg.source, COUNT(*) AS n_shared
FROM tg JOIN eg USING (shh)
GROUP BY tg.doc_id, tg.source
""",
    doc="Benchmark decontamination: training docs sharing any word 4-gram "
    "with the eval set (source src0), with overlap counts.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-overlap check every training pipeline runs before
    shipping a corpus (the 13-gram rule, scaled to this corpus's short
    docs): hash each n-gram to a 60-bit int, build the eval set's
    distinct-gram index, and semi-join the training grams against it.
    The index is BROADCAST — benchmark suites are tiny next to a 100 TB
    corpus — so the only shuffle is the per-doc overlap count, carrying
    one row per (doc, matched gram). Never an O(docs × eval) comparison;
    cost ∝ matching grams."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = docs.withColumn("w", F.split("text", " ")).where(F.size("w") >= DECON_N)
    arr = F.transform(
        F.sequence(F.lit(1), F.size("w") - (DECON_N - 1)),
        lambda i: F.concat_ws(" ", F.slice("w", i, DECON_N)),
    )
    grams = w.select(
        "doc_id", "source", F.explode(arr).alias("sh")
    ).select("doc_id", "source", md5_int_col(F.col("sh")).alias("shh"))
    eval_idx = (
        grams.where(F.col("source") == "src0").select("shh").distinct()
    )
    train = grams.where(F.col("source") != "src0").distinct()
    return (
        train.join(F.broadcast(eval_idx), "shh")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@register(
    "text_repetition_score",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_distinct) AS BIGINT) AS distinct_tris,
       CAST(SUM(n_total) AS BIGINT) AS total_tris,
       CAST(SUM(CASE WHEN 100 * n_distinct < 55 * n_total THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repetitive
FROM (
    SELECT source,
           len(list_distinct(list_transform(range(1, len(w) - 1),
               i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS n_distinct,
           len(w) - 2 AS n_total
    FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 3
)
GROUP BY source
""",
    doc="Repetition quality signal per source: distinct-vs-total trigram "
    "mass and the count of repetitive docs (distinct/total < 0.55).",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/RefinedWeb repeated-n-gram filter, aggregated per
    source: a doc whose distinct-trigram fraction is low is boilerplate
    or looping text. Per-doc work is one codegen'd projection
    (transform + array_distinct — no explode, no shuffle); the
    repetitive flag uses integer cross-multiplication (100·d < 55·t) so
    no float threshold can diverge between engines. The one shuffle is
    the per-source partial+final aggregate."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = docs.withColumn("w", F.split("text", " ")).where(F.size("w") >= 3)
    tri = F.transform(
        F.sequence(F.lit(1), F.size("w") - 2),
        lambda i: F.concat_ws(" ", F.slice("w", i, 3)),
    )
    per_doc = w.select(
        "source",
        F.size(F.array_distinct(tri)).alias("n_distinct"),
        (F.size("w") - 2).alias("n_total"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_distinct").cast("long").alias("distinct_tris"),
        F.sum("n_total").cast("long").alias("total_tris"),
        F.sum(
            F.when(100 * F.col("n_distinct") < 55 * F.col("n_total"), 1).otherwise(0)
        ).cast("long").alias("n_repetitive"),
    )


# -- inverse-frequency (surprisal-proxy) scoring ------------------------------

_IFS_SCALE = 1_000_000  # fixed-point: floor(1e6 / corpus_count) per token


@register(
    "text_inverse_freq_score",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
scored AS (
    SELECT t.doc_id, CAST(FLOOR({_IFS_SCALE} / wc.cnt) AS BIGINT) AS s
    FROM tok t JOIN wc ON wc.word = t.word
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(s) AS BIGINT) AS score_fp,
       CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_inv_freq
FROM scored GROUP BY doc_id
""",
    doc="Per-doc inverse-corpus-frequency score (fixed-point surprisal "
    "proxy): rare-token-heavy docs score high.",
)
def text_inverse_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surprisal-proxy quality weighting: each token contributes
    floor(1e6 / corpus_count) — a fixed-point stand-in for -log p(w)
    that needs no transcendentals (ln differs across math libs in the
    last ulp; integer division doesn't). Docs dense in rare tokens
    score high — the importance-sampling signal used to upweight rare
    content in training mixes.

    Two shuffles: the corpus word-count (map-side combined, vocab-sized
    result) and the per-doc rollup. The token→count join BROADCASTS the
    vocabulary — a natural-language vocab is millions of rows at most,
    broadcastable at any corpus size, so the scoring pass itself never
    shuffles the token stream."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    s = F.floor(F.lit(_IFS_SCALE) / F.col("cnt")).cast("long")
    return (
        tok.join(F.broadcast(wc), "word")
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("s").alias("score_fp"),
            (F.sum("s").cast("double") / F.count(F.lit(1))).alias("mean_inv_freq"),
        )
    )


# -- term-blocklist filtering (C4-style badlist gate) -------------------------

BLOCKLIST = ("slow", "big", "dup")
_BLOCK_SQL = "('" + "','".join(BLOCKLIST) + "')"
_BLOCK_MAX_PCT = 5  # drop docs where blocked tokens exceed 5% of tokens


@register(
    "text_blocklist_filter",
    oracle=f"""
SELECT doc_id,
       CAST(len(list_filter(w, x -> x IN {_BLOCK_SQL})) AS BIGINT) AS n_hits,
       CAST(len(list_distinct(list_filter(w, x -> x IN {_BLOCK_SQL}))) AS BIGINT)
           AS n_terms_hit,
       CAST(CASE WHEN len(list_filter(w, x -> x IN {_BLOCK_SQL})) * 100
                      <= len(w) * {_BLOCK_MAX_PCT}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep,
       array_to_string(
           list_transform(w, x -> CASE WHEN x IN {_BLOCK_SQL}
                                       THEN '[***]' ELSE x END), ' ') AS redacted
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
""",
    doc="C4-style term-blocklist gate: per-doc blocked-token counts, a "
    "5%-ratio keep flag, and the redacted text.",
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering + redaction — the C4 'bad words' stage every
    crawl pipeline runs, with the redaction twist PII scrubbing needs.
    One narrow projection, all higher-order array functions (FILTER /
    TRANSFORM compile to codegen loops, no Python): tokenization happens
    ONCE and feeds counts, the distinct-terms hit set, the ratio gate,
    and the rebuilt redacted string. Shuffle-free map stage — at 100 TB
    it pipelines into the writer; the blocklist itself is a literal IN
    list (real deployments: thousands of terms → still a broadcast-sized
    lookup, or a regexp_replace automaton)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    hits = F.filter(w, lambda x: x.isin(*BLOCKLIST))
    n_hits = F.size(hits)
    return docs.select(
        "doc_id",
        n_hits.cast("long").alias("n_hits"),
        F.size(F.array_distinct(hits)).cast("long").alias("n_terms_hit"),
        F.when(n_hits * 100 <= F.size(w) * _BLOCK_MAX_PCT, 1)
        .otherwise(0)
        .cast("long")
        .alias("keep"),
        F.array_join(
            F.transform(
                w, lambda x: F.when(x.isin(*BLOCKLIST), F.lit("[***]")).otherwise(x)
            ),
            " ",
        ).alias("redacted"),
    )


# -- bigram conditional-surprisal scoring (CCNet perplexity-filter analog) ----

_BIG_FP = 1_000_000  # fixed-point: floor(1e6 * count(w1) / count(w1,w2))


@register(
    "text_bigram_surprisal",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM w),
big AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM idx),
c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS cnt1 FROM big GROUP BY w1),
sc AS (
    SELECT b.doc_id, ({_BIG_FP} * c1.cnt1) // c2.cnt2 AS s
    FROM big b
    JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
    JOIN c1 ON b.w1 = c1.w1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(s) AS BIGINT) AS surprisal_fp,
       CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_surprisal
FROM sc GROUP BY doc_id
""",
    doc="Per-doc bigram conditional surprisal (fixed-point 1/p(w2|w1) "
    "proxy): unusual word sequences score high, formulaic text low.",
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet/KenLM perplexity-filter shape without the LM: score
    each document by how improbable its word transitions are under the
    corpus's own bigram statistics. ``floor(1e6 · c(w1) / c(w1,w2))``
    is a monotone stand-in for −log p(w2|w1) that stays in integer
    math (transcendental-free → bit-equal across engines); docs full
    of boilerplate transitions score ≈1e6·1, rare constructions score
    high — the signal CCNet buckets on.

    Scale shape: bigram and prefix count tables are vocabulary²-sized
    aggregates (map-side combined); both BROADCAST onto the bigram
    stream (a web-scale bigram vocab tops out in the low billions of
    DISTINCT pairs — at that point bucket the join on w1 instead; the
    demo broadcasts). The stream itself shuffles once, for the final
    per-doc rollup."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.split("text", " ")
    pairs = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
    )
    big = (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # ROUND 13 (guide §1.2): c1 is exactly the w2-marginal of c2
    # (every bigram row contributes one count to both tables), so it
    # folds from the vocabulary²-sized c2 instead of re-tokenizing the
    # corpus; pinning c2 stops the broadcast build and the probe from
    # each re-embedding the tokenize+explode pass (3 document scans →
    # 1 in the plan). Counts are value-identical: SUM of the per-(w1,
    # w2) counts over w2 == COUNT of bigrams per w1.
    from .artifacts import lazy_checkpoint

    c2 = lazy_checkpoint(
        big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    )
    c1 = c2.groupBy("w1").agg(F.sum("cnt2").cast("long").alias("cnt1"))
    s = F.expr(f"({_BIG_FP} * cnt1) DIV cnt2")
    return (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), ["w1"])
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("s").alias("surprisal_fp"),
            (F.sum("s").cast("double") / F.count(F.lit(1))).alias("mean_surprisal"),
        )
    )


# -- PII detection + redaction (customer contact cards) -----------------------

_PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_CUSTID_RE = "Customer#[0-9]+"
# deterministic synthetic phone digits (the trimmed testdata has no phone
# column): TPC-H's c_phone shape, derived from the keys with integer-only
# arithmetic so both engines build the identical fixture.
_PH_SQL = (
    "lpad(CAST(10 + c_nationkey % 25 AS VARCHAR), 2, '0') || '-' || "
    "lpad(CAST((c_custkey * 7919 + 104729) % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST((c_custkey * 6271 + 15485863) % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST((c_custkey * 4093 + 32452843) % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "text_pii_redact",
    oracle=f"""
WITH card AS (
  SELECT c_custkey,
         c_name || ' in segment ' || c_mktsegment
                || ' reachable at ' || {_PH_SQL} || '.' AS contact
  FROM customer)
SELECT c_custkey,
       CAST(len(regexp_extract_all(contact, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(contact, '{_CUSTID_RE}')) AS BIGINT) AS n_ids,
       CAST(len(regexp_extract_all(contact, '{_PHONE_RE}'))
            + len(regexp_extract_all(contact, '{_CUSTID_RE}')) AS BIGINT) AS n_pii,
       CAST(CASE WHEN regexp_matches(contact, '{_PHONE_RE}')
                      OR regexp_matches(contact, '{_CUSTID_RE}')
                 THEN 1 ELSE 0 END AS BIGINT) AS has_pii,
       regexp_replace(
           regexp_replace(contact, '{_PHONE_RE}', '[PHONE]', 'g'),
           '{_CUSTID_RE}', '[ID]', 'g') AS redacted
FROM card
""",
    doc="PII scrub over customer contact cards: phone / customer-id "
    "match counts and the fully redacted text.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrubbing stage every
    crawl-to-training pipeline runs before text leaves quarantine.
    The fixture is a free-text "contact card" per customer: the numeric
    id TPC-H embeds in ``c_name`` plus a deterministic phone-shaped
    string rebuilt identically in both engines (the trimmed testdata
    drops ``c_phone``), so the REGEXES, not the fixture, are what the
    oracle checks.

    Per row: per-pattern match counts (``regexp_extract_all`` with
    explicit group 0 — Spark's default group is 1), a has-PII flag, and
    the redacted text via chained ``regexp_replace``. No capture-group
    backreferences in the replacements — Spark ($1) and DuckDB/RE2 (\\1)
    disagree on that syntax, so redaction masks whole matches only.

    Scale: a pure shuffle-free map stage over one table — the regexes
    compile once per task into DFA/NFA automata and stream row-by-row
    inside WholeStageCodegen, so at 100 TB this pipelines into the
    writer at scan speed. Real deployments swap the two literals for a
    few dozen patterns (email, SSN, IP, credit card with a Luhn
    post-check); the plan shape is unchanged.
    Reference scope: extends SURVEY.md SS2.2's LLM-curation family.
    """
    cust = load_table(spark, sf_dir, "customer")
    phone = F.concat_ws(
        "-",
        F.lpad((F.lit(10) + F.col("c_nationkey") % 25).cast("string"), 2, "0"),
        F.lpad(((F.col("c_custkey") * 7919 + 104729) % 1000).cast("string"), 3, "0"),
        F.lpad(((F.col("c_custkey") * 6271 + 15485863) % 1000).cast("string"), 3, "0"),
        F.lpad(((F.col("c_custkey") * 4093 + 32452843) % 10000).cast("string"), 4, "0"),
    )
    contact = F.concat(
        F.col("c_name"),
        F.lit(" in segment "),
        F.col("c_mktsegment"),
        F.lit(" reachable at "),
        phone,
        F.lit("."),
    )
    card = cust.select("c_custkey", contact.alias("contact"))
    n_phones = F.size(F.regexp_extract_all("contact", F.lit(_PHONE_RE), 0))
    n_ids = F.size(F.regexp_extract_all("contact", F.lit(_CUSTID_RE), 0))
    return card.select(
        "c_custkey",
        n_phones.cast("long").alias("n_phones"),
        n_ids.cast("long").alias("n_ids"),
        (n_phones + n_ids).cast("long").alias("n_pii"),
        F.when((n_phones > 0) | (n_ids > 0), 1).otherwise(0).cast("long").alias(
            "has_pii"
        ),
        F.regexp_replace(
            F.regexp_replace("contact", _PHONE_RE, "[PHONE]"), _CUSTID_RE, "[ID]"
        ).alias("redacted"),
    )
