"""Scalable BPE tokenizer training — the ITERATIVE per-round-materialized
trainer (round-6 verdict item 1).

``curation.text_bpe_train`` demonstrates the merge loop by UNROLLING all
rounds into one lazy plan — oracle-replayable, but its plan grows
linearly with merge count (126 Exchanges at 6 merges; a production 32k
merge vocabulary would never finish planning). This module is the form
that reaches production size:

* **Constant plan depth.** Each round ends in an EAGER
  ``localCheckpoint`` of the two state tables (vocabulary, pair counts),
  so round k+1's plan reads materialized partitions — the plan compiled
  per round is the same small tree no matter how many rounds ran.
  At cluster scale the boundary is a parquet/table write (the artifact
  layer persists the final state exactly so); ``localCheckpoint`` is the
  single-process rendition of that boundary.
* **Delta-maintained pair counts.** A merge only changes words that
  CONTAIN the merged pair, so each round recounts pairs for that
  (typically tiny) affected subset and applies the difference to the
  standing pair-count table — per-round cost is ∝ affected words, not
  |vocab|, the same incremental bookkeeping an in-memory trainer
  (Sennrich's learn_bpe, HF tokenizers) does with its pair index.
* **Exact reference merge semantics.** A merge applies as a greedy
  left-to-right FOLD over the symbol array (``F.aggregate``): in a run
  like ``a a a a a`` the pairs merge as ``aa aa a`` — matching
  Sennrich's tokenizer exactly. (The unrolled demo applies merges as a
  non-overlapping string ``replace``, which under-merges repeated and
  alternating runs — a documented deviation there; here the semantics
  are the real thing, golden-tested against a pure-Python reference
  trainer.)
* **Driver round trip = control plane only.** The one ``collect`` per
  round fetches the argmax PAIR (a single row) to drive the loop and
  parameterize the next round's expressions as literals — the same
  justified control-plane read as the IVF-PQ query router
  (curation.py); symbol data never leaves the executors.

Reference parity: the reference engine has no tokenizer; this is part
of the LLM-pipeline surface the task mandates. The registered query
``text_bpe_train_scaled`` trains BPE_SCALED_MERGES rounds and is
hash-checked against a generated DuckDB oracle that replays every round
with the SAME fold semantics (``list_reduce`` over a string
accumulator). ``tools/bpe_scale_probe.py`` measures per-round cost and
plan size flat in round count at a few hundred merges (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table

BPE_SCALED_MERGES = 16


# -- merge-application kernels (shared by trainer and tests) -------------------


def merge_fold_expr(arr, left: str, right: str):
    """Greedy left-to-right application of merge ``(left, right)`` to a
    symbol array: scan symbols, and whenever the accumulator's last
    symbol is ``left`` and the incoming one is ``right``, replace the
    tail with the merged symbol — the exact single-pass semantics of
    Sennrich's tokenizer. Pure Catalyst (``F.aggregate``), JVM-side,
    no Python in the data path. ``F.get`` (NULL off either end) keeps
    the expression total for empty/1-symbol arrays under ANSI mode."""
    lr = F.lit(left + right)
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lr)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def adjacent_pairs_expr(arr):
    """All adjacent symbol pairs of ``arr`` as ``"L R"`` strings
    (overlapping occurrences counted, like every BPE trainer).
    0-based ``F.get`` + an explicit size guard keep single-symbol
    words at an empty pair list instead of an ANSI index error."""
    return F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.concat_ws(" ", F.get(arr, i), F.get(arr, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def has_adjacent_expr(arr, left: str, right: str):
    """Does ``arr`` contain ``left`` immediately followed by ``right``?"""
    return F.exists(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda i: (F.get(arr, i) == F.lit(left))
        & (F.get(arr, i + 1) == F.lit(right)),
    ) & (F.size(arr) >= 2)


def _pair_counts(df: DataFrame) -> DataFrame:
    """(word, cnt, syms) → (pair, total): adjacent pairs weighted by
    word count. Map-side combine does the heavy lifting; the shuffle
    carries pair strings, never words."""
    return (
        df.select(F.explode(adjacent_pairs_expr(F.col("syms"))).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("total"))
    )


def initial_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → vocabulary with character-symbol arrays. One token
    shuffle with map-side combine; everything after is vocab-sized
    (the corpus is never touched again — at 100 TB training cost
    depends on |vocab|, not tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word",
            "cnt",
            F.split(
                F.trim(F.regexp_replace("word", "(.)", "$1 ")), " "
            ).alias("syms"),
        )
    )


def bpe_train_iterative(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int,
    *,
    min_count: int = 1,
    on_round=None,
    vocab_df: DataFrame | None = None,
    snapshot_dir: str | None = None,
    snapshot_every: int = 0,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train ``n_merges`` BPE rounds; return (merge table rows, final
    vocabulary DataFrame). Stops early when no pair reaches
    ``min_count``. ``on_round(k, pair, total)`` is a per-round progress
    hook (the scale probe uses it to time rounds).

    Loop shape per round — THREE bounded jobs, independent of how many
    rounds preceded:
      1. argmax over the standing pair-count table (1-row collect);
      2. rebuild + checkpoint the vocabulary: untouched words pass
         through, affected words (those containing the pair) get the
         fold applied;
      3. delta-update + checkpoint the pair counts: subtract affected
         words' old pairs, add their new ones — identical by
         construction to a from-scratch recount, at the cost of the
         affected subset only.

    ``vocab_df`` overrides the corpus-derived vocabulary with a caller-
    supplied (word, cnt, syms) frame — tools/bpe_scale_probe.py uses it
    to measure cost against synthetic vocabularies far larger than the
    testdata's 30 distinct words.

    ``snapshot_dir`` + ``snapshot_every=K``: every K completed rounds
    the full training state (vocab, pair counts, merge table, round
    number) is written to parquet under a round-stamped directory, then
    published by an ATOMIC pointer-file replace (``LATEST``) — a crash
    at any instant leaves either the previous snapshot or the new one
    reachable, never neither — and a later call with the same
    ``snapshot_dir`` RESUMES from the pointed-to snapshot instead of
    round 0: a 32k-merge production run survives preemption at the cost
    of one table write per K rounds (resume is tested bit-identical to
    an uninterrupted run). Superseded and crash-orphaned snapshot dirs
    are swept after each successful publish. The in-loop
    localCheckpoints remain the fast per-round boundary; snapshots are
    the durable one. A snapshot resumes ONLY the run shape it saved:
    passing ``vocab_df`` together with an existing snapshot, or asking
    for fewer rounds than the snapshot already contains, raises
    ValueError instead of silently returning mismatched state.
    """
    import contextlib
    import json as _json
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    merges: list[tuple[int, str, str, int]] = []
    start_k = 0
    snap = None
    if snapshot_dir:
        _os.makedirs(snapshot_dir, exist_ok=True)
        ptr = _os.path.join(snapshot_dir, "LATEST")
        try:
            with open(ptr) as f:
                snap = _os.path.join(snapshot_dir, f.read().strip())
        except FileNotFoundError:
            snap = None
    if snap and _os.path.exists(_os.path.join(snap, "STATE.json")):
        if vocab_df is not None:
            raise ValueError(
                "snapshot_dir already holds a snapshot; resuming it with a "
                "caller-supplied vocab_df would silently mix two runs — "
                "use a fresh snapshot_dir"
            )
        with open(_os.path.join(snap, "STATE.json")) as f:
            st = _json.load(f)
        start_k = int(st["k"])
        if start_k > n_merges:
            raise ValueError(
                f"snapshot is at round {start_k}, past the requested "
                f"n_merges={n_merges}; use a fresh snapshot_dir to train a "
                "smaller vocabulary"
            )
        merges = [tuple(m) for m in st["merges"]]
        vocab = spark.read.parquet(_os.path.join(snap, "vocab")).localCheckpoint(
            eager=True
        )
        pc = spark.read.parquet(_os.path.join(snap, "pc")).localCheckpoint(
            eager=True
        )
    else:
        vocab = (
            vocab_df if vocab_df is not None else initial_vocab(spark, sf_dir)
        ).localCheckpoint(eager=True)
        pc = _pair_counts(vocab).localCheckpoint(eager=True)
    # the untouched∪affected rebuild would double vocab's partition count
    # every round (2^k by round k); coalesce pins it to the initial
    # layout — a narrow dependency, no shuffle
    n_parts = vocab.rdd.getNumPartitions()

    def write_snapshot(k: int) -> None:
        # write under a dot-prefixed temp, rename to the final dir
        # (atomic dir publish), then REPLACE the pointer file (atomic on
        # POSIX) — the pointer flip is the single publish point, so a
        # crash anywhere leaves a reachable consistent snapshot
        dname = f"snapshot-{k}-{_uuid.uuid4().hex[:8]}"
        tmp = _os.path.join(snapshot_dir, "." + dname + ".tmp")
        vocab.write.mode("overwrite").parquet(_os.path.join(tmp, "vocab"))
        pc.write.mode("overwrite").parquet(_os.path.join(tmp, "pc"))
        with open(_os.path.join(tmp, "STATE.json"), "w") as f:
            _json.dump({"k": k, "merges": merges}, f)
        _os.rename(tmp, _os.path.join(snapshot_dir, dname))
        ptr_tmp = _os.path.join(snapshot_dir, f".LATEST.{_uuid.uuid4().hex}")
        with open(ptr_tmp, "w") as f:
            f.write(dname)
        _os.replace(ptr_tmp, _os.path.join(snapshot_dir, "LATEST"))
        # sweep superseded snapshots and crash-orphaned temps
        for d in _os.listdir(snapshot_dir):
            if d in (dname, "LATEST"):
                continue
            if d.startswith("snapshot-") or d.startswith("."):
                p = _os.path.join(snapshot_dir, d)
                if _os.path.isdir(p):
                    _shutil.rmtree(p, ignore_errors=True)
                else:
                    with contextlib.suppress(OSError):
                        _os.remove(p)

    for k in range(start_k + 1, n_merges + 1):
        top = pc.orderBy(F.col("total").desc(), "pair").limit(1).collect()
        if not top or top[0]["total"] < min_count:
            break
        pair, total = top[0]["pair"], int(top[0]["total"])
        left, right = pair.split(" ", 1)
        merges.append((k, pair, left + right, total))
        if on_round is not None:
            on_round(k, pair, total)
        arr = F.col("syms")
        has = has_adjacent_expr(arr, left, right)
        affected = vocab.where(has)
        old_pairs = affected.select(
            F.explode(adjacent_pairs_expr(arr)).alias("pair"),
            (-F.col("cnt")).alias("d"),
        )
        new_affected = affected.withColumn(
            "syms", merge_fold_expr(arr, left, right)
        )
        new_pairs = new_affected.select(
            F.explode(adjacent_pairs_expr(F.col("syms"))).alias("pair"),
            F.col("cnt").alias("d"),
        )
        vocab = (
            vocab.where(~has)
            .unionAll(new_affected)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
        pc = (
            pc.select("pair", F.col("total").alias("d"))
            .unionAll(old_pairs)
            .unionAll(new_pairs)
            .groupBy("pair")
            .agg(F.sum("d").cast("long").alias("total"))
            .where(F.col("total") > 0)
            .localCheckpoint(eager=True)
        )
        if snapshot_dir and snapshot_every and k % snapshot_every == 0:
            write_snapshot(k)
    return merges, vocab


# -- persisted artifact + registered query -------------------------------------


def _bpe_scaled_persisted(spark: SparkSession, sf_dir: str):
    """Offline-train/online-serve split, same shape as the ANN and demo
    BPE artifacts: the merge table and final vocabulary persist per
    (dataset fingerprint, params); later sessions serve from the tables
    without re-running the loop."""
    from .artifacts import persisted_bundle

    def build_all():
        merges, vocab = bpe_train_iterative(spark, sf_dir, BPE_SCALED_MERGES)
        mdf = spark.createDataFrame(
            merges, "rank int, pair string, merged string, total long"
        )
        return {
            "bpe_scaled_merges": mdf,
            "bpe_scaled_vocab": vocab.select(
                "word", "cnt", F.concat_ws(" ", "syms").alias("sym")
            ),
        }

    return persisted_bundle(
        spark,
        sf_dir,
        [("bpe_scaled_merges", None), ("bpe_scaled_vocab", None)],
        build_all,
        inputs=["documents"],
        params=f"bpe_scaled_v1_m{BPE_SCALED_MERGES}",
    )


def _fold_sql(acc: str, x: str, left: str, right: str) -> str:
    """DuckDB rendition of merge_fold_expr over a string accumulator
    (``' s1 s2 … '``): list_reduce is constrained to accumulator type ==
    element type, so the fold carries the space-joined prefix string and
    peels its last token with a constant regex."""
    last = f"regexp_extract({acc}, '([^ ]+) $', 1)"
    return (
        f"CASE WHEN {last} = {left} AND {x} = {right} "
        f"THEN left({acc}, len({acc}) - len({left}) - 1) || {left} || {right} || ' ' "
        f"ELSE {acc} || {x} || ' ' END"
    )


def _bpe_scaled_chain(rounds: int) -> str:
    """Generated DuckDB replay of the iterative trainer (CTE text only —
    the train and encode oracles both build on it): per round, a
    pair-count CTE, a 1-row argmax CTE, and a vocabulary CTE applying
    the merge via the list_reduce fold — the same greedy left-to-right
    semantics as the Spark trainer, so merge tables match to the hash.
    The vocabulary CTEs are MATERIALIZED: each v{k} is referenced twice
    (p{k+1} and v{k+1}), so DuckDB's default CTE inlining would expand
    the chain to 2^rounds copies of the base scan — the planner-side
    twin of the plan blowup this trainer exists to avoid."""
    parts = [
        """v0 AS MATERIALIZED (
    SELECT word, cnt,
           ' ' || array_to_string(list_transform(range(1, len(word) + 1),
                                  i -> substr(word, CAST(i AS INT), 1)), ' ')
               || ' ' AS sym
    FROM (
        SELECT word, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE len(word) >= 2
        GROUP BY word
    )
)"""
    ]
    for k in range(1, rounds + 1):
        fold = _fold_sql("acc", "x", "b.l", "b.r")
        parts.append(
            f"""p{k} AS (
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS total FROM (
        SELECT cnt,
               unnest(list_transform(range(1, len(arr)),
                      i -> arr[i] || ' ' || arr[i + 1])) AS pair
        FROM (SELECT cnt, string_split(trim(sym), ' ') AS arr FROM v{k - 1})
    ) GROUP BY pair
),
b{k} AS (
    SELECT pair, split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r,
           total
    FROM p{k} ORDER BY total DESC, pair LIMIT 1
),
v{k} AS MATERIALIZED (
    SELECT word, cnt,
           list_reduce(list_prepend(' ', string_split(trim(sym), ' ')),
                       (acc, x) -> {fold}) AS sym
    FROM v{k - 1} CROSS JOIN b{k} b
)"""
        )
    return ",\n".join(parts)


def _bpe_scaled_oracle(rounds: int) -> str:
    finals = "\n    UNION ALL\n".join(
        f"    SELECT CAST({k} AS INT) AS rank, pair, l || r AS merged, total FROM b{k}"
        for k in range(1, rounds + 1)
    )
    return (
        "WITH "
        + _bpe_scaled_chain(rounds)
        + f"\nSELECT rank, pair, merged, total FROM (\n{finals}\n) ORDER BY rank"
    )


@register(
    "text_bpe_train_scaled",
    oracle=_bpe_scaled_oracle(BPE_SCALED_MERGES),
    doc=f"Iterative BPE trainer at {BPE_SCALED_MERGES} merges: per-round "
    "materialized state (constant plan depth — the form that reaches a "
    "32k-merge production vocabulary), delta-maintained pair counts, "
    "exact Sennrich greedy-fold merge semantics.",
)
def text_bpe_train_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-shaped tokenizer trainer (see module docstring).
    Differences from the unrolled demo (``curation.text_bpe_train``):
    constant plan depth per round (eager checkpoint boundaries instead
    of one unrolled lazy plan), delta-maintained pair counts (per-round
    cost ∝ words containing the merged pair), and EXACT greedy
    left-to-right merge semantics (the demo's non-overlapping string
    replace under-merges repeated/alternating runs like ``banana``).
    The merge tables therefore legitimately diverge from the demo's
    after the first round whose pair recurs within a word; this one is
    the real tokenizer, golden-tested against a pure-Python reference
    trainer and hash-checked against a fold-semantics DuckDB replay."""
    return _bpe_scaled_persisted(spark, sf_dir)["bpe_scaled_merges"].orderBy(
        "rank"
    )


@register(
    "text_bpe_encode_scaled",
    oracle=f"""
WITH {_bpe_scaled_chain(BPE_SCALED_MERGES)},
tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
enc AS (
    SELECT t.doc_id,
           len(t.word) AS n_chars,
           CASE WHEN v.sym IS NULL THEN len(t.word)
                ELSE len(string_split(trim(v.sym), ' ')) END AS n_sym
    FROM tok t LEFT JOIN v{BPE_SCALED_MERGES} v ON t.word = v.word
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_char_tokens,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(n_chars) - SUM(n_sym) AS DOUBLE) / SUM(n_chars)
           AS compression
FROM enc GROUP BY doc_id
""",
    doc=f"Encode the corpus with the {BPE_SCALED_MERGES}-merge vocabulary "
    "trained by the ITERATIVE trainer (exact fold semantics): per-doc "
    "token counts and compression.",
)
def text_bpe_encode_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving half of the production tokenizer: the iterative
    trainer's persisted vocabulary broadcasts onto the token stream —
    encoding is a vocab JOIN, never a per-token merge loop; OOV words
    (the length-1 words training excludes) fall back to character
    symbols via the left-join NULL arm. Because the trainer's fold
    merges repeated/alternating runs correctly, segmentations (and so
    token counts) legitimately differ from the demo encoder's on words
    like ``banana`` — this pair is the one a production pipeline runs.
    Same two-stage shape at 100 TB: one broadcast-joined projection
    over the token stream plus the per-doc groupBy."""
    vocab = _bpe_scaled_persisted(spark, sf_dir)["bpe_scaled_vocab"]
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vsym = vocab.select(
        "word",
        F.size(F.split(F.trim(F.col("sym")), " ")).alias("v_n_sym"),
    )
    enc = tok.join(F.broadcast(vsym), "word", "left").select(
        "doc_id",
        F.length("word").alias("n_chars"),
        F.coalesce("v_n_sym", F.length("word")).alias("n_sym"),
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("n_chars").cast("long").alias("n_char_tokens"),
        F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        (
            (F.sum("n_chars") - F.sum("n_sym")).cast("double")
            / F.sum("n_chars")
        ).alias("compression"),
    )
