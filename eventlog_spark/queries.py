"""Central query registry — the driver-checked surface.

Every implemented operator from SURVEY.md §2 is exposed here as a named
query: a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL can
express it) an equivalent ANSI-SQL oracle string that DuckDB runs on the
same parquet tables. The driver hash-compares both sides at sf0.01.

Determinism rules used throughout (so value-hashes match across engines):

* Money aggregates cast inputs to ``DECIMAL(12,2)`` *before* summing —
  decimal addition is exact and order-independent, unlike double sums
  which vary with partition order.
* Averages are computed as ``CAST(decimal_sum AS DOUBLE) / count`` —
  both engines then divide identical doubles by identical longs.
* No ``ROUND`` on doubles (Spark rounds HALF_UP, DuckDB HALF_EVEN).
* Every computed column is aliased identically in both dialects.
* Session timezone is UTC on the Spark side (session.py) to match DuckDB.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def canonicalize_output(df: DataFrame) -> DataFrame:
    """Canonicalize FINAL output dtypes so pandas renders both engines
    identically (the driver hash-compares pandas-converted values):

    * DECIMAL → DOUBLE. Decimal math stays exact inside the plan
      (order-independent sums); only the top-of-plan column is cast.
      DuckDB's pandas path coerces DECIMAL to float64, so a Spark-side
      Decimal would render ``253942.00`` vs DuckDB's ``253942.0``.
    * TIMESTAMP_NTZ → TIMESTAMP (session TZ is UTC, value-identical).
    * DATE → TIMESTAMP (midnight): Spark's toPandas renders DATE as
      datetime.date ("2024-01-01") while DuckDB's .df() coerces DATE to
      datetime64 ("2024-01-01 00:00:00"); both render the timestamp
      form identically.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType, DecimalType, TimestampNTZType

    exprs, changed = [], False
    for f in df.schema.fields:
        if isinstance(f.dataType, DecimalType):
            exprs.append(F.col(f.name).cast("double").alias(f.name))
            changed = True
        elif isinstance(f.dataType, (TimestampNTZType, DateType)):
            exprs.append(F.col(f.name).cast("timestamp").alias(f.name))
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return canonicalize_output(fn(spark, sf_dir))

        REGISTRY[name] = QuerySpec(fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_loaded = False

# The driver produces CORRECTNESS rows for exactly the FIRST 50 registry
# entries, so registration order is part of the verification surface.
# The only query with catalog side effects (join_bucketed_colocated)
# goes dead LAST so a harness abort there cannot cost any other query
# its row.
#
# ROUND-10 ROTATION (executes the registry's round-10 note + the r9
# verdict's item 1): every query is cumulatively green (187/187, zero
# latest-red), so the window is freshness- and touch-driven:
# (a) the 10 log-family queries — the storage layer changed AGAIN this
#     round (compact snapshot-first fence under CAS, bulk _write_out
#     staging-dir rewrite with exact-name intents, bulk-loser in-memory
#     unwind incl. stream-txn markers, arbiter persisted in the meta
#     file at create), so everything that creates/appends/scans/
#     compacts through the engine re-proves on the new paths;
# (b) 40 of the 45 rotatable round-6 rows (the oldest cohort),
#     including twice-deferred timeseries_gapfill; deferred to round 11
#     (simple relational ops, lowest regression surface): setop_except,
#     setop_intersect, topk_orders, unpivot_lineitem_metrics,
#     window_topk_per_group. join_bucketed_colocated stays pinned in
#     _LAST (side-effectful) and is checked by its own suite tests.
# ROUND-11 NOTE: rotate in the 5 deferred r6 rows above plus the
# round-7 cohort's oldest, plus anything round 11 touches.
_FIRST_50 = [
    # (a) storage layer changed again - whole log family re-proves
    "eventlog_engine_roundtrip",
    "eventlog_inmem_roundtrip",
    "eventlog_binary_roundtrip",
    "log_integrity_audit",
    "log_scan_forward",
    "log_scan_label_pruned",
    "log_scan_reverse",
    "log_scan_skip_first",
    "log_version_bounds",
    "log_compact_label_clustered",
    # (b) the 40 oldest round-6 rows
    "ann_ivf_pq",
    "ann_ivf_probed",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "ann_matryoshka_probe",
    "ann_range_search",
    "ann_topk_bruteforce",
    "corpus_epoch_plan",
    "corpus_ngram_novelty",
    "corpus_padding_waste",
    "decontaminate_semantic",
    "dedup_connected_components",
    "dedup_incremental_minhash",
    "dedup_keep_best",
    "dedup_lsh_verified",
    "dedup_minhash_calibration",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_substring_exact",
    "embedding_cluster_resample",
    "embedding_isolation_audit",
    "graph_triangle_count",
    "hybrid_rrf_fusion",
    "integrity_adjacent_skewed",
    "mixture_reweight_excess",
    "multimodal_audio_decode",
    "multimodal_image_decode",
    "q21_waiting_suppliers",
    "quality_probe_eval",
    "quality_probe_train",
    "sample_importance_dsir",
    "split_leakage_audit",
    "stream_real_join",
    "stream_real_watermark_drop",
    "text_bpe_encode",
    "text_bpe_roundtrip",
    "text_bpe_train",
    "text_pii_redact",
    "text_tokenizer_fertility",
    "timeseries_gapfill",
]

# catalog side effects (SparkSQL bucketed-table DDL) — dead last in the
# whole registry so a harness abort there cannot cost any query its row
_LAST: list[str] = ["join_bucketed_colocated"]


def _ensure_loaded() -> None:
    """Import every module that registers queries (import-time side effect),
    then reorder the registry: family-covering first 50, side-effectful
    catalog demo last."""
    global _loaded
    if _loaded:
        return
    from .operators import relational  # noqa: F401
    from .operators import tpch  # noqa: F401
    from .operators import tpch2  # noqa: F401
    from .operators import advanced  # noqa: F401
    from .operators import approx  # noqa: F401
    from .operators import analytics  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import curation  # noqa: F401
    from .operators import bpe_scale  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import text  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import streamlike  # noqa: F401
    from .operators import pipeline  # noqa: F401
    from .operators import udf  # noqa: F401
    from .operators import recall  # noqa: F401  (composes similarity+curation oracles)
    from . import logqueries  # noqa: F401

    missing = [n for n in _FIRST_50 + _LAST if n not in REGISTRY]
    assert not missing, f"registry reorder references unknown queries: {missing}"
    assert len(_FIRST_50) == 50, f"driver checks exactly 50: {len(_FIRST_50)}"
    middle = [n for n in REGISTRY if n not in _FIRST_50 and n not in _LAST]
    ordered = _FIRST_50 + middle + _LAST
    reordered = {name: REGISTRY[name] for name in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)

    _loaded = True
