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
# ROUND-11 ROTATION (executes the registry's round-11 note + the r10
# verdict's item 1): every query is cumulatively green (187/187, zero
# latest-red), so the window is freshness- and touch-driven:
# (a) the 10 log-family queries — the storage layer changed AGAIN this
#     round (round-10 advice: _sync_manifest_to_pointer now adopts the
#     pointer head + rolled-forward delta head so (files, head) pairs
#     are consistent; compact captures its snapshot pair atomically
#     under the RLock; the arbiter rides in create()'s INITIAL meta
#     write behind a _BOOTSTRAP sentinel open; legacy-log arbiter
#     adoption is arbitrated by an exclusive-create claim sidecar), so
#     everything that creates/opens/appends/scans/compacts through the
#     engine re-proves on the new paths;
# (b) the 5 rows deferred from round 6 (setop_except, setop_intersect,
#     topk_orders, unpivot_lineitem_metrics, window_topk_per_group);
# (c) 35 of the 50 round-7 rows (now the oldest cohort); deferred to
#     round 12 (pure deterministic relational ops, lowest regression
#     surface, same rationale as the r10 deferral): the 12 TPC-H rows
#     q4/q6/q7/q8/q13/q14/q15/q16/q17/q19/q20/q22 plus date_functions,
#     scalar_functions, window_running_total.
#     join_bucketed_colocated stays pinned in _LAST (side-effectful)
#     and is checked by its own suite tests.
# ROUND-12 NOTE: rotate in the 15 deferred r7 rows above plus the
# oldest round-8 cohort, plus anything round 12 touches.
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
    # (b) the 5 rows deferred from round 6
    "setop_except",
    "setop_intersect",
    "topk_orders",
    "unpivot_lineitem_metrics",
    "window_topk_per_group",
    # (c) 35 of the round-7 cohort, oldest first surface
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup",
    "approx_distinct_hll",
    "approx_distinct_kmv",
    "array_collect_ops",
    "chunk_overlap_windows",
    "dedup_embedding_cosine",
    "explode_unnest",
    "join_anti",
    "join_asof",
    "join_broadcast_dim",
    "join_range",
    "join_semi",
    "join_skew_salted",
    "json_extract",
    "multimodal_jpeg_decode",
    "multimodal_video_frames",
    "multimodal_video_scene_cuts",
    "stream_dedup",
    "stream_interval_join",
    "stream_session_window",
    "stream_static_enrich",
    "stream_threshold_alert",
    "stream_tumbling_window",
    "text_bpe_encode_scaled",
    "text_bpe_train_scaled",
    "text_fingerprint",
    "text_lang_stats",
    "text_quality",
    "text_rolling_hash",
    "text_token_count",
    "timeseries_rollup",
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
