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
# ROUND-9 ROTATION (executes the registry's own round-9 note + the r8
# verdict's item 4): every query is cumulatively green (186/186, zero
# latest-red), so the window is freshness-driven:
# (a) the 7 rows deferred from the round-8 window, last checked round 4
#     (the ledger's oldest): tfidf_top_terms, vocab_topk,
#     zorder_layout_key, text_repetition_score, sketch_bloom_filter,
#     sketch_count_min, scd2_user_state;
# (b) the ENTIRE round-5 cohort (30 rows — TPC-H q1-q3/q5/q9-q12/q18,
#     subquery_*, window rank/range/sessionize, stream_real available/
#     restart/stateful + sliding, multimodal decode/frame/header,
#     pivot, full-outer join, dedup exact/simhash, pagerank, PQ-ADC,
#     pipeline_curate, UDAF/UDTF);
# (c) the 9 log-family queries — the storage layer changed AGAIN this
#     round (page-level label summaries, bounded label pages,
#     commit-intent O(1) opens, checkpoint-hint pointers, the CAS
#     commit arbiter), so everything that appends/scans/audits through
#     the engine re-proves on the new paths;
# (d) 3 of the 49 round-6 rows (the next-oldest cohort) to fill the
#     window: ann_hard_negatives, corpus_diversity_simpson, setop_union
#     (timeseries_gapfill deferred to round 10 — its slot went to the
#     NEW query below);
# (e) the NEW round-9 query log_compact_label_clustered (the
#     OPTIMIZE-ZORDER layout demo — new queries always front).
# ROUND-10 NOTE: rotate in the remaining 45 r6 rows across rounds 10-11
# (they are the oldest cohort once this window lands), plus anything
# round 10 touches and any new queries.
_FIRST_50 = [
    # (a) the 7 deferred round-4 rows — the ledger's oldest
    "tfidf_top_terms",
    "vocab_topk",
    "zorder_layout_key",
    "text_repetition_score",
    "sketch_bloom_filter",
    "sketch_count_min",
    "scd2_user_state",
    # (c) storage layer changed again — whole log family re-proves
    "eventlog_engine_roundtrip",
    "eventlog_inmem_roundtrip",
    "eventlog_binary_roundtrip",
    "log_integrity_audit",
    "log_scan_forward",
    "log_scan_label_pruned",
    "log_scan_reverse",
    "log_scan_skip_first",
    "log_version_bounds",
    # (b) the full round-5 cohort (30)
    "ann_pq_adc_topk",
    "dedup_exact",
    "dedup_simhash",
    "graph_pagerank",
    "join_full_outer",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_header_probe",
    "pipeline_curate",
    "pivot_returnflag",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipping_priority",
    "q18_large_volume_customer",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "stream_real_availablenow",
    "stream_real_restart",
    "stream_real_stateful",
    "stream_sliding_window",
    "subquery_above_group_avg",
    "subquery_argmin_per_group",
    "udaf_pandas_weighted_avg",
    "udtf_span_split",
    "window_range_frame",
    "window_rank_suite",
    "window_sessionize",
    # (e) NEW round 9: the label-clustered-compaction layout demo
    "log_compact_label_clustered",
    # (d) round-6 fillers — the next-oldest cohort
    "ann_hard_negatives",
    "corpus_diversity_simpson",
    "setop_union",
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
