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

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import-time side effect)."""
    global _loaded
    if _loaded:
        return
    from .operators import relational  # noqa: F401
    from .operators import tpch  # noqa: F401
    from .operators import tpch2  # noqa: F401
    from .operators import advanced  # noqa: F401
    from .operators import approx  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import text  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import streamlike  # noqa: F401
    from .operators import pipeline  # noqa: F401
    from .operators import udf  # noqa: F401
    from . import logqueries  # noqa: F401

    _loaded = True
