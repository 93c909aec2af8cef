"""Physical-plan auditing — the scale invariants as testable assertions.

SCALE.md makes concrete claims about every headline query: filters reach
the parquet scan, column pruning works, dimension joins broadcast,
top-k never globally sorts, per-group top-k uses WindowGroupLimit. These
helpers extract those facts from ``.explain("formatted")`` output so
tests/test_plans.py can enforce them — a plan regression (a lost
pushdown, a broadcast that degraded to a shuffle join) fails CI instead
of silently costing 100× at 100 TB.

The reference has no planner to audit (SURVEY §4); this is the Spark-
native replacement for its storage-level performance tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of the DataFrame's physical plan."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists, one string per scan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema struct of every file scan (column-pruning audit)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def has_node(df: DataFrame, node: str) -> bool:
    """Whether the physical plan contains an operator by (prefix) name,
    e.g. "BroadcastHashJoin", "TakeOrderedAndProject", "WindowGroupLimit"."""
    return bool(re.search(rf"\b{re.escape(node)}\b", formatted_plan(df)))


def count_nodes(df: DataFrame, node: str) -> int:
    """Number of occurrences of an operator in the plan tree (counts the
    numbered node list of EXPLAIN FORMATTED, not the summary tree)."""
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", formatted_plan(df)))
