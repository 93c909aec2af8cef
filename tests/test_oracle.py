"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is a local replica of the driver's t2 correctness gate (which runs
at sf0.01) — kept at sf0.001 so the suite stays fast."""

from __future__ import annotations

import pytest

from eventlog_spark.queries import REGISTRY, _ensure_loaded
from tests.oracle_utils import compare

_ensure_loaded()
_ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
_ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema.fields  # stable schema
