"""Local replica of the driver's DuckDB oracle comparison.

For each registered query: run the Spark DataFrame and the oracle SQL on
the same parquet tables, then compare row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted by all
columns, exact equality — floats included, since both engines must
produce bit-identical doubles under our determinism rules)."""

from __future__ import annotations

import decimal
import math
import os
from datetime import date, datetime

import duckdb

from eventlog_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        conn.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return conn


def _norm_value(v):
    if v is None:
        return ""
    if isinstance(v, decimal.Decimal):
        # scale-insensitive: 1.50 == 1.5
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, date):
        return f"ts:{datetime(v.year, v.month, v.day).isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return f"s:{v}"


def _canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sp_cols = [f.name for f in spark_df.schema.fields]
    sp_rows = [tuple(r) for r in spark_df.collect()]

    conn = duckdb_conn(sf_dir)
    try:
        res = conn.execute(oracle_sql)
        db_cols = [d[0] for d in res.description]
        db_rows = res.fetchall()
    finally:
        conn.close()

    if sorted(c.lower() for c in sp_cols) != sorted(c.lower() for c in db_cols):
        return False, f"schema mismatch: spark={sorted(sp_cols)} duckdb={sorted(db_cols)}"
    if len(sp_rows) != len(db_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duckdb={len(db_rows)}"
    a = _canon(sp_rows, [c.lower() for c in sp_cols])
    b = _canon(db_rows, [c.lower() for c in db_cols])
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
