"""Local replica of the driver's DuckDB oracle comparison — STRICT.

Mirrors what the driver actually does (learned from CORRECTNESS_r01):
both sides are converted to pandas (Spark ``toPandas()``, DuckDB
``.df()``), columns sorted by name, and values compared by their string
rendering. No decimal normalization, no dtype forgiveness — DuckDB's
pandas path coerces DECIMAL/HUGEINT to float64, so a Spark-side
``Decimal('253942.00')`` vs a DuckDB ``253942.0`` is a FAILURE here,
exactly as it is in the driver's hash. Queries must canonicalize their
final output dtypes (see ``queries.canonicalize_output``).
"""

from __future__ import annotations

import math
import os

import duckdb

from eventlog_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        conn.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return conn


def _render(v) -> str:
    """Driver-style value rendering: str() of the pandas-converted cell."""
    if v is None:
        return "None"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return str(v)


def _canon_pdf(pdf) -> tuple[list[str], list[tuple], list[str]]:
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    # Series.tolist() converts numpy scalars to native Python objects
    # (np.float64→float, np.int64→int, datetime64→pd.Timestamp), which is
    # the rendering surface the driver hashes.
    col_vals = [pdf[c].tolist() for c in cols]
    rows = [tuple(_render(col[i]) for col in col_vals) for i in range(len(pdf))]
    rows.sort()
    dtypes = [str(pdf[c].dtype) for c in cols]
    return cols, rows, dtypes


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sp_pdf = spark_df.toPandas()

    conn = duckdb_conn(sf_dir)
    try:
        db_pdf = conn.execute(oracle_sql).df()
    finally:
        conn.close()

    sp_cols, sp_rows, sp_dt = _canon_pdf(sp_pdf)
    db_cols, db_rows, db_dt = _canon_pdf(db_pdf)

    if [c.lower() for c in sp_cols] != [c.lower() for c in db_cols]:
        return False, f"schema mismatch: spark={sp_cols} duckdb={db_cols}"
    if len(sp_rows) != len(db_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duckdb={len(db_rows)}"
    if sp_rows != db_rows:
        diffs = [
            (x, y) for x, y in zip(sp_rows, db_rows) if x != y
        ][:3]
        return False, (
            f"value mismatch; dtypes spark={dict(zip(sp_cols, sp_dt))} "
            f"duckdb={dict(zip(db_cols, db_dt))}; first diffs: {diffs}"
        )
    return True, "ok"
