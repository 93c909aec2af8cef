#!/usr/bin/env python
"""Synthesize an sf1 rehearsal dataset (~10× sf0.1) inside the repo.

The driver ships sf{0.001,0.01,0.1} only; the scale rehearsal
(BASELINE.md) wants one order of magnitude more to surface memory
cliffs the plan inventory can't see (IVF-PQ's multi-join DAG, tiled
cosine tile sizing, shuffle spill thresholds). This replicates sf0.1
REPLICAS× with consistent key offsets — every foreign key is shifted by
the same stride as its referenced table, so join selectivities, group
cardinalities per key, and planted near-dup structure are preserved
exactly; only table sizes (and distinct-key counts) scale.

Dimension tables (region, nation) stay fixed — as in TPC-H, where
nation/region are scale-invariant.

Output: /root/repo/.bench/sf1/*.parquet (git-ignored). Usage:

    python tools/make_sf1.py                      # sf1 (10x), the default
    python tools/make_sf1.py --replicas 30 --name sf3   # the next decade
    SPARK_GRAFT_SF_DIR=/root/repo/.bench/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench"
)


def _arg(flag: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default
    )


REPLICAS = int(_arg("--replicas", "10"))
DST = os.path.join(_BENCH, _arg("--name", "sf1"))

# per-table: (key columns to offset, stride source table)  — stride =
# max(key)+1 of the REFERENCED table so copies never collide
STRIDES = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    strides = {
        t: con.execute(f"SELECT MAX({k}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
        for t, k in KEY_OF.items()
    }
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied (dimension, unscaled)")
    for t, keys in STRIDES.items():
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]

        def expr(c: str) -> str:
            if c in keys:
                return f"{c} + r.i * {strides[keys[c]]} AS {c}"
            # replica-perturb content columns so copies are NOT
            # cross-replica near-duplicates (which would quadratically
            # inflate every pairwise dedup stage beyond anything a real
            # 10× corpus would do): words get a replica suffix (new
            # vocab per replica — exactly what a larger crawl adds),
            # embeddings get one replica-dependent dimension bumped
            # (rotates the vector away from its copies).
            if t == "documents" and c == "text":
                return (
                    "CASE WHEN r.i = 0 THEN text ELSE array_to_string("
                    "list_transform(string_split(text, ' '),"
                    " x -> x || 'r' || r.i), ' ') END AS text"
                )
            if t == "embeddings" and c == "embedding":
                return (
                    "CASE WHEN r.i = 0 THEN embedding ELSE "
                    "list_transform(range(1, len(embedding) + 1), "
                    "j -> CAST(CASE WHEN (j - 1) = (vec_id + r.i) % 64 "
                    "THEN embedding[j] + 0.7 * r.i ELSE embedding[j] END AS FLOAT)) "
                    "END AS embedding"
                )
            return c

        sel = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', range(0, {REPLICAS}) r(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
