"""Dense gapless sequence assignment at cluster scale.

Spark has no ``monotonically_increasing_dense_id``; the naive fix —
``row_number()`` over an unpartitioned window — funnels every row
through ONE task, which is exactly the bottleneck a 100 TB ingest
cannot afford. Even ``row_number() over (partition by pid)`` hash-
shuffles the full dataset on pid.

The shuffle-free technique used here decomposes Spark's
``monotonically_increasing_id()`` (== partition_id * 2^33 + row index
within the partition, a stable documented layout):

1. narrow map: tag each row with (pid, rn) from the id — zero shuffle;
2. ``groupBy(pid).count()`` — partial aggregation means the shuffle
   carries ONE row per (input partition × reducer), trivially small;
3. exclusive prefix sums on the driver (≤ #partitions values);
4. broadcast-join offsets back: ``version = base + offset[pid] + rn + 1``.

The resulting order is partition-major: stable, dense, gapless — all
the reference's version contract requires (versions are opaque,
SURVEY §1.1). Pass ``order_cols`` for a meaningful total order (costs
a range-partitioning sort shuffle, still never a 1-task funnel).

Determinism caveat: the ids must come from one stable scan. Within a
single write job (our use: EventLog.append_dataframe commits) that
holds; across separate actions, persist first.

Also here: the hex version codec (O25, reference
internal/hex/readUint64.go, writeUint64.go) — versions render as
lowercase hex strings at the API edge.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTITION_BITS = 33  # monotonically_increasing_id: id = pid << 33 | row_idx


@dataclass
class VersionedBatch:
    """Result of :func:`with_dense_versions_counted`.

    ``df``: input + dense version column. ``total``: exact row count
    (free from the per-partition count pass — the committer publishes the
    new head without re-scanning). ``invalid``: rows failing
    ``valid_col`` (0 when not requested) — folded into the same count
    pass so validation costs no extra job. ``unpersist``: release the
    cached tagged frame once the last downstream action has run."""

    df: DataFrame
    total: int
    invalid: int
    unpersist: Callable[[], None]


def with_dense_versions(
    df: DataFrame,
    base: int = 0,
    col_name: str = "version",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Add a dense 1-based sequence column ``base+1 .. base+count``."""
    batch = with_dense_versions_counted(df, base, col_name, order_cols)
    batch.unpersist()
    return batch.df


def with_dense_versions_counted(
    df: DataFrame,
    base: int = 0,
    col_name: str = "version",
    order_cols: list[str] | None = None,
    persist: bool = False,
    valid_col: str | None = None,
) -> VersionedBatch:
    """Dense versioning with the count pass doubling as a validity audit.

    With ``persist=True`` the post-shuffle tagged frame is cached, so the
    count pass *and* every later action on the returned frame (the final
    write) reuse one materialization instead of re-running the upstream
    scan/shuffle. With ``valid_col`` set (a boolean column present on
    ``df``), invalid rows are tallied inside the same per-partition
    aggregate — no separate probe job."""
    if order_cols:
        df = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)

    mask = (1 << _PARTITION_BITS) - 1
    numbered = (
        df.withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", _PARTITION_BITS).cast("int"))
        .withColumn("_rn", F.col("_mid").bitwiseAND(F.lit(mask)))
        .drop("_mid")
    )
    if persist:
        numbered = numbered.persist()

    aggs = [F.count(F.lit(1)).alias("count")]
    if valid_col is not None:
        aggs.append(
            F.sum(F.when(~F.col(valid_col), 1).otherwise(0)).alias("invalid")
        )
    counts = numbered.groupBy("_pid").agg(*aggs).collect()  # ≤ #partitions rows
    offsets: list[tuple[int, int]] = []
    acc = 0
    bad = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
        if valid_col is not None:
            bad += int(row["invalid"] or 0)

    spark = df.sparkSession
    offset_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _offset long")
    out = (
        numbered.join(F.broadcast(offset_df), "_pid", "left")
        .withColumn(
            col_name,
            F.lit(base) + F.coalesce("_offset", F.lit(0)) + F.col("_rn") + F.lit(1),
        )
        .drop("_pid", "_rn", "_offset")
    )
    unpersist = (lambda: numbered.unpersist()) if persist else (lambda: None)
    return VersionedBatch(df=out, total=acc, invalid=bad, unpersist=unpersist)


# -- hex version codec (O25) -------------------------------------------------


def version_to_hex(col: Column | str) -> Column:
    """uint64 → lowercase variable-length hex (reference writeUint64.go:11-33)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.hex(c))


def hex_to_version(col: Column | str) -> Column:
    """lowercase hex string → long (reference readUint64.go:13-31)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(c, 16, 10).cast("long")


def py_version_to_hex(v: int) -> str:
    return format(v, "x")


def py_hex_to_version(s: str) -> int:
    return int(s, 16)
