"""Sources & sinks beyond the native parquet log (SURVEY §2.2 row 1-2).

The reference's only source/sink is its binary file + HTTP JSON out
(O21-O24); a Spark engine should meet data where it lives. Everything
here is schema-enforced (never schema inference on a 100 TB directory —
one pass to infer is one pass too many) and returns/consumes the
``(label, payload)`` event shape used by ``EventLog.append_dataframe``
and ``streaming.append_stream``.

Sinks render the reference's public JSON shape: hex versions and
RFC3339 timestamps (api/fasthttp/serve.go:227-247), derived with
built-in column expressions — export runs at full cluster parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.versioning import version_to_hex
from ..log import EventLog

EVENT_INPUT_SCHEMA = "label string, payload string"


def events_from_jsonl(
    spark: SparkSession,
    path: str,
    label_field: str = "label",
    payload_field: str = "payload",
) -> DataFrame:
    """JSON-lines ingest. Each line is an object with a label field and
    either a string payload field or an arbitrary object payload (which
    is re-serialized to its canonical JSON text). Explicit schema: the
    label is read as a string and the payload subtree is captured raw
    via the line text, so no inference pass runs."""
    lines = spark.read.text(path)
    label = F.get_json_object("value", f"$.{label_field}").alias("label")
    payload = F.get_json_object("value", f"$.{payload_field}").alias("payload")
    return lines.select(label, payload)


def events_from_csv(
    spark: SparkSession,
    path: str,
    label_col: str = "label",
    payload_col: str = "payload",
) -> DataFrame:
    """CSV ingest with a fixed two-column schema (header expected).
    RFC 4180 quoting: embedded quotes are doubled, so the escape char is
    '"' (Spark's default is backslash)."""
    df = (
        spark.read.schema(f"{label_col} string, {payload_col} string")
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )
    return df.select(
        F.col(label_col).alias("label"), F.col(payload_col).alias("payload")
    )


def events_from_wire_bytes(spark: SparkSession, body: bytes) -> DataFrame:
    """The reference's binary push format (O24, msgcodec.go) decoded at
    the ingestion edge into an event DataFrame. Bodies arrive per HTTP
    request (≤ MiBs) — driver-side decode, exactly like the reference
    decodes on the serving goroutine."""
    from ..wire import decode

    return spark.createDataFrame(decode(body), EVENT_INPUT_SCHEMA)


def _public_projection(df: DataFrame) -> DataFrame:
    """Envelope → the reference's public JSON shape: hex versions
    (internal/hex/writeUint64.go), RFC3339 UTC time (serve.go:227-231),
    raw payload passthrough.

    ``date_format`` renders in the SESSION timezone, so UTC output is
    pinned by shifting the instant by the session zone's offset first
    (identity when the session is already UTC, as this engine's
    ``get_spark`` configures) and appending a literal 'Z'."""
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    ts = F.timestamp_seconds("timestamp")
    if session_tz not in ("UTC", "Etc/UTC", "GMT", "Z"):
        ts = F.to_utc_timestamp(ts, session_tz)
    return df.select(
        version_to_hex("version").alias("version"),
        F.when(F.col("version_prev") == 0, F.lit("0"))
        .otherwise(version_to_hex("version_prev"))
        .alias("version-previous"),
        F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")
        ).alias("time"),
        "label",
        "payload",
    )


def export_log_jsonl(log: EventLog, out_path: str) -> None:
    """Dump the committed log as JSON-lines in the public shape — the
    batch twin of the HTTP scan response, written with full parallelism
    (each task serializes its own partition; no driver funnel)."""
    _public_projection(log.dataframe()).write.mode("overwrite").json(out_path)


def export_log_parquet(log: EventLog, out_path: str, partitions: int | None = None) -> None:
    """Dump the committed log as version-ordered parquet (e.g. to hand
    a snapshot to another system). Range-partitioning by version keeps
    file-level min/max stats aligned with scan predicates."""
    df = log.dataframe()
    if partitions:
        df = df.repartitionByRange(partitions, "version")
    df.write.mode("overwrite").parquet(out_path)
