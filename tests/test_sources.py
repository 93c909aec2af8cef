"""Source/sink adapters: JSONL + CSV + wire-bytes in, JSONL/parquet out."""

from __future__ import annotations

import json

from eventlog_spark import sources
from eventlog_spark.log import EventLog
from eventlog_spark.wire import encode


def _mklog(spark, tmp_path, name="log"):
    return EventLog.create(spark, str(tmp_path / name))


def test_events_from_jsonl(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"label":"sign-in","payload":{"user":"a","n":1}}\n'
        '{"label":"sign-out","payload":{"user":"b"}}\n'
    )
    log = _mklog(spark, tmp_path)
    df = sources.events_from_jsonl(spark, str(p))
    log.append_dataframe(df, on_invalid="error")
    got = {r.label: r.payload for r in log.scan().collect()}
    assert set(got) == {"sign-in", "sign-out"}
    assert json.loads(got["sign-in"]) == {"user": "a", "n": 1}


def test_events_from_csv(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text('label,payload\nclick,"{""x"":1}"\nview,"{""x"":2}"\n')
    log = _mklog(spark, tmp_path)
    log.append_dataframe(sources.events_from_csv(spark, str(p)), on_invalid="error")
    assert log.version() == 2
    assert {r.label for r in log.scan().collect()} == {"click", "view"}


def test_events_from_wire_bytes(spark, tmp_path):
    body = encode([("a", '{"i":1}'), ("b", '{"i":2}')])
    log = _mklog(spark, tmp_path)
    log.append_dataframe(sources.events_from_wire_bytes(spark, body), on_invalid="error")
    assert log.version() == 2


def test_export_jsonl_public_shape(spark, tmp_path):
    log = _mklog(spark, tmp_path)
    log.append_multi([("a", '{"i":1}'), ("b", '{"i":2}')])
    out = str(tmp_path / "out")
    sources.export_log_jsonl(log, out)
    rows = [json.loads(line) for line in spark.read.text(out).toPandas()["value"]]
    by_version = {r["version"]: r for r in rows}
    assert set(by_version) == {"1", "2"}  # lowercase hex
    assert by_version["1"]["version-previous"] == "0"
    assert by_version["2"]["version-previous"] == "1"
    assert by_version["2"]["payload"] == '{"i":2}'
    assert by_version["1"]["time"].endswith("Z") or "+" in by_version["1"]["time"]


def test_jsonl_missing_label_rejected_not_null_committed(spark, tmp_path):
    """Regression: a JSONL line without the label field yields label=NULL;
    three-valued logic (NULL & true = NULL) must not let it slip past
    the all-or-nothing validity audit."""
    import pytest

    from eventlog_spark.errors import InvalidPayload

    p = tmp_path / "in.jsonl"
    p.write_text('{"payload":{"x":1}}\n{"label":"ok","payload":{"x":2}}\n')
    log = _mklog(spark, tmp_path)
    df = sources.events_from_jsonl(spark, str(p))
    with pytest.raises(InvalidPayload):
        log.append_dataframe(df, on_invalid="error")
    assert log.version() == 0  # nothing committed

    log.append_dataframe(df, on_invalid="drop")
    assert log.version() == 1  # only the valid row
    assert log.scan().collect()[0].label == "ok"


def test_export_jsonl_utc_under_non_utc_session(spark, tmp_path):
    """The export pins UTC rendering even when the session timezone is
    not UTC (date_format renders in session tz — regression guard)."""
    log = _mklog(spark, tmp_path)
    log.append("a", '{"i":1}')
    out_utc = str(tmp_path / "out_utc")
    sources.export_log_jsonl(log, out_utc)
    t_utc = json.loads(spark.read.text(out_utc).collect()[0].value)["time"]

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out_ny = str(tmp_path / "out_ny")
        sources.export_log_jsonl(log, out_ny)
        t_ny = json.loads(spark.read.text(out_ny).collect()[0].value)["time"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert t_ny == t_utc
    assert t_utc.endswith("Z")


def test_export_parquet_roundtrip(spark, tmp_path):
    log = _mklog(spark, tmp_path)
    log.append_multi([(f"e{i}", f'{{"i":{i}}}') for i in range(20)])
    out = str(tmp_path / "snap")
    sources.export_log_parquet(log, out, partitions=4)
    snap = spark.read.parquet(out)
    assert snap.count() == 20
    assert sorted(r.version for r in snap.select("version").collect()) == list(range(1, 21))


# --- reference .eventlog binary format (sources/binformat.py) -------------


def test_xxh64_known_vectors_and_jvm_parity(spark):
    """Pure-Python XXH64 equals the published vectors AND Spark's JVM
    XxHash64 (seed 42) on binary input across all length branches."""
    import random

    from pyspark.sql import functions as F

    from eventlog_spark.sources.binformat import xxh64

    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    random.seed(7)
    blobs = [bytes(random.randrange(256) for _ in range(n))
             for n in (0, 1, 4, 7, 8, 16, 31, 32, 33, 64, 1000)]
    df = spark.createDataFrame([(b,) for b in blobs], "b binary").select(
        F.xxhash64("b").alias("h")
    )
    jvm = [r.h & ((1 << 64) - 1) for r in df.collect()]
    assert jvm == [xxh64(b, seed=42) for b in blobs]


def test_binformat_roundtrip_and_corruption(tmp_path):
    """Compose a reference-format file (write_file_header.go layout),
    read it back entry-exact with checksum verification; a flipped byte
    must be detected (read_event.go:133-140)."""
    import pytest

    from eventlog_spark.sources import binformat as bf

    path = str(tmp_path / "ref.eventlog")
    events = [
        (1700000000, "first", '{"ix":1}'),
        (1700000001, "", '{"ix":2,"s":"täxt"}'),
        (1700000002, "third-label_~%", '{"nested":{"a":[1,2,3]}}'),
    ]
    bf.write_eventlog_file(path, {"name": "mylog", "k": "v"}, events)

    meta, entries = bf.read_eventlog_file(path)
    assert meta == {"name": "mylog", "k": "v"}
    assert [(e.timestamp, e.label, e.payload) for e in entries] == events
    # offset-version chain: each entry's version_prev is the previous offset
    assert entries[0].version_prev == 0
    assert entries[1].version_prev == entries[0].version
    assert entries[2].version_prev == entries[1].version

    blob = bytearray(open(path, "rb").read())
    blob[-12] ^= 0xFF  # corrupt inside the last payload
    with pytest.raises(bf.BinFormatError, match="checksum mismatch"):
        bf.read_eventlog_bytes(bytes(blob))


def test_binformat_distributed_ingest_and_migration(spark, tmp_path):
    """One file = one task via binaryFile + mapInPandas; migrating into
    the Spark-native log re-versions densely and passes the audit."""
    from eventlog_spark.sources import binformat as bf

    paths = []
    for i in range(3):
        p = str(tmp_path / f"shard{i}.eventlog")
        bf.write_eventlog_file(
            p, {"shard": str(i)},
            [(1700000000 + j, f"s{i}e{j}", f'{{"i":{i},"j":{j}}}') for j in range(5)],
        )
        paths.append(p)

    df = bf.eventlog_files_to_dataframe(spark, paths)
    rows = df.collect()
    assert len(rows) == 15
    assert {r.label for r in rows} == {f"s{i}e{j}" for i in range(3) for j in range(5)}

    log = EventLog.create(spark, str(tmp_path / "migrated"))
    log.append_dataframe(df, order_cols=["source_file", "version"])
    assert log.version() == 15
    audit = log.check_integrity().collect()[0]
    assert audit.density_violation == 0 and audit.payload_violations == 0
