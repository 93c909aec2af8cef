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
