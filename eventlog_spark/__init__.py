"""eventlog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of romshark/eventlog, extended with the
relational + LLM-data-pipeline operator surface a 100 TB training-data
pipeline needs.

Reference parity map: see SURVEY.md §2. The reference is a Go append-only
versioned event log (`/root/reference/eventlog/eventlog.go:16-27`); this
package re-expresses its data model and operators Spark-first (DataFrame /
SQL / Structured Streaming), and adds the relational and LLM-pipeline
surface mandated by BASELINE.json.

Layout:
    session.py    — tuned SparkSession builder
    tables.py     — testdata loaders / temp-view registration
    errors.py     — error types mirroring the reference's error contract
    validation.py — label/payload validation + whitespace-only JSON minify
    log.py        — EventLog: append / append_multi / OCC / scan / integrity
    operators/    — relational, dedup, similarity, text, multimodal ops
    streaming/    — tail/subscribe + watermarked window aggregations
    queries.py    — the (spark_fn, oracle_sql) registry the driver checks
"""

__version__ = "0.1.0"
