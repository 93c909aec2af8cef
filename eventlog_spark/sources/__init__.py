from .formats import (  # noqa: F401
    events_from_csv,
    events_from_jsonl,
    events_from_wire_bytes,
    export_log_jsonl,
    export_log_parquet,
)
