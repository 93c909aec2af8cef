#!/usr/bin/env python
"""Scale-rehearsal probe: time a named set of scale-sensitive queries
COLD (fresh artifact warehouse, fresh session caches) at one SF dir.

Round-7 use (verdict item 4 — push the rehearsal one decade): run at
.bench/sf1 (10x sf0.1) and .bench/sf3 (30x) and compare — the capped
paths (IVF-PQ training sample, exact-cosine sample gate) must stay
FLAT; the shuffle-bound paths (shingle artifact, LSH candidates,
substring grams) should grow ~linearly with rows, nothing superlinear.

Run: python tools/scale_probe.py <sf_dir> [query ...]
Prints one JSON line {"sf_dir":…, "queries": {name: sec}, "total": …}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the default probe set: every family the verdict names
DEFAULT = [
    "ann_ivf_pq",            # capped PQ training + persisted codes build
    "dedup_embedding_cosine",  # capped exact-cosine sample gate
    "dedup_minhash_lsh",     # shared shingle artifact + LSH candidates
    "dedup_ngram_jaccard",   # inverted-index join over hashed shingles
    "dedup_substring_exact", # stride-1 gram hash window
    "ann_lsh_bucketed",      # adaptive bucket-width LSH
    "text_bpe_train_scaled", # iterative trainer (vocab-sized)
    "stream_real_watermark_drop",  # staged micro-batch stream run
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    # cold warehouse: artifacts must be rebuilt inside the timing
    os.environ["SPARK_GRAFT_ARTIFACTS"] = tempfile.mkdtemp(prefix="scaleprobe-")
    from eventlog_spark.queries import REGISTRY, _ensure_loaded
    from eventlog_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    timings = {}
    for name in names:
        t0 = time.monotonic()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.monotonic() - t0, 2)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "scale_probe_cold",
                "sf_dir": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
