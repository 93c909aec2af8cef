"""Zipf-skew rehearsal probe (r7 verdict item 2).

Every prior scale rehearsal replicated uniform testdata; real 100 TB
logs and corpora are Zipfian. Against a ``make_sf1.py --zipf`` dataset
(hot orders ~5% of all lineitems on ONE key, hot customers/users, 25%
of docs sharing a boilerplate prefix) this measures the skew-sensitive
plans:

* ``join_skew_salted`` vs the IDENTICAL unsalted shuffle-hash join,
  AQE off (raw skew: one reducer owns the hot key) and AQE on (runtime
  skew split) — the salting must actually bind, not just parse;
* the hot-shingle dedup family (NGRAM_MAX_DF stop-shingle cap, LSH
  stop-bucket cull) — candidate-pair volume must stay bounded when a
  quarter of the corpus shares shingles;
* hot-partition window/aggregate shapes (scd2, event funnel).

Usage: python tools/skew_probe.py [sf_dir=.bench/sf1z]
Prints one JSON line per measurement plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _timed(label, thunk, out):
    t0 = time.monotonic()
    n = thunk()
    dt = round(time.monotonic() - t0, 2)
    out[label] = dt
    print(json.dumps({"probe": label, "sec": dt, "rows": n}), flush=True)
    return dt


def main() -> None:
    from eventlog_spark.queries import REGISTRY, _ensure_loaded
    from eventlog_spark.session import get_spark
    from eventlog_spark.tables import load_table

    _ensure_loaded()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf1z"
    spark = get_spark(app_name="skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}

    def unsalted():
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        disc = F.col("l_extendedprice").cast("decimal(12,2)") * (
            F.lit(1.0) - F.col("l_discount")
        ).cast("decimal(12,2)")
        return (
            li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"), F.sum(disc).alias("revenue"))
        )

    # raw skew, no runtime rescue: the salted plan must win here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    _timed("unsalted_join_aqe_off", lambda: unsalted().count(), results)
    _timed(
        "salted_join_aqe_off",
        lambda: REGISTRY["join_skew_salted"].fn(spark, sf_dir).count(),
        results,
    )
    # AQE on: runtime skew split is the automatic path where it applies
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    _timed("unsalted_join_aqe_on", lambda: unsalted().count(), results)
    _timed(
        "salted_join_aqe_on",
        lambda: REGISTRY["join_skew_salted"].fn(spark, sf_dir).count(),
        results,
    )

    # hot-shingle dedup family + hot-partition shapes
    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_lsh_verified",
        "dedup_exact",
        "scd2_user_state",
        "event_funnel",
        "window_running_total",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "topk_orders",
    ):
        _timed(name, lambda n=name: REGISTRY[n].fn(spark, sf_dir).count(), results)

    print(json.dumps({"probe": "skew_summary", "sf_dir": sf_dir, "sec": results}))


if __name__ == "__main__":
    main()
