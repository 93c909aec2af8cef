"""ANN index-quality report as a first-class driver-checked query.

Round-3 verdict: recall@k numbers lived only in docstrings and one
pytest assertion, invisible to the per-round driver. This module turns
them into a registered query so the driver watches index QUALITY every
round, not just correctness: each ANN tier's answer set is intersected
with the exact brute-force top-k (``ann_topk_bruteforce``) and reported
as integer hit counts plus a recall ratio.

Composition strategy: the Spark side re-invokes the sibling operators'
raw builder functions, which since round 5 resolve through the shared
session-artifact cache (operators/artifacts.py) — the report MEASURES
the same trained codebook / bucket assignment / answer sets the ANN
queries serve, instead of retraining identical indexes (the round-4
~22 s redundancy). The DuckDB oracle embeds the sibling queries' oracle
SQL as subqueries; artifact values are identical to a fresh build by
construction, so the comparison stays bit-exact end to end. Integer
set intersection + a final tiny division — trivially oracle-exact.

At 100 TB: recall evaluation is always sample-sized work (the query set
is fixed and small); every subplan here inherits its operator's scale
story (broadcast codebooks, probed-list pruning, bucketed LSH join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import REGISTRY, register


def _recall_oracle() -> str:
    bf = REGISTRY["ann_topk_bruteforce"].oracle
    ivf = REGISTRY["ann_ivf_probed"].oracle
    pq = REGISTRY["ann_ivf_pq"].oracle
    pqr = REGISTRY["ann_ivf_pq_residual"].oracle
    lsh = REGISTRY["ann_lsh_bucketed"].oracle

    def hit_count(method: str, cte: str) -> str:
        return (
            f"SELECT '{method}' AS method, COUNT(*) AS hits FROM bf\n"
            f"    WHERE EXISTS (SELECT 1 FROM {cte} x\n"
            f"                  WHERE x.query_id = bf.query_id\n"
            f"                    AND x.neighbor_id = bf.neighbor_id)"
        )

    return f"""
WITH bf AS MATERIALIZED (SELECT query_id, neighbor_id FROM ({bf}) t),
ivf AS MATERIALIZED (SELECT query_id, neighbor_id FROM ({ivf}) t),
pq AS MATERIALIZED (SELECT query_id, neighbor_id FROM ({pq}) t),
pqr AS MATERIALIZED (SELECT query_id, neighbor_id FROM ({pqr}) t),
lshp AS MATERIALIZED (SELECT vec_a, vec_b FROM ({lsh}) t),
lsh AS (
    SELECT vec_a AS query_id, vec_b AS neighbor_id FROM lshp
    UNION ALL
    SELECT vec_b AS query_id, vec_a AS neighbor_id FROM lshp
),
truth AS (SELECT COUNT(*) AS truth FROM bf),
h AS (
    {hit_count("ivf_probed", "ivf")}
    UNION ALL
    {hit_count("ivf_pq", "pq")}
    UNION ALL
    {hit_count("ivf_pq_residual", "pqr")}
    UNION ALL
    {hit_count("lsh_candidates", "lsh")}
)
SELECT method, hits, truth, CAST(hits AS DOUBLE) / truth AS recall
FROM h CROSS JOIN truth
ORDER BY method
"""


@register(
    "ann_recall_report",
    oracle=_recall_oracle(),
    doc="Index-quality gate: recall of each ANN tier (IVF-probed, "
    "IVF-PQ, residual IVF-PQ, LSH candidate pairs) against the exact "
    "brute-force top-k.",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall = |index answers ∩ exact top-k| / |exact top-k| per ANN
    tier. IVF tiers contribute their top-k answer sets; LSH (a
    candidate-pair generator, not a ranker) contributes same-bucket
    pairs in both orientations, measuring candidate recall — the
    fraction of true neighbors an LSH-pruned re-ranker could still
    find. Counts are integers; the single division is two small exact
    ints, so the ratio is bit-identical across engines."""
    from .curation import ann_ivf_pq, ann_ivf_pq_residual
    from .similarity import ann_ivf_probed, ann_lsh_bucketed, ann_topk_bruteforce

    bf = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = ann_ivf_probed(spark, sf_dir).select("query_id", "neighbor_id")
    pq = ann_ivf_pq(spark, sf_dir).select("query_id", "neighbor_id")
    pqr = ann_ivf_pq_residual(spark, sf_dir).select("query_id", "neighbor_id")
    lshp = ann_lsh_bucketed(spark, sf_dir).select("vec_a", "vec_b")
    lsh = lshp.select(
        F.col("vec_a").alias("query_id"), F.col("vec_b").alias("neighbor_id")
    ).unionAll(
        lshp.select(
            F.col("vec_b").alias("query_id"), F.col("vec_a").alias("neighbor_id")
        )
    )
    truth = bf.agg(F.count(F.lit(1)).alias("truth"))

    def hits(df: DataFrame, method: str) -> DataFrame:
        return (
            bf.join(df, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(F.lit(method).alias("method"), "hits")
        )

    h = (
        hits(ivf, "ivf_probed")
        .unionAll(hits(pq, "ivf_pq"))
        .unionAll(hits(pqr, "ivf_pq_residual"))
        .unionAll(hits(lsh, "lsh_candidates"))
    )
    return (
        h.crossJoin(F.broadcast(truth))
        .select(
            "method",
            "hits",
            "truth",
            (F.col("hits").cast("double") / F.col("truth")).alias("recall"),
        )
        .orderBy("method")
    )
