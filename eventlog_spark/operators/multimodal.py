"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched Pandas UDFs.

This container has no image/audio codecs, so the decode step is a
deterministic fake (clearly marked) — but everything Spark-side is
real and tested: the binary column handling, the manifest schema, the
``mapInPandas`` batch shape, and the partitioning strategy. Swapping
``_fake_decode`` for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads ride in the same parquet row as their
metadata (good to ~1 MB each; bigger media belongs in object storage
with the row carrying a URI — same plumbing, the UDF fetches instead
of decodes). ``mapInPandas`` streams Arrow batches, so executor memory
is bounded by batch size, not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import register
from ..tables import load_table

FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len int, mean_byte double, "
    "first_byte int, n_frames int"
)


def manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal manifest: a binary payload column (here:
    md5 digest bytes standing in for encoded media) + typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.unhex(F.md5("text")).alias("payload"),
        ((F.col("doc_id") % 64 + 1) * 16).cast("int").alias("width"),
        ((F.col("doc_id") % 48 + 1) * 16).cast("int").alias("height"),
    )


@register(
    "multimodal_manifest",
    oracle="""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(octet_length(unhex(md5(text))) AS INT) AS byte_len,
       CAST((doc_id % 64 + 1) * 16 AS INT) AS width,
       CAST((doc_id % 48 + 1) * 16 AS INT) AS height
FROM documents
""",
    doc="Multimodal manifest: binary payload metadata projection.",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return manifest(spark, sf_dir).select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("byte_len"),
        "width",
        "height",
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[float, int, int]:
    """STUB decode (no codecs in this container): deterministic features
    from the raw bytes. A real deployment replaces this body with
    PIL.Image.open / torchaudio.load / pyav frame sampling — the
    signature and the Spark plumbing around it do not change."""
    if not payload:
        return 0.0, -1, 0
    mean_byte = sum(payload) / len(payload)
    n_frames = {"image": 1, "audio": 16, "video": 8}.get(media_type, 0)
    return mean_byte, payload[0], n_frames


def decode_features(mdf: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out; one Python worker per core, zero row-at-a-time overhead."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p) if p is not None else b"", m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "mean_byte": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return mdf.mapInPandas(extract, schema=FEATURE_SCHEMA)


def _byte_sql(k: int) -> str:
    """k-th byte (1-based) of unhex(md5(text)) as an int, in portable SQL."""
    hi = f"(strpos('0123456789abcdef', substr(md5(text), {2 * k - 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr(md5(text), {2 * k}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


@register(
    "multimodal_decode_features",
    # The STUB decode is deterministic byte arithmetic over the md5
    # payload, so even the Python decode path is oracle-checkable: the
    # SQL recomputes each payload byte from the hex digest. A real
    # codec swap would drop this oracle (becoming a rows-only check) —
    # that is the expected trade, not a regression.
    oracle=f"""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(16 AS INT) AS byte_len,
       ({" + ".join(_byte_sql(k) for k in range(1, 17))}) / 16.0 AS mean_byte,
       CAST({_byte_sql(1)} AS INT) AS first_byte,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 16 ELSE 8 END AS INT) AS n_frames
FROM documents
""",
    doc="Pandas-UDF decode/feature-extract pipeline over binary payloads.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_features(manifest(spark, sf_dir))


# -- batched model-inference scoring ------------------------------------------

# FAKE MODEL — deterministic stand-in. This container ships no ML
# runtime, so the "classifier" is a fixed linear model + rational
# squash (no exp: numpy's SIMD exp can differ from libm in the last
# ulp; x/(1+|x|) is exact float arithmetic on both engines). The
# Spark-side plumbing — Arrow batch iteration, vectorized numpy math,
# bounded batch memory — is exactly what a real ONNX/torch scorer
# uses; swapping `_fake_model` for a session-held model handle is a
# one-function change.
_W_TOK, _W_CHR, _W_DST, _BIAS = 0.01, -0.002, 0.1, -0.5


@register(
    "quality_model_scores",
    oracle=f"""
WITH feat AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
           CAST(length(text) AS DOUBLE) AS nc,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS dt
    FROM documents
),
z AS (
    SELECT doc_id,
           {_W_TOK} * nt + {_W_CHR} * nc + {_W_DST} * dt + {_BIAS} AS z
    FROM feat
)
SELECT doc_id,
       z / (1 + abs(z)) AS model_score,
       CAST(CASE WHEN z / (1 + abs(z)) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM z
""",
    doc="Batched 'model' inference over documents (deterministic fake "
    "model, real Arrow-batch scoring plumbing).",
)
def quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier inference at corpus scale — the fastText/
    DCLM-style stage every training-data pipeline runs. The executor-
    side shape is the real thing: ``mapInPandas`` streams Arrow
    batches, features vectorize in numpy, scores come back column-at-
    a-time; memory is bounded by the Arrow batch size regardless of
    partition size, and the stage is shuffle-free (pure map) so it
    pipelines into whatever filter/writer follows. Model weights
    broadcast implicitly via closure capture — at 100 TB a real model
    would load once per executor (mapInPandas init section), not per
    batch."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            nt = toks.str.len().to_numpy(dtype=np.float64)
            nc = pdf["text"].str.len().to_numpy(dtype=np.float64)
            dt = toks.map(lambda t: len(set(t))).to_numpy(dtype=np.float64)
            z = _W_TOK * nt + _W_CHR * nc + _W_DST * dt + _BIAS
            s = z / (1 + np.abs(z))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "model_score": s,
                    "keep": (s > 0).astype("int64"),
                }
            )

    return docs.mapInPandas(score, "doc_id long, model_score double, keep long")
