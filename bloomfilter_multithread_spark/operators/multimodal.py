"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schema, partition sizing, Arrow batch shape,
UDF signatures) is real and tested; the actual codec step is STUBBED
because decode libraries (PIL/torchaudio/ffmpeg) are not in this
container: ``decode_stub=True`` (default) derives a deterministic fake
feature vector from the bytes themselves, and ``decode_stub=False``
raises ``NotImplementedError`` at the exact seam where a real decoder
plugs in.

Batch-shape notes for 100 TB media tables:
- binary payloads make rows huge; ``maxRecordsPerBatch`` must be sized
  by bytes not rows — ``media_repartition`` targets ~64 MB input splits
  by byte size, not row count;
- feature extraction is mapInPandas (Arrow zero-copy for binary), one
  output row per input row, fixed-width float array out.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, mime string, width int, height int, "
    "duration_ms int"
)
FEATURE_DIM = 32


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) with typed
    metadata — the fixture for the plumbing tests."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("id") * 37, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("id") * 53, F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.col("id") * 97, F.lit(600000))).cast("int").alias("duration_ms"),
    )
    return df


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: expand the
    payload digest into ``dim`` floats in [-1, 1)."""
    out = np.empty(dim, dtype=np.float32)
    h = payload or b""
    i = 0
    while i < dim:
        h = hashlib.sha256(h).digest()
        chunk = np.frombuffer(h, dtype=np.uint32)[: dim - i]
        out[i : i + chunk.size] = chunk.astype(np.float64) / 2**31 - 1.0
        i += chunk.size
    return out


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = FEATURE_DIM,
                     decode_stub: bool = True) -> DataFrame:
    """media rows -> (all columns, feature: array<float>[dim]) via
    mapInPandas. The real decoder goes where NotImplementedError is."""
    out_schema = df.schema.simpleString()[7:-1] + f", feature array<float>"
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg — not in this container"
                )
            feats = [
                _fake_decode(bytes(p) if p is not None else b"", dim).tolist()
                for p in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf["feature"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (JVM-side sequence explode); the frame decode itself is the stubbed
    seam above. Demonstrates fan-out sizing: rows = duration/every_ms."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def media_repartition(df: DataFrame, target_bytes: int = 64 << 20,
                      payload_col: str = "payload") -> DataFrame:
    """Byte-aware repartition: estimates total payload bytes from a
    1% sample of lengths and repartitions so each partition carries
    ~target_bytes — row-count partitioning is wrong when payloads vary
    by 1000x."""
    stats = df.select(F.sum(F.length(payload_col)).alias("b")).first()
    total = stats["b"] or 0
    nparts = max(1, int(total // target_bytes) + 1)
    return df.repartition(nparts)
