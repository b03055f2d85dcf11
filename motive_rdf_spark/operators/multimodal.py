"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-size
control, UDF signatures — is real and tested; the codec step is
stubbed because no image/audio libraries ship in this container:

- ``decode=\"strict\"``  → raises ``NotImplementedError`` (the marked
  integration point: swap in PIL/torchaudio/pyav per modality);
- ``decode=\"fake\"``    → a deterministic fake decoder (bytes-hash →
  fixed-shape feature vector), so tests pin batch shapes, schema, and
  determinism end to end.

Scale notes: media rows are large (MBs); ``MEDIA_PARTITION_TARGET``
documents the repartition rule — size partitions by *bytes*, not rows
(``total_bytes / 128MB`` partitions via ``repartition``), or decode
tasks OOM long before row counts look big. Feature extraction is
map-only: zero shuffles, linear scale-out.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, media binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

MEDIA_PARTITION_TARGET_BYTES = 128 * 1024 * 1024

FEATURE_DIM = 16

FEATURE_SCHEMA = "media_id long, modality string, n_bytes long, feature array<double>"


def synthesize_media(spark, rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    return spark.range(rows).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("media"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(10_000))).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes → FEATURE_DIM
    doubles derived from sha256(payload)."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype("float64") / 65535.0


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Batched feature extraction over media rows via ``mapInPandas``.

    ``decode=\"strict\"`` marks where a real decoder plugs in (PIL /
    torchaudio / pyav); it raises ``NotImplementedError`` by design.
    """
    if decode not in ("fake", "strict"):
        raise ValueError(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real media codecs are not available in this environment; "
                    "plug a decoder in here (image: PIL, audio: torchaudio, "
                    "video: pyav frame sampling) and keep the batch contract"
                )
            feats = [_fake_decode(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts).
    The timestamp grid is native Spark (sequence/explode); the actual
    frame grab happens inside ``extract_features``'s decoder slot."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )
