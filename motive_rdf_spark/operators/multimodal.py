"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition-size
control, UDF signatures — is real and tested, and two modalities have
REAL pure-Python codecs (no external media libraries needed):

- ``image`` — binary PPM (P6): header parse (width/height/maxval,
  whitespace per the netpbm spec) + raw RGB plane decode;
- ``audio`` — WAV (RIFF little-endian): chunk walk to ``fmt ``/``data``,
  PCM16 sample decode.

``decode=\"real\"`` uses them; a ``video`` row still raises
``NotImplementedError`` there (the remaining marked integration point —
frame grabbing needs a container/codec library like pyav).
``decode=\"fake\"`` keeps the deterministic bytes-hash decoder so
plumbing tests run on any payload; ``decode=\"strict\"`` always raises.

Scale notes: media rows are large (MBs); ``MEDIA_PARTITION_TARGET``
documents the repartition rule — size partitions by *bytes*, not rows
(``total_bytes / 128MB`` partitions via ``repartition``), or decode
tasks OOM long before row counts look big. Feature extraction is
map-only: zero shuffles, linear scale-out.
"""

from __future__ import annotations

import hashlib
import struct
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

# deterministic fixture geometry (synthesize_media codec="real";
# oracles.multimodal_sql derives expected features from the same rule)
PPM_W, PPM_H = 16, 12
WAV_SAMPLES, WAV_RATE = 500, 8000


def synthesize_media(spark, rows: int, seed: int = 42, codec: str = "fake") -> DataFrame:
    """Deterministic fake media table.

    ``codec="fake"``: binary payload = seeded sha hash bytes (any
    modality; pairs with ``decode="fake"``).
    ``codec="real"``: well-formed PPM (even media_id → image) / WAV
    (odd media_id → audio) payloads whose pixel/sample values follow a
    closed-form rule — pixel i = (31*i + media_id) mod 256, sample i =
    ((37*i + 11*media_id) mod 65536) - 32768 — so expected decoded
    features are computable exactly by an independent oracle.
    """
    if codec == "fake":
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
    if codec != "real":
        raise ValueError(codec)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "media": [], "meta": []}
            for mid in pdf["id"]:
                mid = int(mid)
                if mid % 2 == 0:
                    payload = _make_ppm(mid)
                    out["modality"].append("image")
                    out["meta"].append(
                        {"width": PPM_W, "height": PPM_H, "duration_ms": 0, "codec": "ppm"}
                    )
                else:
                    payload = _make_wav(mid)
                    out["modality"].append("audio")
                    out["meta"].append(
                        {
                            "width": 0,
                            "height": 0,
                            "duration_ms": WAV_SAMPLES * 1000 // WAV_RATE,
                            "codec": "pcm16",
                        }
                    )
                out["media_id"].append(mid)
                out["media"].append(payload)
            yield pd.DataFrame(out)

    return spark.range(rows).mapInPandas(gen, MEDIA_SCHEMA)


def _make_ppm(mid: int) -> bytes:
    n = PPM_W * PPM_H * 3
    px = ((np.arange(n, dtype=np.int64) * 31 + mid) % 256).astype(np.uint8)
    return f"P6\n{PPM_W} {PPM_H}\n255\n".encode() + px.tobytes()


def _make_wav(mid: int) -> bytes:
    s = (((np.arange(WAV_SAMPLES, dtype=np.int64) * 37 + mid * 11) % 65536) - 32768).astype(
        "<i2"
    )
    data = s.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


# ---------------------------------------------------------------------------
# real pure-Python codecs
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 array (h, w, 3). Header per the netpbm
    spec: magic, width, height, maxval as whitespace-separated tokens
    (comments starting with '#' skipped), one whitespace byte, then raw
    RGB rows."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            return token()
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    magic = token()
    if magic != b"P6":
        raise ValueError(f"not a binary PPM: magic {magic!r}")
    w, h, maxval = int(token()), int(token()), int(token())
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV (RIFF) → (int16 samples flat, sample_rate). Walks chunks to
    find ``fmt `` and ``data``; PCM16 only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt, _ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError(f"non-PCM wav (format {fmt})")
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if data is None or bits != 16:
        raise ValueError("missing data chunk or non-16-bit samples")
    return np.frombuffer(data, dtype="<i2"), int(rate)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes → FEATURE_DIM
    doubles derived from sha256(payload)."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype("float64") / 65535.0


def _real_features(modality: str, payload: bytes) -> np.ndarray:
    """FEATURE_DIM doubles. Sums are taken over exact integers so the
    mean is bit-reproducible by an integer-arithmetic oracle."""
    out = np.zeros(FEATURE_DIM)
    if modality == "image":
        px = decode_ppm(payload)
        flat = px.astype(np.int64).ravel()
        out[0] = (float(flat.sum()) / flat.size) / 255.0
        out[1] = float(flat.std()) / 255.0
        out[2], out[3], out[4] = px.shape[1], px.shape[0], px.shape[2]
    elif modality == "audio":
        s, rate = decode_wav(payload)
        si = s.astype(np.int64)
        out[0] = (float(si.sum()) / si.size) / 32768.0
        out[1] = float(si.std()) / 32768.0
        out[2], out[3] = si.size, rate
    else:
        raise NotImplementedError(
            f"no codec for modality {modality!r}; video frame sampling needs a "
            "container library (pyav) — plug it in here, keeping the batch contract"
        )
    return out


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Batched feature extraction over media rows via ``mapInPandas``.

    ``decode=\"real\"`` uses the pure-Python PPM/WAV codecs above
    (video still raises); ``decode=\"strict\"`` raises for everything
    (the fully-stubbed integration point); ``decode=\"fake\"`` hashes
    bytes into a fixed-shape vector (plumbing tests).
    """
    if decode not in ("fake", "strict", "real"):
        raise ValueError(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "strict mode: no codec wired; use decode='real' for the "
                    "built-in PPM/WAV decoders or plug a library decoder here"
                )
            if decode == "fake":
                feats = [_fake_decode(bytes(b)) for b in pdf["media"]]
            else:
                feats = [
                    _real_features(mod, bytes(b))
                    for mod, b in zip(pdf["modality"], pdf["media"])
                ]
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
