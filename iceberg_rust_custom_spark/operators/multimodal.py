"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas transforms.

The decode step is STUBBED (no image/audio libs in this container): decoders
raise NotImplementedError unless ``fake=True``, which substitutes a
deterministic fake decode so the Spark-side plumbing — schema, partitioning,
mapInPandas batch shape — is real and testable end-to-end. Swapping in a
real decoder is a one-function change per modality.

Scale notes: binary payloads dominate memory → we size Arrow batches via
``spark.sql.execution.arrow.maxRecordsPerBatch`` at the pipeline layer and
keep metadata-only projections (no payload) for all planning decisions so
Catalyst prunes the binary column out of scans that don't decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Stub decoder. Real impl: PIL/turbojpeg. fake=True → deterministic
    pseudo-decode derived from payload bytes (testable plumbing)."""
    if not fake:
        raise NotImplementedError("image decoding requires an image library not present in this container")
    n = len(payload or b"")
    return {"px_mean": (sum(payload[:64]) / max(1, min(n, 64))) if n else 0.0, "n_bytes": n}


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Output schema is
    fixed; batches stream through Arrow. The payload column is pruned from
    the scan when callers select only metadata."""
    out_schema = "media_id long, n_bytes long, px_mean double"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode_image(p, fake=fake))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]).astype("int64"),
                    "px_mean": feats.map(lambda d: d["px_mean"]).astype("float64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize stub: passes payloads through mapInPandas with the real batch
    shape; the fake path tags the payload with the target size."""
    out_schema = "media_id long, payload binary, width int, height int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("resize requires an image library")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling stub: one output row per sampled frame (explodes by
    duration), payload decode stubbed."""
    frames = df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    return frames


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeated id bytes)."""
    rows = [
        (i, "image" if i % 3 else "video", bytes([i % 251]) * (50 + i % 100), "application/octet-stream",
         64, 64, 5000 if i % 3 == 0 else None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_audio(payload: bytes, duration_ms: int | None, fake: bool = False) -> dict:
    """Stub decoder. Real impl: soundfile/librosa. fake=True → deterministic
    pseudo-decode (byte-length-derived) so the pipeline shape is testable."""
    if not fake:
        raise NotImplementedError("audio decoding requires an audio library not present in this container")
    n = len(payload or b"")
    d = max(int(duration_ms or 0), 1)
    return {"n_bytes": n, "byte_rate": n / d}


def extract_audio_features(df: DataFrame, frame_ms: int = 20, fake: bool = True) -> DataFrame:
    """Audio feature extraction over opaque binary payloads: one row per
    media with frame count and a payload-derived level. Arrow-batched
    mapInPandas — the real-decoder swap point; frame math stays identical.
    Planning-only projections (no payload) let Catalyst drop the binary
    column from scans that never decode."""
    out_schema = "media_id long, n_bytes long, n_frames long, byte_rate double"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_audio(p, d, fake=fake)
                for p, d in zip(pdf["payload"], pdf["duration_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series([f["n_bytes"] for f in feats], dtype="int64"),
                    "n_frames": (
                        pdf["duration_ms"].fillna(0).astype("int64") + frame_ms - 1
                    ) // frame_ms,
                    "byte_rate": pd.Series([f["byte_rate"] for f in feats], dtype="float64"),
                }
            )

    return df.select("media_id", "payload", "duration_ms").mapInPandas(op, out_schema)
