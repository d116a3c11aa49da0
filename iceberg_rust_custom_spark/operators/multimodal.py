"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas transforms.

Decode tiers (resolved at runtime, per payload):

1. **Optional libraries** — Pillow for images, soundfile for audio, probed
   once with an import-try; handles compressed formats (JPEG/PNG/FLAC/OGG)
   when the deployment installs them.
2. **Built-in pure-Python decoders** — uncompressed BMP (24/32-bit) via
   numpy and RIFF/WAV PCM via the stdlib ``wave`` module. These are REAL
   decodes (actual pixels / samples), dependency-free, so the pipeline is
   genuinely functional in this container.
3. ``fake=True`` — deterministic pseudo-decode derived from payload bytes,
   for plumbing tests and payloads in formats neither tier handles.

Without a matching tier and without fake, decoders raise
NotImplementedError (honest failure, never silent garbage).

Scale notes: binary payloads dominate memory → we size Arrow batches via
``spark.sql.execution.arrow.maxRecordsPerBatch`` at the pipeline layer and
keep metadata-only projections (no payload) for all planning decisions so
Catalyst prunes the binary column out of scans that don't decode.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


# Probed lazily inside executors (the driver's import result is not
# shipped with the closure; each worker probes once per interpreter).
_LIBS: dict = {}


def _lib(name: str):
    if name not in _LIBS:
        _LIBS[name] = _try_import(name)
    return _LIBS[name]

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


def _decode_bmp(payload: bytes) -> dict | None:
    """Real decode of uncompressed 24/32-bit BMP (pure numpy, public
    BITMAPINFOHEADER layout). Returns None if not a BMP this handles."""
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    h = abs(height)
    stride = ((width * (bpp // 8) + 3) // 4) * 4
    need = data_off + stride * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : width * (bpp // 8)]
    px = rows.reshape(h, width, bpp // 8)[:, :, :3]  # BGR(A) → 3 channels
    return {"px_mean": float(px.mean()), "n_bytes": len(payload), "width": width, "height": h}


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Image decode: Pillow when importable, else the built-in BMP decoder,
    else fake (if requested), else NotImplementedError.

    Every result carries ``decoded``: True only for a REAL decode (Pillow or
    the BMP path); the byte-derived fake path is tagged False so downstream
    consumers can never mistake pseudo-metrics for real ones (ADVICE r2 —
    previously a corrupt payload under fake=True produced untagged fake
    values). Only recognized decode failures fall through; unexpected
    errors propagate."""
    n = len(payload or b"")
    pil = _lib("PIL")
    if pil is not None and n:
        try:
            from PIL import Image
            import numpy as np

            img = Image.open(io.BytesIO(payload))
            arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
            return {
                "px_mean": float(arr.mean()),
                "n_bytes": n,
                "width": img.width,
                "height": img.height,
                "decoded": True,
            }
        except (OSError, ValueError, SyntaxError):
            pass  # not a PIL-decodable payload (UnidentifiedImageError ⊂ OSError)
    bmp = _decode_bmp(payload or b"")
    if bmp is not None:
        return {**bmp, "decoded": True}
    if not fake:
        raise NotImplementedError(
            "payload is not a decodable format (built-in: BMP; install Pillow for compressed formats)"
        )
    return {
        "px_mean": (sum(payload[:64]) / max(1, min(n, 64))) if n else 0.0,
        "n_bytes": n,
        "decoded": False,
    }


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Output schema is
    fixed; batches stream through Arrow. The payload column is pruned from
    the scan when callers select only metadata. ``decoded`` is False for
    rows whose metrics came from the byte-derived fake path."""
    out_schema = "media_id long, n_bytes long, px_mean double, decoded boolean"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda p: decode_image(p, fake=fake))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]).astype("int64"),
                    "px_mean": feats.map(lambda d: d["px_mean"]).astype("float64"),
                    "decoded": feats.map(lambda d: d["decoded"]).astype("bool"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(op, out_schema)


def _encode_bmp(px) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array as an uncompressed 24-bit BMP."""
    import numpy as np

    h, w = px.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px.reshape(h, w * 3)
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def resize_bmp(payload: bytes, width: int, height: int) -> bytes | None:
    """Real nearest-neighbour resize for uncompressed BMP payloads (pure
    numpy). None if the payload isn't a decodable BMP."""
    import numpy as np

    d = _decode_bmp(payload)
    if d is None:
        return None
    h0, w0 = d["height"], d["width"]
    data_off = struct.unpack_from("<I", payload, 10)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    stride = ((w0 * (bpp // 8) + 3) // 4) * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h0, offset=data_off)
    px = rows.reshape(h0, stride)[:, : w0 * (bpp // 8)].reshape(h0, w0, bpp // 8)[:, :, :3]
    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
    return _encode_bmp(np.ascontiguousarray(px[yi][:, xi]))


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize via mapInPandas: Pillow when importable, built-in BMP
    nearest-neighbour otherwise; non-decodable payloads pass through
    unchanged when ``fake`` (plumbing mode) else raise."""
    out_schema = "media_id long, payload binary, width int, height int"

    def _resize_one(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        pil = _lib("PIL")
        if pil is not None:
            try:
                from PIL import Image

                src_img = Image.open(io.BytesIO(p))
                fmt = src_img.format  # .resize() returns an Image with format=None
                img = src_img.resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format=fmt or "BMP")
                return buf.getvalue()
            except Exception:
                pass
        out = resize_bmp(p, width, height)
        if out is not None:
            return out
        if not fake:
            raise NotImplementedError("payload is not a resizable format (built-in: BMP)")
        return p

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(_resize_one),
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
    from iceberg_rust_custom_spark.functions.local_rows import local_rows_df

    return local_rows_df(spark, rows, MEDIA_SCHEMA)


def _decode_wav(payload: bytes) -> dict | None:
    """Real decode of RIFF/WAV PCM via the stdlib ``wave`` module: sample
    rate, frame count, true duration and RMS level. None if not WAV."""
    import wave

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate, nframes, width, chans = (
                w.getframerate(), w.getnframes(), w.getsampwidth(), w.getnchannels()
            )
            raw = w.readframes(nframes)
    except Exception:
        return None
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
    return {
        "n_bytes": len(payload),
        "sample_rate": rate,
        "n_samples": nframes,
        "n_channels": chans,
        "duration_ms": int(nframes * 1000 / max(rate, 1)),
        "rms": rms,
    }


def decode_audio(payload: bytes, duration_ms: int | None, fake: bool = False) -> dict:
    """Audio decode: soundfile when importable, else the built-in WAV
    decoder, else fake (if requested), else NotImplementedError. Returns at
    least {n_bytes, byte_rate}; real decodes add rate/samples/rms."""
    n = len(payload or b"")
    sf = _lib("soundfile")
    if sf is not None and n:
        try:
            import numpy as np

            data, rate = sf.read(io.BytesIO(payload))
            dur = int(len(data) * 1000 / max(rate, 1))
            return {
                "n_bytes": n,
                "sample_rate": rate,
                "n_samples": len(data),
                "duration_ms": dur,
                "rms": float(np.sqrt((np.asarray(data, dtype=np.float64) ** 2).mean())) if len(data) else 0.0,
                "byte_rate": n / max(dur, 1),
                "decoded": True,
            }
        except (RuntimeError, OSError, ValueError):
            pass  # undecodable payload (LibsndfileError ⊂ RuntimeError); fall through
    wav = _decode_wav(payload or b"")
    if wav is not None:
        wav["byte_rate"] = n / max(wav["duration_ms"], 1)
        return {**wav, "decoded": True}
    if not fake:
        raise NotImplementedError(
            "payload is not a decodable format (built-in: WAV PCM; install soundfile for compressed formats)"
        )
    d = max(int(duration_ms or 0), 1)
    return {"n_bytes": n, "byte_rate": n / d, "decoded": False}


def extract_audio_features(df: DataFrame, frame_ms: int = 20, fake: bool = True) -> DataFrame:
    """Audio feature extraction over opaque binary payloads: one row per
    media with frame count and a payload-derived level. Arrow-batched
    mapInPandas — the real-decoder swap point; frame math stays identical.
    Planning-only projections (no payload) let Catalyst drop the binary
    column from scans that never decode."""
    out_schema = "media_id long, n_bytes long, n_frames long, byte_rate double, decoded boolean"

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
                    "decoded": pd.Series([f["decoded"] for f in feats], dtype="bool"),
                }
            )

    return df.select("media_id", "payload", "duration_ms").mapInPandas(op, out_schema)
