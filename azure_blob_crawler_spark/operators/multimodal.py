"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The reference's multimodal story is the binary-placeholder span
(file_extractor.py:103-106): unsupported types index one metadata line. The
engine keeps the bytes as a first-class column and provides the Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures, partitioning —
for decode / feature-extract / resize / frame-sample stages.

Codec tiers:

- ``decode_media_stdlib`` — REAL decoding for the formats the standard
  library covers: WAV audio (``wave``: sample rate, channels, duration,
  RMS loudness over a mono downmix) and binary PPM/PGM images (header +
  pixel parse, true nearest-neighbor resize to a thumbnail feature grid).
  Formats needing Pillow/ffmpeg come back ``ok = false`` with a reason —
  the DataFrame-native analog of the stub's NotImplementedError.
- ``decode_media`` — the hard-stub entry: raises NotImplementedError unless
  a codec module is importable (Pillow / ffmpeg are not in this container).
- ``fake_feature_extractor`` — deterministic hash-of-bytes stand-in
  preserving the exact Arrow batch shape a real encoder UDF would use.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("bytes", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_DIM = 32


def synth_media_df(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media rows for media spans (bytes = seeded blob)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, did in zip(pdf["media_ref"], pdf["doc_id"]):
                seed = zlib.crc32(ref.encode())
                rng = np.random.default_rng(seed)
                blob = rng.integers(0, 256, size=256 + seed % 512, dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": did,
                        "kind": "image",
                        "mime": "image/jpeg",
                        "bytes": blob,
                        "width": 16 + seed % 64,
                        "height": 16 + (seed >> 3) % 64,
                        "duration_ms": 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    spans_media = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"), "doc_id")
    )
    return spans_media.mapInPandas(gen, MEDIA_SCHEMA)


def decode_ppm_py(data: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) → uint8 array (h, w[, 3]).

    Header = magic, width, height, maxval as whitespace-separated tokens
    with ``#`` comments, then one whitespace byte and raw samples
    (maxval ≤ 255 supported — the common 8-bit case)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(data):
        c = data[i : i + 1]
        if c == b"#":
            i = data.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    i += 1  # single whitespace after maxval
    ch = 3 if data[:2] == b"P6" else 1
    pix = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=i)
    img = pix.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """True nearest-neighbor resize (pure numpy index maps)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


def decode_wav_py(data: bytes) -> dict:
    """WAV via the stdlib ``wave`` module: params + RMS loudness of the
    mono-downmixed PCM (8/16/32-bit)."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        n_ch, sampwidth, rate, n_frames = (
            wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
        )
        raw = wf.readframes(n_frames)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width: {sampwidth}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sampwidth == 1:
        x -= 128.0  # 8-bit WAV is unsigned
    x /= float(2 ** (8 * sampwidth - 1))
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "duration_ms": int(n_frames * 1000 / rate) if rate else 0,
        "rms": rms,
    }


DECODED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),
        StructField("ok", StringType()),       # 'ok' | reason the decode skipped
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("rms", FloatType()),
        StructField("thumb", ArrayType(FloatType())),  # resized gray grid, row-major
    ]
)


def decode_media_stdlib(media: DataFrame, thumb: int = 8) -> DataFrame:
    """Real decode stage for stdlib-coverable formats (see module
    docstring); one Arrow batch per ``mapInPandas`` call, same contract a
    Pillow/ffmpeg-backed decoder would run under. Rows whose bytes need an
    external codec come back with ``ok`` carrying the reason."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ref, did, b in zip(pdf["media_ref"], pdf["doc_id"], pdf["bytes"]):
                data = bytes(b) if b is not None else b""
                row = dict.fromkeys(cols)
                row.update(media_ref=ref, doc_id=did)
                try:
                    if data[:2] in (b"P5", b"P6"):
                        img = decode_ppm_py(data)
                        gray = img if img.ndim == 2 else img.mean(axis=2)
                        t = resize_nearest(gray, thumb, thumb)
                        row.update(
                            kind="image", ok="ok",
                            width=int(img.shape[1]), height=int(img.shape[0]),
                            thumb=(t.astype(np.float32) / 255.0).ravel().tolist(),
                        )
                    elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                        meta = decode_wav_py(data)
                        row.update(
                            kind="audio", ok="ok",
                            duration_ms=meta["duration_ms"],
                            sample_rate=meta["sample_rate"],
                            rms=np.float32(meta["rms"]),
                        )
                    else:
                        row.update(
                            kind="unknown",
                            ok="codec-not-available (needs Pillow/ffmpeg)",
                        )
                except Exception as e:  # torn file → per-row failure, not task death
                    row.update(kind="unknown", ok=f"decode-error: {e}")
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, DECODED_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """Real decode stage — requires a codec library, absent here.

    On a real cluster: swap the body for PIL.Image.open(BytesIO(b)) /
    av.open(...) inside the same mapInPandas contract."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decode needs Pillow/ffmpeg, not present in this container; "
            "use fake_feature_extractor for the tested plumbing"
        ) from e
    raise NotImplementedError("codec wiring is deployment-specific")


def fake_feature_extractor(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic bytes → feature vector (md5-seeded), preserving the
    exact Arrow batch shape a real encoder UDF would use."""

    @F.pandas_udf(ArrayType(FloatType()))
    def feats(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None:
                out.append(np.zeros(dim, dtype=np.float32))
                continue
            digest = hashlib.md5(bytes(b)).digest()
            seed = int.from_bytes(digest[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            out.append((v / max(np.linalg.norm(v), 1e-9)).astype(np.float32))
        return pd.Series(out)

    return media.withColumn("features", feats(F.col("bytes")))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-timestamp explosion (plumbing only: the decode of each
    frame is the stubbed stage). Native sequence/explode, no Python."""
    ts = F.sequence(
        F.lit(0).cast("long"), F.greatest(F.col("duration_ms") - 1, F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return media.filter(F.col("kind") == "video").select(
        "media_ref", "doc_id", F.explode(ts).alias("frame_ts_ms")
    )
