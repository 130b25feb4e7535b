"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The reference's multimodal story is the binary-placeholder span
(file_extractor.py:103-106): unsupported types index one metadata line. The
engine keeps the bytes as a first-class column and provides the Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures, partitioning —
for decode / feature-extract / resize / frame-sample stages.

The actual codecs (Pillow / ffmpeg / torchaudio) are NOT in this container:
``decode_media`` raises NotImplementedError unless a codec module is
importable, and ``fake_feature_extractor`` provides the deterministic
stand-in (hash-of-bytes feature vector) that the tests and pipelines use.
The UDF signatures and schemas are the real, tested contract.
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
