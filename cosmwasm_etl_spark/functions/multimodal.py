"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via ``mapInPandas`` (Arrow-batched).

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_stub`` produces a deterministic fake "decoded" feature so the
Spark-side plumbing — schema, batch shape, partitioning — is real and tested;
swap the stub for a PIL/ffmpeg call in production. Anything that can't run
here raises ``NotImplementedError`` explicitly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, feature array<float>"
)


def decode_image_stub(payload: bytes) -> list[float]:
    """Deterministic fake decode: 8 floats derived from the payload digest.
    REPLACE with a real decoder (PIL/torchvision) in production."""
    if payload is None:
        return []
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:8]]


def resize_image(payload: bytes, w: int, h: int) -> bytes:
    raise NotImplementedError("image resize requires PIL/opencv; not in this container")


def sample_video_frames(payload: bytes, every_ms: int) -> list[bytes]:
    raise NotImplementedError("video frame sampling requires ffmpeg; not in this container")


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches stream through Python once; output is a narrow feature
    table (media_id, kind, n_bytes, sha256, feature). Partitioning is
    preserved — no shuffle is introduced by this op.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(decode_image_stub),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic binary fixtures (JVM-side generation)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.col("id").cast("string"), F.lit("-"),
                 F.sha2(F.concat(F.lit(seed), F.col("id")), 256)),
        "UTF-8",
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
