"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
structs.  The Spark-side machinery — schemas, batch iteration via
``mapInPandas`` (Arrow), partition sizing — is real and tested; the
actual codec calls are stubbed behind ``_decode_image_batch`` with a
deterministic fake (the container ships no image/audio libs), marked
clearly below.  Swapping in PIL/libvips/ffmpeg touches only the
stub's body, not the Spark plumbing.
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
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from any text table: payload =
    the text bytes, metadata derived from lengths.  Exercises the
    binary-column path end to end."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.pmod(F.col(id_col), 3) == 0, "image")
        .when(F.pmod(F.col(id_col), 3) == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.length(F.col(text_col)) % 1920).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 1080).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(F.col(text_col)) % 300).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_image_batch(payloads: pd.Series) -> pd.Series:
    """STUB — deterministic fake decoder.

    Real implementation would be e.g. PIL.Image.open(BytesIO(b)) →
    resize → np.asarray.  Here: an 8-dim feature from the sha256 of
    the payload, so results are stable across replays and the Arrow
    batch shape matches the real thing.  Raise NotImplementedError
    instead if silent fakes are unacceptable for a deployment.
    """
    def feat(b: bytes | None) -> list[float] | None:
        if b is None:
            return None
        h = hashlib.sha256(bytes(b)).digest()
        return [h[i] / 255.0 for i in range(8)]

    return payloads.map(feat)


def extract_features(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas — Arrow
    batches in, Arrow batches out; executors stream batches so peak
    memory is O(batch), independent of partition size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_image_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": feats.notna(),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (pure SQL — the decode of each frame is the stubbed
    step above).  Demonstrates explode-based fan-out sizing."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_nth),
                )
            ).alias("frame_idx"),
        )
    )
