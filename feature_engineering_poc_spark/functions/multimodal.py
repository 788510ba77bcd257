"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(modality, format, width/height/duration). The Spark-side machinery —
schema, partition-aware batching, Arrow UDF signatures, output shapes —
is real and tested; the actual codecs are STUBBED (the decode libraries
are not in this container): ``decode_stub`` raises NotImplementedError
unless ``fake=True``, in which case it produces a deterministic fake
feature vector derived from the payload bytes, so pipelines exercise
the full path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("fmt", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("payload_bytes", T.IntegerType()),
    ]
)


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.lit("raw").alias("fmt"),
        F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return df


def decode_batch(batch: pd.DataFrame, feature_dim: int, fake: bool) -> pd.DataFrame:
    """Decode one Arrow batch of media rows into feature vectors.

    REAL decoders (PIL/librosa/ffmpeg) are not available in this
    container — the branch is explicit and marked. The fake path is a
    deterministic byte-fold so tests exercise batching/schema/shape.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/librosa/ffmpeg) are not installed; "
            "run with fake=True for the deterministic stub"
        )
    feats = []
    for payload in batch["payload"]:
        raw = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)
        reps = int(np.ceil(feature_dim / max(len(raw), 1)))
        feats.append(np.resize(np.tile(raw, reps), feature_dim) / 255.0)
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "modality": batch["modality"],
            "feature": [f.tolist() for f in feats],
            "payload_bytes": [len(p or b"") for p in batch["payload"]],
        }
    )


def extract_features(
    media: DataFrame, feature_dim: int = 16, fake: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Column pruning matters at scale: only the columns the kernel needs
    are selected before the Python boundary, so Arrow ships payload +
    ids, not the whole row.
    """
    pruned = media.select("media_id", "modality", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield decode_batch(b, feature_dim, fake)

    return pruned.mapInPandas(gen, FEATURE_SCHEMA)
