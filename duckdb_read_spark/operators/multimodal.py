"""Multimodal (image/audio/video) column plumbing (SURVEY north-star).

Media travel as opaque ``binary`` columns plus a typed metadata struct —
the lakehouse-native layout (one parquet row per asset, bytes inline or a
URI for large assets). Decode/feature kernels are Arrow-batched
``mapInPandas`` transforms so the Spark-side contract (schema, batch shape,
partitioning) is real and tested even where the actual codec library is
absent from this environment.

Codec status: pillow/librosa/av are NOT installed here. ``decode_image``
therefore runs a clearly-marked deterministic FAKE decoder (shape metadata
from a seeded hash of the bytes) unless ``strict=True``, in which case it
raises NotImplementedError at evaluation time. The surrounding plumbing —
schemas, batching, partition sizing — is the deliverable and is tested.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical asset schema: bytes + metadata. Large assets at 100 TB should
# set ``content=NULL`` and use ``uri`` (bytes-in-parquet works to ~a few MB
# per row; beyond that row groups bloat and scans slow down).
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("content", BinaryType(), True),
    StructField("uri", StringType(), True),
    StructField("media_type", StringType(), True),  # e.g. image/png
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("embedding", ArrayType(DoubleType()), True),
])


def _fake_decode(content: bytes, embed_dim: int) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real decoder: derives shape + a unit
    'embedding' from a hash of the bytes. Same bytes → same output on every
    executor."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    emb = [((h[(2 + i) % 32] / 255.0) * 2.0 - 1.0) for i in range(embed_dim)]
    return width, height, channels, emb


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    embed_dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Decode image bytes → (shape, embedding) via Arrow-batched mapInPandas.

    ``strict=True`` raises NotImplementedError (no codec library in this
    environment); default uses the deterministic fake so the pipeline shape
    is exercisable end-to-end.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image decode requires pillow; not available in this environment"
                )
            rows = [
                (int(i), *_fake_decode(c, embed_dim))
                for i, c in zip(pdf[id_col], pdf[content_col])
            ]
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "embedding"]
            )

    return df.select(id_col, content_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_count_col: str = "n_frames",
    id_col: str = "asset_id",
) -> DataFrame:
    """Frame-sampling plan for video assets: explode frame indices 0, n,
    2n, ... per asset — pure JVM (sequence + explode), the decode of each
    sampled frame is then a decode_image-style kernel."""
    # Zero-frame assets (empty/corrupt video) must yield no rows, not a
    # descending-sequence runtime error (same guard as ngram_shingles).
    idx = F.when(
        F.col(frame_count_col) > 0,
        F.sequence(F.lit(0), F.col(frame_count_col) - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("frame_idx", F.explode(idx))


def make_demo_assets(spark, n: int = 64) -> DataFrame:
    """Synthesize deterministic binary assets for tests (seeded bytes)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * 4
        rows.append((i, "image", bytearray(content), None, "image/fake"))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
