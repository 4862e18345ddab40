"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas``. The decode kernels are
STUBBED (image/audio libraries are not in this container): a
deterministic fake decoder keeps the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and testable, and a
clearly-marked NotImplementedError marks where a real codec plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
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
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("decode_error", StringType()),
    ]
)

FEATURE_DIM = 16


def real_decode(content: bytes, media_type: str):
    """Plug point for an actual codec (PIL/ffmpeg/torchaudio).

    Not available in this environment — the pipeline routes through
    :func:`fake_decode` unless a codec is installed and passed in.
    """
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "inject a decoder or use fake_decode for plumbing tests"
    )


def fake_decode(content: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in feature extractor.

    Produces a FEATURE_DIM-vector from the md5 of the bytes so tests and
    benchmarks exercise real Arrow batch shapes end-to-end.
    """
    digest = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def media_feature_batches(decoder=fake_decode):
    """mapInPandas kernel: (media_ref, media_type, content) → features.

    Batch-shaped: one pandas DataFrame in, one out; the decoder runs
    per element but over Arrow-transferred bytes (no per-row Python UDF
    serialization). Decode failures land in ``decode_error`` instead of
    failing the task — at 10^12 scale a poisoned blob must not kill a
    partition.
    """

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats, errs = [], []
            for content, mtype in zip(pdf["content"], pdf["media_type"]):
                try:
                    feats.append(decoder(content, mtype))
                    errs.append(None)
                except NotImplementedError as e:  # codec missing
                    feats.append(None)
                    errs.append(str(e))
                except Exception as e:  # poisoned blob
                    feats.append(None)
                    errs.append(f"decode failed: {e}")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return fn


def extract_media_features(media_df: DataFrame, decoder=fake_decode) -> DataFrame:
    """media table → feature table. Narrow map, no shuffle; partition
    count should track total bytes, not row count (blobs are the skew
    unit — repartition upstream by size class like mega-documents)."""
    cols = [c for c in ("media_ref", "media_type", "content") if c in media_df.columns]
    return media_df.select(*cols).mapInPandas(
        media_feature_batches(decoder), schema=MEDIA_FEATURES_SCHEMA
    )
