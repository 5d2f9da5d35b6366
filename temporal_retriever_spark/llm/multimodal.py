"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (this container ships no image/audio libraries — see
``set_decoder`` to plug a real one); the Spark-side contract — schema,
batching, partition sizing — is real and tested.

Scale notes: binary payloads dominate partition size, so reads should
set ``spark.sql.files.maxPartitionBytes`` low enough that a batch of
payloads fits executor memory, and transformations must never collect
or shuffle payloads unnecessarily (metadata-only projections prune the
binary column at the scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
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

#: canonical multimodal record schema
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta", StructType([
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("duration_ms", LongType()),
        ])),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_DECODER: Callable[[bytes, str], list[float]] | None = None


def set_decoder(fn: Callable[[bytes, str], list[float]] | None) -> None:
    """Install a real decode/feature kernel (payload, media_type) -> vector."""
    global _DECODER
    _DECODER = fn


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in features: bytes of the sha256 digest scaled
    to [0,1) — stable across runs/machines, no media libs required."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 256.0 for i in range(dim)]


def extract_features(
    media: DataFrame, *, batch_dim: int = 8, use_stub: bool = True
) -> DataFrame:
    """Decode+featurize via ``mapInPandas`` (Arrow batches of payloads).

    With ``use_stub=True`` (default in this container) the features are
    the deterministic sha256 stand-in; with a decoder installed via
    ``set_decoder`` the same plumbing carries real features. Raises
    ``NotImplementedError`` if ``use_stub=False`` and no decoder is set.
    """
    if not use_stub and _DECODER is None:
        raise NotImplementedError(
            "no media decoder installed in this environment; "
            "call set_decoder(fn) or use use_stub=True"
        )
    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_stub or decoder is None:
                feats = [_fake_features(p, batch_dim) for p in payloads]
            else:
                feats = [decoder(p, t) for p, t in zip(payloads, pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — column pruning must drop ``payload`` at
    the scan (verify with .explain: ReadSchema excludes payload)."""
    return media.groupBy("media_type").agg(
        F.count("media_id").alias("n_media"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.height")).alias("avg_height"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks (payload =
    seeded pseudo-random bytes; no external fixtures needed)."""
    import random

    rng = random.Random(seed)
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        mtype = types[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + (i % 50)))
        rows.append(
            (
                i,
                mtype,
                payload,
                {
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[mtype],
                    "width": 64 + (i % 8) * 16 if mtype != "audio" else None,
                    "height": 48 + (i % 6) * 16 if mtype != "audio" else None,
                    "duration_ms": (1000 + i * 33) if mtype != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
