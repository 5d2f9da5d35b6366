"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages. Two kernel sets exist:

* **real codecs** (``install_default_kernels`` / ``llm.codecs``):
  pure-numpy BMP / WAV-PCM / AVI-DIB parsers — actual decode, resize,
  and frame extraction with no third-party libraries;
* **deterministic stubs** (``use_stub=True``): sha256 stand-ins whose
  outputs any SQL engine can reproduce, which is what makes the
  mapInPandas plumbing oracle-checkable end-to-end. Formats the real
  codecs don't cover (JPEG/MP3/H.264 need libraries this container
  lacks) still flow through the same stages via ``set_decoder``.

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

#: one frame sampled out of a video/audio payload
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)

_DECODER: Callable[[bytes, str], list[float]] | None = None
_RESIZER: Callable[[bytes, int, int], bytes] | None = None
_FRAME_SAMPLER: Callable[[bytes, int], bytes] | None = None


def set_decoder(fn: Callable[[bytes, str], list[float]] | None) -> None:
    """Install a real decode/feature kernel (payload, media_type) -> vector."""
    global _DECODER
    _DECODER = fn


def set_resizer(fn: Callable[[bytes, int, int], bytes] | None) -> None:
    """Install a real resize kernel (payload, width, height) -> payload."""
    global _RESIZER
    _RESIZER = fn


def set_frame_sampler(fn: Callable[[bytes, int], bytes] | None) -> None:
    """Install a real frame-decode kernel (payload, ts_ms) -> frame bytes."""
    global _FRAME_SAMPLER
    _FRAME_SAMPLER = fn


def install_default_kernels() -> None:
    """Install the real pure-numpy codecs (``llm.codecs``) as the decode /
    resize / frame kernels: BMP images, WAV PCM audio, AVI DIB video.
    After this, ``extract_features(..., use_stub=False)`` etc. run real
    decoders with no third-party libraries."""
    from temporal_retriever_spark.llm import codecs

    set_decoder(codecs.decode_features)
    set_resizer(codecs.resize_payload)
    set_frame_sampler(codecs.sample_frame)


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


def _stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: the hex sha256 of (payload ‖
    '@WxH'), ASCII-encoded. A real kernel returns re-encoded pixels; the
    stub returns a 64-byte proxy that is (a) a pure function of the
    inputs and (b) reproducible by any engine that can hash strings —
    which is what makes the plumbing oracle-checkable end-to-end."""
    tag = f"@{width}x{height}".encode()
    return hashlib.sha256(payload + tag).hexdigest().encode()


def resize_images(
    media: DataFrame, *, width: int, height: int, use_stub: bool = True
) -> DataFrame:
    """Resize image/video payloads via ``mapInPandas`` (Arrow batches).

    Audio rows pass through untouched (no spatial dims). The output
    keeps ``MEDIA_SCHEMA``; ``meta.width``/``meta.height`` are set to
    the target for resized rows. With ``use_stub=True`` the pixel
    kernel is the deterministic sha256 stand-in (`_stub_resize`); a
    real decoder installed via ``set_resizer`` rides the identical
    plumbing. The batch shape matters at scale: payloads stream
    through Arrow once, nothing is collected, and the binary column
    never shuffles (narrow transformation — partitioning preserved).
    """
    if not use_stub and _RESIZER is None:
        raise NotImplementedError(
            "no resize kernel installed; call set_resizer(fn) or use use_stub=True"
        )
    resizer = _RESIZER if not use_stub else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            spatial = out["media_type"].isin(("image", "video"))
            resized = [
                (resizer or _stub_resize)(p, width, height) if s else p
                for p, s in zip(out["payload"], spatial)
            ]
            out["payload"] = resized
            out["meta"] = [
                {**(m or {}), "width": width, "height": height} if s else m
                for m, s in zip(out["meta"], spatial)
            ]
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def _stub_frame(payload: bytes, ts_ms: int) -> bytes:
    """Deterministic frame stand-in: hex sha256 of (payload ‖ '#ts'),
    ASCII-encoded — same oracle-checkable contract as `_stub_resize`."""
    return hashlib.sha256(payload + b"#" + str(ts_ms).encode()).hexdigest().encode()


def sample_frames(
    media: DataFrame, *, interval_ms: int = 500, use_stub: bool = True
) -> DataFrame:
    """Sample frames every ``interval_ms`` from timed payloads.

    One input row fans out to ``ceil(duration_ms / interval_ms)`` frame
    rows at timestamps 0, interval, 2·interval, …; rows with NULL
    ``meta.duration_ms`` (e.g. still images) emit nothing. This is the
    flat-map shape of video decode at scale: the expansion happens
    inside ``mapInPandas`` so frames inherit the payload's partition —
    no shuffle — and downstream feature extraction runs where the bytes
    already live. With ``use_stub=True`` frames are the deterministic
    sha256 stand-in; ``set_frame_sampler`` installs a real decoder on
    the identical plumbing.
    """
    if interval_ms <= 0:
        raise ValueError("interval_ms must be positive")
    if not use_stub and _FRAME_SAMPLER is None:
        raise NotImplementedError(
            "no frame kernel installed; call set_frame_sampler(fn) or use use_stub=True"
        )
    sampler = _FRAME_SAMPLER if not use_stub else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, idxs, tss, frames = [], [], [], [], []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                duration = (meta or {}).get("duration_ms")
                if duration is None or pd.isna(duration):
                    continue
                n_frames = -(-int(duration) // interval_ms)  # ceil
                for i in range(n_frames):
                    ts = i * interval_ms
                    ids.append(mid)
                    types.append(mtype)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append((sampler or _stub_frame)(payload, ts))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "media_type": pd.Series(types, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def repartition_for_payloads(
    media: DataFrame, *, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Right-size partitions for binary-heavy frames.

    Parquet row-group splitting under ``maxPartitionBytes`` uses the
    *encoded* size; decoded payloads can be far larger, so a partition
    that scans fine can still blow executor memory once materialized in
    an Arrow batch. This helper measures the actual payload bytes (one
    metadata-cheap aggregate — the scan reads only octet lengths) and
    repartitions so each partition carries ≈``target_partition_bytes``.
    The repartition IS a payload shuffle — use it once at ingest,
    before fan-out stages like `sample_frames`, not per-query.
    """
    total = media.select(
        F.sum(F.octet_length("payload")).alias("b")
    ).first()["b"] or 0
    n = max(1, -(-int(total) // int(target_partition_bytes)))
    return media.repartition(n)


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


def synthetic_media_real(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: BMP images, WAV
    PCM audio, AVI DIB video — decodable by the ``llm.codecs`` kernels
    (``install_default_kernels``), no external fixtures or libraries."""
    import numpy as np

    from temporal_retriever_spark.llm import codecs

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if mtype == "image":
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            payload, fmt = codecs.encode_bmp(arr), "bmp"
            meta = {"format": fmt, "width": w, "height": h, "duration_ms": None}
        elif mtype == "audio":
            rate, freq = 8000, 200 + 50 * (i % 5)
            dur_s = 0.25 + 0.05 * (i % 4)
            t = np.arange(int(rate * dur_s)) / rate
            samples = (10_000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
            payload, fmt = codecs.encode_wav(samples, rate), "wav"
            meta = {
                "format": fmt,
                "width": None,
                "height": None,
                "duration_ms": int(1000 * len(samples) / rate),
            }
        else:
            w, h, fps = 16, 12, 10
            n_frames = 3 + (i % 3)
            frames = [
                rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                for _ in range(n_frames)
            ]
            payload, fmt = codecs.encode_avi(frames, fps=fps), "avi"
            meta = {
                "format": fmt,
                "width": w,
                "height": h,
                "duration_ms": int(1000 * n_frames / fps),
            }
        rows.append((i, mtype, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
