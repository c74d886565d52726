"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shapes, UDF
signatures) is real and tested; the actual media decode is STUBBED —
the runtime has no image/audio libraries — behind a deterministic fake
(decode_stub=True) or NotImplementedError (decode_stub=False).

Pattern: mapInPandas over Arrow batches so each task processes a batch of
binary payloads at once; at scale, repartition by size bucket first so
batches are uniform and executors don't stall on one 4 GB video.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def _fake_decode(payload: bytes, n_features: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic fake: 'dimensions' and 'features' from payload bytes.

    md5, not ``hash()`` — Python's bytes hash is salted per process, so
    results would differ between runs (and between executors with
    different PYTHONHASHSEED). md5 specifically (over crc32) because an
    independent SQL engine can recompute it, making the stub
    oracle-checkable end to end.
    """
    import hashlib

    digest = hashlib.md5(bytes(payload) if payload is not None else b"").digest()
    h = int.from_bytes(digest[:8], "big")
    width = 64 + (h % 512)
    height = 64 + ((h >> 9) % 512)
    feats = [float((h >> (i * 4)) & 0xFF) / 255.0 for i in range(n_features)]
    return width, height, feats


DecodeFn = Callable[[bytes], "tuple[int, int, list[float]]"]


def extract_image_features(df: DataFrame, decode_stub: bool = True,
                           n_features: int = 8,
                           batch_size_hint: Optional[int] = None,
                           decode_fn: Optional[DecodeFn] = None) -> DataFrame:
    """Decode + feature-extract image payloads via mapInPandas.

    ``decode_fn`` plugs in a real decoder as a one-line swap where the
    runtime has one: any ``payload_bytes -> (width, height, features)``
    callable (e.g. a PIL/cv2 wrapper). It is serialized to executors with
    the UDF closure, so it must be importable/picklable. Default is the
    deterministic md5 stub, which keeps the pipeline oracle-checkable in
    runtimes without media libraries.
    """
    if decode_fn is None:
        if not decode_stub:
            raise NotImplementedError(
                "real image decode requires PIL/cv2, not present in this "
                "runtime — pass decode_fn to plug one in"
            )
        decode_fn = lambda payload: _fake_decode(payload, n_features)  # noqa: E731

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, f = decode_fn(payload)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(f)
            yield pd.DataFrame(out)

    cols = df.select("media_id", "payload")
    return cols.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


def repartition_by_size(df: DataFrame, n_partitions: int,
                        size_column: str = "n_bytes") -> DataFrame:
    """Range-partition by payload size so Arrow batches are uniform.

    Sorting by size within partitions groups like-sized payloads, keeping
    per-batch memory predictable — essential when payloads span 1 KB-1 GB.
    """
    return df.repartitionByRange(n_partitions, F.col(size_column))


def sample_video_frames(df: DataFrame, every_n: int = 30,
                        frame_count_column: str = "n_frames") -> DataFrame:
    """Frame-sampling plan: explode frame indices 0, n, 2n, ... per video.

    The decode of each sampled frame is the stubbed step; the fan-out
    (sequence + explode, JVM-side) is the real Spark plumbing.
    """
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col(frame_count_column) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return df.withColumn("frame_index", F.explode(idx))
