"""Multimodal columns — opaque binary payloads with typed metadata.

Driver-mandated EXT surface (BASELINE.json): treat image/audio/video as
``binary`` columns plus a typed metadata struct, with decode / feature
extraction / resize / frame-sampling as Arrow-batched pandas functions over
``mapInPandas``.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — each stub raises NotImplementedError or applies a
deterministic fake, clearly marked); the Spark-side plumbing — schema,
partition sizing, UDF signature, batch shape — is real and tested.

Scale notes: binary payloads dominate row size, so MEDIA_SCHEMA keeps
metadata in fixed columns (prunable without touching bytes);
``with_partitioning_for_media`` repartitions by byte budget, not row count,
so a 100 TB corpus of skewed assets still yields executor-sized tasks.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media kinds the pipeline recognizes
KIND_IMAGE = "image"
KIND_AUDIO = "audio"
KIND_VIDEO = "video"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),     # opaque bytes
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),      # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("feature_dim", IntegerType(), True),
        StructField("feature_norm", DoubleType(), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — real impl would be PIL/cv2 decode; not available in this
    container. Raises so pipelines fail loudly rather than fake-decode."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; wire PIL/cv2 here in production"
    )


def fake_feature_vector(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic FAKE feature extractor (clearly marked): hashes the
    payload into ``dim`` floats in [0, 1). Stands in for a real encoder so
    the distributed plumbing (batching, schema, partitioning) is testable.

    Construction is SQL-reproducible for the oracle gate: suffix is the ASCII
    digit of i (dim <= 10), and only 56 hash bits are used so the integer
    stays inside signed int64 in any engine.
    """
    assert dim <= 10, "fake extractor supports dim <= 10 (single-digit suffix)"
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.sha256(h + str(i).encode()).digest()
        out.append(int.from_bytes(d[:7], "big") / 2**56)
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` (not a row UDF): payload bytes cross the Python boundary
    once per Arrow batch. The fake encoder marks where a real model (or a
    GPU-backed batch scorer) slots in with the same signature.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for batch in batches:
            payloads = batch["payload"]
            feats = [fake_feature_vector(p if p is not None else b"", dim)
                     for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "feature_dim": [dim] * len(batch),
                    "feature_norm": [
                        math.sqrt(sum(x * x for x in f)) for f in feats
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    kernel=None,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads.

    ``kernel(payload, width, height) -> bytes`` is the decode+resize+encode
    step — STUBBED by default (raises via decode_image; no imaging libs in
    this container). The distributed plumbing (batch transfer, schema,
    metadata update) is real: pass any callable kernel (tests use an
    identity fake) and it runs per Arrow batch on executors.
    """
    if kernel is None:
        def kernel(payload: bytes, w: int, h: int) -> bytes:  # pragma: no cover
            decode_image(payload)  # raises NotImplementedError
            raise AssertionError("unreachable")

    out_schema = MEDIA_SCHEMA

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            payloads = [
                kernel(p, width, height) if p is not None else None
                for p in batch["payload"]
            ]
            batch = batch.assign(
                payload=payloads,
                n_bytes=[len(p) if p is not None else 0 for p in payloads],
                width=width,
                height=height,
            )
            yield batch

    return media.mapInPandas(_resize, schema=out_schema)


def with_partitioning_for_media(
    media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Repartition a media table by *byte budget* instead of row count.

    Binary columns skew hard (a video row can be 10^6x an icon row); row-count
    partitioning gives lopsided tasks. Estimate bytes via n_bytes and spread
    rows so each partition carries ~target bytes.
    """
    total = media.agg(F.sum("n_bytes").alias("b")).collect()[0].b or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return media.repartitionByRange(n_parts, F.col("n_bytes"), F.col("media_id"))


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sampling plan for video rows: explodes per-frame timestamps from
    duration metadata (no decode — the real frame grab is the stubbed kernel).
    Returns (media_id, frame_ts) — the work-list a decode stage would map."""
    return (
        media.filter(F.col("kind") == KIND_VIDEO)
        .filter(F.col("duration_s").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.col("duration_s") / every_s).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            (F.col("frame_idx") * every_s).alias("frame_ts"),
        )
    )
