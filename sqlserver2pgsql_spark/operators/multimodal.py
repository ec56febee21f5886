"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

M7 extension. The container has no image/audio codecs, so the *decode* step
is stubbed (deterministic fake or NotImplementedError), but everything
Spark-side is real and tested: schema, Arrow batch shape, mapInPandas
signature, partition sizing.

Pattern for 100 TB: binary payloads ride in parquet as BinaryType columns;
decode/feature-extract runs as ``mapInPandas`` (Arrow batches, one Python
worker per core, no per-row serde); downstream ops see only the extracted
typed features, so the heavy bytes are column-pruned away the moment
they're consumed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, payload_hash string, "
    "feat_mean double, feat_dim int"
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeating byte pattern) so
    the plumbing is testable without codecs."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )
    payload = F.repeat(F.concat(F.lit("px"), (F.col("media_id") % 7).cast("string")), 32)
    return base.select(
        "media_id",
        "modality",
        F.encode(payload, "utf-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_media(payload: bytes, modality: str):  # pragma: no cover - stub
    """Real decoder hook — requires PIL/librosa/av, not present in this
    container. The Spark plumbing around it (extract_features) is real."""
    raise NotImplementedError(
        "media decoding requires image/audio codec libraries; "
        "extract_features uses a deterministic byte-level fake instead"
    )


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The feature computation here is a deterministic byte-level fake (md5 +
    mean byte value) standing in for decode→embed; the batch iteration,
    schema contract, and column pruning behavior are the real thing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            payload_hash = payloads.map(
                lambda b: hashlib.md5(b).hexdigest() if b is not None else None
            )
            feat_mean = payloads.map(
                lambda b: (sum(b) / len(b)) if b else 0.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "payload_hash": payload_hash,
                    "feat_mean": feat_mean,
                    "feat_dim": 1,
                }
            )

    return df.select("media_id", "modality", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = "media_id long, payload binary, width int, height int"


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing (1→1): Arrow batches in, resized payload +
    dimensions out. The pixel work is a deterministic fake (no codecs in
    this container — a real impl drops PIL into ``_fake_resize``); the
    schema contract, batch shape, and column pruning are real."""

    def _fake_resize(payload: bytes) -> bytes:
        # stand-in for decode→resize→re-encode: size-normalized byte pattern
        return (payload or b"\x00")[:16].ljust(16, b"\x00") * (width * height // 256 or 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(_fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return (
        df.filter(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=RESIZED_SCHEMA)
    )


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms long, frame_payload binary"


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing (1→N row expansion inside mapInPandas):
    each video row yields up to ``max_frames`` frame rows. Frame bytes are a
    deterministic fake slice of the payload; the expansion shape (row
    multiplication inside an Arrow batch) is the real contract a decoder
    plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ms": [],
                "frame_payload": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload or b"") // 16))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame_payload"].append((payload or b"")[i * 16 : (i + 1) * 16])
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=FRAME_SCHEMA)
    )
