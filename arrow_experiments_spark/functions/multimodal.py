"""Multimodal decode / feature-extract plumbing (SURVEY.md §7 north star).

The Spark side is real: schemas, Arrow-batched ``mapInPandas`` over binary
payload columns, partition-friendly shapes.  The codec calls are NOT —
image/audio libraries are not in this container, so the decode step is
stubbed: ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake (derived from the
payload's sha256) stands in so the pipeline shape is testable end-to-end.

At 100 TB: payloads stay in executor memory one Arrow batch at a time
(mapInPandas streams batches); never collected.  Content-hash shard keys
(operators/multimodal.py) give uniform partitioning for the downstream
groupBy/join stages.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("mean_luma", LongType()),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload → (width, height, channels, mean_luma).

    STUB: real decoding needs an image codec library not present in this
    container.  With ``fake=True`` returns a deterministic fake derived
    from the payload hash, so the Spark plumbing (batching, schema,
    partitioning) is fully exercised.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic test double"
        )
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_channels": 1 + h[2] % 4,
        "mean_luma": int.from_bytes(h[3:5], "big") % 256,
    }


def extract_image_features(
    binary_df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary payload column.

    Input: DataFrame with (id_col long, payload_col binary).  Output:
    IMAGE_FEATURES_SCHEMA.  Only the codec call crosses into Python
    (mapInPandas, one pandas batch per Arrow batch per partition); the
    byte length and content address are Spark built-ins (``F.length`` /
    ``F.sha2``) computed JVM-side below the exchange and passed through —
    at 100 TB the Python workers do codec work only, nothing that
    whole-stage codegen could have done.
    """

    prepared = binary_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(payload_col).cast("long").alias("payload_bytes"),
        F.lower(F.sha2(payload_col, 256)).alias("content_sha256"),
        F.col(payload_col).alias("__payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_stub(bytes(p), fake=fake) for p in pdf["__payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload_bytes": pdf["payload_bytes"].values,
                    "content_sha256": pdf["content_sha256"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                }
            )

    return prepared.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_stub(
    binary_df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Resize plumbing: payload → payload' (stubbed transform).  The fake
    'resize' truncates/pads the payload deterministically so output sizes
    are checkable; a real implementation swaps in a codec call."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image codecs unavailable; fake=True only")
            size = target_w * target_h
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": [
                        (bytes(p) * (size // max(len(bytes(p)), 1) + 1))[:size]
                        for p in pdf[payload_col]
                    ],
                }
            )

    # Only the payload transform (the codec stand-in) runs in Python; the
    # constant output dimensions are Spark-side literals.
    transformed = binary_df.select(id_col, payload_col).mapInPandas(
        run, StructType([StructField("doc_id", LongType()), StructField("payload", BinaryType())])
    )
    return transformed.select(
        "doc_id",
        "payload",
        F.lit(target_w).cast("int").alias("width"),
        F.lit(target_h).cast("int").alias("height"),
    )


def documents_as_binary(documents: DataFrame) -> DataFrame:
    """Adapter: the documents table as a (doc_id, payload, meta) multimodal
    corpus — text bytes standing in for image/audio payloads."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime_type"),
            F.col("n_chars").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)


def frame_sample(
    binary_df: DataFrame,
    frame_size: int = 256,
    stride: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for video/audio-shaped payloads: treat the payload
    as consecutive ``frame_size``-byte frames and emit every ``stride``-th
    frame's index, byte length, and content hash.

    The chunking arithmetic is the real operator (it is codec-free: MJPEG
    frames, PCM audio blocks, and TFRecord-style shards all sample this
    way), so NO Python exchange is needed: frame indices come from an
    exploded ``sequence``, the slice from ``substring`` on the binary
    payload, the content address from ``sha2`` — all whole-stage-codegen
    built-ins.  A codec-backed variant (container keyframe offsets) would
    swap the index sequence for a mapInPandas probe of the container, and
    only that.

    The hash is over the lowercase-hex encoding of the frame, not the raw
    bytes: equally content-addressing, but expressible in engines whose
    sha256 is VARCHAR-only (the DuckDB oracle slices hex(payload)); a
    raw-bytes variant is a one-line change.
    """
    payload = F.col(payload_col)
    n_frames = F.floor((F.length(payload) + F.lit(frame_size - 1)) / F.lit(frame_size))
    idx_seq = F.when(
        n_frames > 0,
        F.sequence(F.lit(0), (n_frames - 1).cast("int"), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        binary_df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            payload.alias("__payload"),
            F.explode(idx_seq).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.length(F.substring(F.col("__payload"), F.col("frame_idx") * frame_size + 1, frame_size))
            .cast("long")
            .alias("frame_bytes"),
            F.sha2(F.lower(F.hex(F.substring(F.col("__payload"), F.col("frame_idx") * frame_size + 1, frame_size))), 256)
            .alias("frame_sha256"),
        )
    )
