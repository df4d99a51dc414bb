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
    IMAGE_FEATURES_SCHEMA.  Runs as mapInPandas — one pandas batch per
    Arrow batch per partition; no driver involvement.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                feats = decode_image_stub(payload, fake=fake)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "payload_bytes": len(payload),
                        "content_sha256": hashlib.sha256(payload).hexdigest(),
                        **feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return binary_df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


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
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image codecs unavailable; fake=True only")
            size = target_w * target_h
            rows = [
                {
                    "doc_id": int(i),
                    "payload": (bytes(p) * (size // max(len(bytes(p)), 1) + 1))[:size],
                    "width": target_w,
                    "height": target_h,
                }
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return binary_df.select(id_col, payload_col).mapInPandas(run, out_schema)


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
    way); a codec-backed variant would replace the chunk boundaries with
    container keyframe offsets.  Runs as mapInPandas — each Arrow batch is
    processed executor-side, one output row per sampled frame.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, stride):
                    chunk = payload[idx * frame_size : (idx + 1) * frame_size]
                    # hash the lowercase-hex encoding of the frame, not the
                    # raw bytes: equally content-addressing, but expressible
                    # in engines whose sha256 is VARCHAR-only (the DuckDB
                    # oracle slices hex(payload)); a raw-bytes variant is a
                    # one-line change.
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_bytes": len(chunk),
                            "frame_sha256": hashlib.sha256(
                                chunk.hex().encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return binary_df.select(id_col, payload_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)
