"""Multimodal column handling (SURVEY.md §7): opaque binary payloads with
typed metadata.

The oracle-checkable query treats document text as an opaque UTF-8 blob
and derives metadata (byte length, sha256 content address) — the exact
shape a 100 TB image/audio corpus takes: ``binary`` payload column +
struct metadata, partitioned by content hash prefix.

The decode / feature-extract stage (which would need image/audio codecs
not present in this container) lives in
arrow_experiments_spark/functions/multimodal.py as mapInPandas plumbing
with a deterministic fake decoder — schema, batching, and partitioning are
real and tested; the codec call is stubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table


@register(
    "multimodal_binary_meta",
    "multimodal",
    doc="binary payload + typed metadata: byte length, sha256 content "
    "address, shard key (first hex nibble) — the content-addressed layout "
    "for multimodal corpora.",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               sha256(text) AS content_sha256,
               substring(sha256(text), 1, 1) AS shard_key,
               'text/plain' AS mime_type
        FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = F.encode(F.col("text"), "UTF-8")
    sha = F.sha2(F.col("text"), 256)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(payload).cast("bigint").alias("payload_bytes"),
        sha.alias("content_sha256"),
        F.substring(sha, 1, 1).alias("shard_key"),
        F.lit("text/plain").alias("mime_type"),
    )


def _hexbyte(h: str, k: int) -> str:
    """DuckDB SQL: k-th (0-based) byte of hex digest column ``h`` as int."""
    return (
        f"((strpos('0123456789abcdef', {h}[{2 * k + 1}]) - 1) * 16"
        f" + (strpos('0123456789abcdef', {h}[{2 * k + 2}]) - 1))"
    )


@register(
    "multimodal_image_features",
    "multimodal",
    doc="image decode / feature-extract plumbing over binary payloads via "
    "Arrow-batched mapInPandas (functions/multimodal.py): the codec is the "
    "deterministic sha256-derived fake (real decoders aren't in this "
    "container), so the whole executor-side pipeline — batch shape, "
    "schema, partitioning — is oracle-checkable.",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, encode(text) AS payload, sha256(text) AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(octet_length(payload) AS BIGINT) AS payload_bytes,
               h AS content_sha256,
               CAST(64 + {_hexbyte("h", 0)} % 192 AS INT) AS width,
               CAST(64 + {_hexbyte("h", 1)} % 192 AS INT) AS height,
               CAST(1 + {_hexbyte("h", 2)} % 4 AS INT) AS n_channels,
               CAST({_hexbyte("h", 4)} AS BIGINT) AS mean_luma
        FROM p
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.multimodal import (
        documents_as_binary,
        extract_image_features,
    )

    # 8-way: enough parallelism for the single-split test file while
    # keeping Python-worker fan-out modest; at scale the natural input
    # partitioning applies and this repartition coalesces via AQE.
    docs = table(spark, sf_dir, "documents").repartition(
        min(spark.sparkContext.defaultParallelism, 8)
    )
    return extract_image_features(
        documents_as_binary(docs), payload_col="payload", fake=True
    )


@register(
    "multimodal_frame_sample",
    "multimodal",
    doc="video/audio frame sampling: payload split into 256-byte frames, "
    "every 4th frame emitted with index/length/content hash — pure "
    "built-ins (sequence/explode + binary substring + sha2), no Python "
    "exchange; a codec-backed variant swaps only the index source.",
    oracle="""
        WITH p AS (
            SELECT doc_id, lower(hex(encode(text))) AS hx FROM documents
        ), f AS (
            SELECT doc_id, hx,
                   unnest(generate_series(
                       0, CAST(ceil((length(hx) / 2) / 256.0) AS INT) - 1, 4))
                       AS frame_idx
            FROM p
        )
        SELECT doc_id,
               CAST(frame_idx AS INT) AS frame_idx,
               CAST(length(substring(hx, frame_idx * 512 + 1, 512)) / 2
                    AS BIGINT) AS frame_bytes,
               sha256(substring(hx, frame_idx * 512 + 1, 512)) AS frame_sha256
        FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.multimodal import (
        documents_as_binary,
        frame_sample,
    )

    # 8-way: enough parallelism for the single-split test file while
    # keeping Python-worker fan-out modest; at scale the natural input
    # partitioning applies and this repartition coalesces via AQE.
    docs = table(spark, sf_dir, "documents").repartition(
        min(spark.sparkContext.defaultParallelism, 8)
    )
    return frame_sample(documents_as_binary(docs), frame_size=256, stride=4)


@register(
    "multimodal_resize",
    "multimodal",
    doc="image resize plumbing: mapInPandas payload→payload' with a "
    "deterministic repeat-and-truncate fake standing in for the codec "
    "(real resize swaps into resize_stub's batch loop unchanged); output "
    "checked by hex digest of the resized payload.  Arrow-batched Python "
    "exchange — the partitioning/batching shape of a real GPU/codec stage.",
    oracle="""
        SELECT doc_id,
               CAST(32 AS INT) AS width,
               CAST(32 AS INT) AS height,
               substring(
                   repeat(hex(CAST(text AS BLOB)),
                          CAST(1024 // greatest(length(text), 1) + 1 AS INT)),
                   1, 2048) AS payload_hex
        FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.multimodal import (
        documents_as_binary,
        resize_stub,
    )

    corpus = documents_as_binary(table(spark, sf_dir, "documents"))
    resized = resize_stub(corpus, target_w=32, target_h=32)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.hex("payload").alias("payload_hex"),
    )
