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
