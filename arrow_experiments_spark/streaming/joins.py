"""Stream-stream interval join (SURVEY.md §2.6 Streaming row).

The reference has no streaming joins — its serving loop replays static
batches (http/get_simple/python/server/http.server/server.py:94-144) — but
an event pipeline consuming two live streams needs one: attribute each
purchase to the same-user views it follows within a horizon.  Spark's
stream-stream inner join keeps per-key state on both sides; the watermark
plus the two-sided time bound (``pts >= vts AND pts < vts + horizon``) is
what lets it evict state, so both are mandatory here, not tuning.

The builder is shared verbatim by the batch oracle query
(operators/events.py:events_interval_join) — one logical plan, two
execution modes, which is the whole §2.6 streaming contract.  At scale the
join shuffles both sides on user_id only (no time-bucket explosion);
state size is bounded by horizon × per-user event rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Inner interval join: purchases within ``horizon`` after a same-user
    view.  ``watermark`` (streaming only) bounds late data AND join state;
    leave None for batch inputs, where watermarks are meaningless."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("vts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("pts"),
    )
    if watermark is not None:
        v = v.withWatermark("vts", watermark)
        p = p.withWatermark("pts", watermark)
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") < F.col("vts") + F.expr(f"INTERVAL {horizon}")),
        )
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            F.timestamp_diff("MICROSECOND", F.col("vts"), F.col("pts"))
            .cast("bigint")
            .alias("lag_us"),
        )
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, key: str = "event_type") -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live event stream.  The static side is re-read per micro-batch (so a
    refreshed dimension table takes effect without restarting the query)
    and carries no state — unlike the stream-stream join above, nothing
    here needs a watermark.  At scale the static side is dimension-sized:
    Spark plans a broadcast join per micro-batch, so the stream never
    shuffles.  The SAME builder serves the batch oracle (one logical
    plan, two execution modes — the §2.6 streaming contract)."""
    prefixed = dim.select(
        F.col(key),
        *[F.col(c).alias(f"dim_{c}") for c in dim.columns if c != key],
    )
    return events.join(prefixed, key, "left")
