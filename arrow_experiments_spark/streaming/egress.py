"""Streaming egress: serve every micro-batch as an Arrow IPC stream
(SURVEY.md §7 Phase 5 / §3.1).

The reference's serving model is pre-materialized record batches replayed
through a fresh IPC writer per request (get_simple server.py:94-144,
pre-materialization at :144).  Structured Streaming's micro-batches map
onto it exactly: each ``foreachBatch`` invocation materializes one
result batch, which is registered in the ``DatasetRegistry`` and served
over the same negotiated-compression HTTP egress as any static dataset —
one logical plan, batch and streaming, one transport.

Clients discover batches through the catalog endpoint (the get_indirect
two-step shape): ``GET /catalog`` lists ``{prefix}.{batch_id}`` entries as
they appear; each is an independently fetchable Arrow stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from arrow_experiments_spark.transport.server import DatasetRegistry


def stream_to_registry(
    stream_df: DataFrame,
    registry: DatasetRegistry,
    prefix: str = "stream",
    output_mode: str = "append",
    timeout_sec: int = 120,
):
    """Run a streaming DataFrame with availableNow and publish each
    micro-batch to ``registry`` as ``{prefix}.{batch_id}``.

    Returns the finished StreamingQuery.  The foreachBatch body runs on
    the driver but the DataFrame→Arrow conversion executes as a normal
    Spark job over the executors; only the result batches land here —
    O(micro-batch) driver memory, the reference's own serving buffer
    shape.
    """

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        tbl = batch_df.toArrow()
        if tbl.num_rows:
            registry.register_table(f"{prefix}.{batch_id}", tbl)

    q = (
        stream_df.writeStream.foreachBatch(publish)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
