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
    spill_dir: str | None = None,
):
    """Run a streaming DataFrame with availableNow and publish each
    micro-batch to ``registry`` as ``{prefix}.{batch_id}``.

    Returns the finished StreamingQuery.  Each micro-batch is spilled to
    per-partition Arrow IPC files by the executors (bounded driver
    memory); the registry entry is a factory that re-streams the files
    per request — replay-many serving with O(batch) memory on both the
    publish and the serve side.  Spill files live until process exit (or
    until the caller removes ``spill_dir``).
    """
    from arrow_experiments_spark.sources.arrow_ipc import (
        spill_dataframe,
        spilled_files_reader,
    )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        _d, files, schema = spill_dataframe(batch_df, spill_dir)
        if files:
            registry.register(
                f"{prefix}.{batch_id}",
                lambda: spilled_files_reader(files, schema),
            )

    q = (
        stream_df.writeStream.foreachBatch(publish)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
