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


def upsert_snapshot_sink(
    stream_df: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    order_col: str,
    timeout_sec: int = 120,
    checkpoint_dir: str | None = None,
    prepare=None,
    n_buckets: int = 32,
):
    """foreachBatch incremental UPSERT into a keyed parquet snapshot —
    the streaming twin of the batch ``pipeline_snapshot_upsert``
    operator, and the plain-parquet seat of a Delta/Iceberg ``MERGE
    INTO``: each micro-batch merges into the current snapshot with
    latest-``order_col``-wins-per-key semantics (ties broken by
    preferring the incoming row, exactly as a MERGE's WHEN MATCHED
    clause would).

    Without a table format, atomicity comes from versioned directories:
    each merged snapshot writes to ``{snapshot_dir}/v{N}`` and a
    ``LATEST`` pointer file is swapped via atomic rename afterwards —
    readers following the pointer never observe a partial write, and a
    crashed batch leaves the previous version intact.  Superseded
    versions older than the previous one are pruned after each commit
    (the previous version stays for in-flight readers).  Returns the
    finished query; read the result with :func:`read_snapshot`.

    The version write is O(delta), not O(snapshot) (r8 verdict #4): the
    snapshot is hash-bucketed on the key (``_bucket =
    pmod(xxhash64(key), n_buckets)``, a hive-partitioned layout), each
    micro-batch rewrites ONLY the buckets its keys touch (the merge
    reads them back with partition pruning), and every untouched bucket
    is HARD-LINKED from the committed version into the new one — zero
    data movement, and the pruner's ``rmtree`` of superseded versions
    can never strand a reader because linked files live until their
    last version drops them.  A pre-bucketing (flat) committed version
    is migrated wholesale on its first merge.  At 100 TB this is
    partitioned MERGE INTO: bucket count scales with the corpus, the
    delta's shuffle is delta-sized, and the object-store seat of the
    hard link is a manifest entry instead.

    Crash-replay idempotence is keyed on foreachBatch batch ids, which
    are only durable/monotonic when the query has a checkpoint — so the
    contract is split on ``checkpoint_dir``:

    * ``checkpoint_dir`` set: the query runs with that
      ``checkpointLocation``; batch ids never repeat except on a true
      crash-after-commit replay, where the pointer already names
      ``v{batch_id}`` and the merge is SKIPPED (re-merging would lazily
      read the very directory the rewrite deletes out from under the
      running job).  Version ids are additionally clamped to stay ABOVE
      the committed version, so attaching a checkpointed query to a
      snapshot previously advanced without one keeps ids monotonic
      instead of writing below LATEST and tricking the pruner into
      deleting it.
    * ``checkpoint_dir`` unset: batch ids restart at 0 on every run, so
      they cannot identify replays.  Versions are instead allocated past
      whatever ``LATEST`` names (``committed + 1``) and NOTHING is ever
      skipped — a second run against an existing snapshot merges its
      first micro-batch instead of silently discarding it.

    ``prepare``: optional ``(batch_df, current_snapshot | None) ->
    DataFrame`` hook run before the keyed merge — the seam for
    delta-vs-snapshot gating (quality filters, seen-before anti-joins)
    that must see the committed snapshot, not just the incoming rows.
    When the committed version carries the current bucket geometry, the
    snapshot frame handed to the hook RETAINS the ``_bucket`` layout
    column (``pmod(xxhash64(key), n_buckets)``) so a hook that filters
    on it gets partition-pruned reads — the bucketed-fingerprint
    anti-join shape; hooks must not emit ``_bucket`` in their output.
    Its output defines the snapshot schema and must contain ``key_cols``
    and ``order_col``.
    """
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = stream_df.sparkSession
    os.makedirs(snapshot_dir, exist_ok=True)
    pointer = os.path.join(snapshot_dir, "LATEST")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        committed: str | None = None
        if os.path.exists(pointer):
            with open(pointer) as f:
                committed = f.read().strip()
        if checkpoint_dir is not None:
            if committed == f"v{batch_id}":
                return  # replay of an already-committed batch — idempotent skip
            # Mode-mixing guard (ADVICE r7): a checkpointed query attached
            # to a snapshot previously advanced without a checkpoint
            # restarts at batch 0 while LATEST names some vN > 0; writing
            # v{batch_id} would slot BELOW the committed version and the
            # pruner would delete vN.  Version ids must stay monotonic, so
            # allocate past whatever is committed.  (A crash-replay in that
            # mixed state re-merges instead of skipping — content-idempotent
            # under latest-wins, it just burns one version number.)
            seq = batch_id
            if committed is not None:
                seq = max(batch_id, int(committed[1:]) + 1)
        else:
            # no durable checkpoint → batch ids are per-run; continue the
            # snapshot's own version sequence and never skip
            seq = int(committed[1:]) + 1 if committed else batch_id
        version = f"v{seq}"
        current = read_snapshot(spark, snapshot_dir)
        if prepare is not None:
            cur_prepare = current
            if committed is not None:
                vdir_c = os.path.join(snapshot_dir, committed)
                if _version_layout(vdir_c) == n_buckets:
                    # matching geometry: keep the _bucket partition column
                    # so the hook's filters prune at the parquet read
                    cur_prepare = spark.read.parquet(vdir_c)
            batch_df = prepare(batch_df, cur_prepare)
        bucket = F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
        inc = (
            batch_df.withColumn("_bucket", bucket)
            .withColumn("_src", F.lit(1))
            .persist()  # touched-bucket probe + merge share one compute
        )
        linked: list[str] = []
        try:
            if current is None:
                merged = inc
            else:
                vdir_committed = os.path.join(snapshot_dir, committed)
                raw = spark.read.parquet(vdir_committed)
                touched = {
                    r["_bucket"]
                    for r in inc.select("_bucket").distinct().collect()
                }
                committed_buckets = _version_layout(vdir_committed)
                if "_bucket" in raw.columns and committed_buckets == n_buckets:
                    # same bucket geometry: read back ONLY the touched
                    # buckets (partition pruning) and link the rest verbatim
                    cur = raw.filter(
                        F.col("_bucket").isin([int(t) for t in touched])
                        | F.col("_bucket").isNull()
                    )
                    for d in os.listdir(vdir_committed):
                        if not d.startswith("_bucket="):
                            continue
                        val = d.split("=", 1)[1]
                        if val.isdigit() and int(val) not in touched:
                            linked.append(d)
                else:
                    # legacy flat version, or the caller changed n_buckets:
                    # migrate wholesale this once.  Pruning against a
                    # DIFFERENT geometry would match stale bucket ids and
                    # leave the same key alive in a linked old bucket and
                    # a rewritten new one — silent duplicates — so a
                    # geometry change always re-buckets everything.
                    if "_bucket" in raw.columns:
                        raw = raw.drop("_bucket")
                    cur = raw.withColumn("_bucket", bucket)
                merged = inc.unionByName(cur.withColumn("_src", F.lit(0)))
            w = Window.partitionBy(*key_cols).orderBy(
                F.desc(order_col), F.desc("_src")
            )
            out = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )
            vdir = os.path.join(snapshot_dir, version)
            # align the write to the bucket layout: without this, every
            # shuffle task holding rows of a touched bucket emits its own
            # file there (up to shuffle.partitions small files per bucket
            # per version — file-count explosion at warehouse scale); the
            # extra exchange is delta+touched-bucket sized
            out.repartition("_bucket").write.mode("overwrite").partitionBy(
                "_bucket"
            ).parquet(vdir)
        finally:
            inc.unpersist()
        for d in linked:
            sdir = os.path.join(snapshot_dir, committed, d)
            ddir = os.path.join(vdir, d)
            os.makedirs(ddir, exist_ok=True)
            for fn in os.listdir(sdir):
                sp = os.path.join(sdir, fn)
                if os.path.isfile(sp):
                    try:
                        os.link(sp, os.path.join(ddir, fn))
                    except OSError:  # cross-device / FS without links
                        shutil.copy2(sp, os.path.join(ddir, fn))
        # record the bucket geometry the version was written under — the
        # next merge prunes only when its n_buckets matches
        import json as _json

        with open(os.path.join(vdir, "_LAYOUT.json"), "w") as f:
            _json.dump({"n_buckets": n_buckets}, f)
        tmp = pointer + f".tmp{seq}"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, pointer)  # atomic swap — the "commit"
        # prune versions older than the PREVIOUS one (kept for readers
        # that resolved the pointer just before the swap); hard-linked
        # bucket files survive until their last referencing version goes
        prev = _prev_version(snapshot_dir, seq)
        keep = {version} | ({f"v{prev}"} if prev is not None else set())
        for d in os.listdir(snapshot_dir):
            if d.startswith("v") and d not in keep:
                shutil.rmtree(os.path.join(snapshot_dir, d), ignore_errors=True)

    writer = (
        stream_df.writeStream.foreachBatch(merge)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"upsert stream did not finish within {timeout_sec}s — the "
            f"snapshot at {snapshot_dir} reflects only the committed "
            f"micro-batches"
        )
    return q


def incremental_curation_sink(
    stream_df: DataFrame,
    snapshot_dir: str,
    timeout_sec: int = 120,
    checkpoint_dir: str | None = None,
    n_buckets: int = 32,
):
    """The curation funnel as a daily-delta job: each micro-batch of raw
    documents passes (1) the row-local quality gate (the
    pipeline_curate_end_to_end thresholds: ≥ 20 tokens, distinct ratio
    ≥ 0.4, stopword ratio ≥ 0.05), (2) in-batch exact dedup (first =
    lowest doc_id per content hash), and (3) the have-we-ingested-this
    anti-join against the committed snapshot's content hashes
    (pipeline_dedup_incremental's gate), then upserts the survivors into
    the versioned snapshot.  The snapshot IS the curated corpus, and
    each micro-batch pays only delta-sized tokenize plus one anti-join
    keyed on the hash — never a full-corpus rescan.  The snapshot side
    of that anti-join is BUCKET-PRUNED: same hash ⇒ same bucket, so
    only the buckets the delta's hashes land in are read back (the
    delta's touched-bucket set comes from a cheap md5+xxhash pass over
    the raw batch, a superset of the gated survivors' buckets) — the
    bucketed-by-hash fingerprint-table shape a 100 TB warehouse runs,
    made concrete by the versioned layout.

    Expects ``doc_id`` and ``text`` columns; the snapshot carries the
    batch columns plus ``content_hash``.  First-seen-wins across
    micro-batches (arrival order), min-doc_id-wins within one batch.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from arrow_experiments_spark.functions.text import (
        EN_STOPWORDS,
        md5_str,
        tokens,
    )

    def prepare(batch_df: DataFrame, current: DataFrame | None) -> DataFrame:
        toks = tokens(F.col("text"))
        n = F.size(toks)
        sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
        dr = F.try_divide(F.size(F.array_distinct(toks)).cast("double"), n)
        sr = F.try_divide(
            F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
                "double"
            ),
            n,
        )
        gated = batch_df.where((n >= 20) & (dr >= 0.4) & (sr >= 0.05))
        hashed = gated.withColumn("content_hash", md5_str(F.col("text")))
        w = Window.partitionBy("content_hash").orderBy("doc_id")
        firsts = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if current is not None:
            seen = current.select(
                "content_hash",
                *(["_bucket"] if "_bucket" in current.columns else []),
            )
            if "_bucket" in seen.columns:
                # prune the fingerprint read to the delta's buckets —
                # sound because equal hashes share a bucket, and the
                # touched set comes from ALL raw hashes (a superset of
                # the gated survivors')
                bucket = F.pmod(
                    F.xxhash64(md5_str(F.col("text"))), F.lit(n_buckets)
                ).cast("int")
                touched = [
                    r["b"]
                    for r in batch_df.select(bucket.alias("b"))
                    .distinct()
                    .collect()
                ]
                seen = seen.filter(F.col("_bucket").isin(touched)).select(
                    "content_hash"
                )
            firsts = firsts.join(seen, "content_hash", "left_anti")
        return firsts

    return upsert_snapshot_sink(
        stream_df,
        snapshot_dir,
        key_cols=["content_hash"],
        order_col="doc_id",
        timeout_sec=timeout_sec,
        checkpoint_dir=checkpoint_dir,
        prepare=prepare,
        n_buckets=n_buckets,
    )


def _version_layout(vdir: str) -> int | None:
    """The bucket count a version directory was written under, or None
    (pre-layout versions and flat legacy snapshots)."""
    import json
    import os

    path = os.path.join(vdir, "_LAYOUT.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return int(json.load(f)["n_buckets"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _prev_version(snapshot_dir: str, batch_id: int) -> int | None:
    """Largest committed version id strictly below ``batch_id``."""
    import os

    prior = [
        int(d[1:])
        for d in os.listdir(snapshot_dir)
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
    ]
    return max(prior) if prior else None


def read_snapshot(spark, snapshot_dir: str) -> DataFrame | None:
    """Current snapshot per the LATEST pointer, or None before the first
    commit.  The ``_bucket`` layout column (hash-bucketed versions) is
    internal and dropped — the logical snapshot schema is the merged
    rows alone; filters on the key still prune buckets when callers
    re-derive the bucket, and the incremental merge path reads the
    partitioned form directly."""
    import os

    pointer = os.path.join(snapshot_dir, "LATEST")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        version = f.read().strip()
    df = spark.read.parquet(os.path.join(snapshot_dir, version))
    if "_bucket" in df.columns:
        df = df.drop("_bucket")
    return df


def snapshot_reader_factory(snapshot_dir: str):
    """RecordBatchReader factory over a versioned snapshot — the egress
    seam that closes the funnel loop (r7 verdict #7): the LATEST pointer
    is resolved AT REQUEST TIME, so the endpoint always serves the
    current survivors, and the versioned-dir contract (previous version
    kept for in-flight readers, atomic pointer swap) means the resolved
    version's files stay put for the duration of the read even if a
    micro-batch commits mid-response.  Pure pyarrow — no Spark job per
    request.  Returns None before the first commit (the server turns
    that into a 404)."""
    import os

    import pyarrow.dataset as pads

    def factory():
        pointer = os.path.join(snapshot_dir, "LATEST")
        if not os.path.exists(pointer):
            return None
        with open(pointer) as f:
            version = f.read().strip()
        # ignore_prefixes: pyarrow's default ['.', '_'] would skip the
        # hash-bucketed '_bucket=' layout dirs entirely — keep only the
        # genuinely-hidden prefixes (Spark's _SUCCESS/_committed markers
        # and dotfiles).  No partitioning is passed, so the served schema
        # is the data schema alone (the _bucket value never leaves the
        # directory name).
        d = pads.dataset(
            os.path.join(snapshot_dir, version),
            format="parquet",
            ignore_prefixes=[
                ".", "_SUCCESS", "_committed", "_started", "_LAYOUT",
            ],
        )
        return d.scanner().to_reader()

    return factory


def register_snapshot(registry, name: str, snapshot_dir: str) -> None:
    """Expose a versioned snapshot through the HTTP catalog:
    ``GET /catalog`` lists it, ``GET /datasets/{name}`` streams the
    current version as Arrow — the reference's get_indirect two-step
    (catalog → dataset URI) over the funnel's LIVE output instead of a
    static artifact."""
    registry.register(
        name,
        snapshot_reader_factory(snapshot_dir),
        meta={"kind": "snapshot", "snapshot_dir": snapshot_dir},
    )
