"""Session posture pins.

The session factory encodes the engine's scale posture (SURVEY.md §1.3:
AQE on, Arrow interop on, size-based shuffle coalescing).  These tests
pin the load-bearing confs and the coalescing mechanism itself — the
r12 floor work measured a delta-sized reduce stage at 1 task vs
``shuffle.partitions`` tasks as the single largest cut of the gate
sinks' per-batch floor, so a silent conf regression here would cost
~2-3x on every streaming micro-batch.
"""

from __future__ import annotations

import pytest

from arrow_experiments_spark.session import build_session


def test_session_scale_posture(spark):
    """The confs the 100 TB posture depends on, as built."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "true"
    )
    # size-based coalescing: without this pair a 40-row delta shuffle
    # schedules default-parallelism reduce tasks (parallelismFirst) and
    # persisted frames pin their pre-AQE partitioning (cached-plan flag)
    assert (
        spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        )
        == "false"
    )
    assert (
        spark.conf.get(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
        )
        == "true"
    )
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    )


def test_tiny_shuffle_coalesces_to_one_task(spark):
    """The mechanism end-to-end: a delta-sized groupBy's reduce stage
    coalesces to ONE partition instead of spark.sql.shuffle.partitions
    — the job-scheduling floor cut the streaming gates rely on."""
    from pyspark.sql import functions as F

    df = (
        spark.range(100)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    assert df.count() == 7
    assert df.rdd.getNumPartitions() == 1


def test_tiny_shuffle_coalesces_when_persisted(spark):
    """Same pin through a persist(): the gate sinks persist every leg,
    and without canChangeCachedPlanOutputPartitioning the cached plan
    keeps the full-width shuffle."""
    from pyspark.sql import functions as F

    df = (
        spark.range(100)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count("*").alias("n"))
        .persist()
    )
    try:
        assert df.count() == 7
        assert df.rdd.getNumPartitions() == 1
    finally:
        df.unpersist()


def test_tune_session_applies_env_extra_conf(spark, monkeypatch):
    """tune_session (the driver-owned-session path) honors
    SPARK_GRAFT_EXTRA_CONF too — the A/B-a-conf-without-a-code-edit
    workflow must cover sessions the factory never built (r12 ADVICE)."""
    from arrow_experiments_spark.session import tune_session

    key = "spark.arrowExperimentsSpark.test.tuneProbe"
    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", f"{key}=tuned")
    try:
        tune_session(spark)
        assert spark.conf.get(key) == "tuned"
    finally:
        spark.conf.unset(key)


def test_parallel_writes_default_follows_coalescing(spark):
    """The parallelWrites default is LINKED to size-based coalescing
    (r12 ADVICE): parallel overlap was only measured as a win when the
    delta write legs coalesce to ~1-task jobs, so with coalescing
    overridden off the resolver falls back to sequential — unless an
    explicit conf says otherwise."""
    from arrow_experiments_spark.streaming.egress import (
        _PARALLEL_WRITES_CONF,
        _resolve_parallel_writes,
    )

    pf = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    assert spark.conf.get(pf) == "false"  # session default posture
    assert _resolve_parallel_writes(spark) is True
    try:
        spark.conf.set(pf, "true")  # coalescing back to parallelism-first
        assert _resolve_parallel_writes(spark) is False
        spark.conf.set(_PARALLEL_WRITES_CONF, "true")  # explicit wins
        assert _resolve_parallel_writes(spark) is True
    finally:
        spark.conf.unset(_PARALLEL_WRITES_CONF)
        spark.conf.set(pf, "false")
    spark.conf.set(_PARALLEL_WRITES_CONF, "false")
    try:
        assert _resolve_parallel_writes(spark) is False
    finally:
        spark.conf.unset(_PARALLEL_WRITES_CONF)


def test_parallel_writes_unreadable_conf_falls_back_sequential():
    """r13 ADVICE: on a Spark build where one of the adaptive confs is
    unregistered (or a Connect session restricts conf access) the
    resolver must fall back to the documented Spark default instead of
    raising — and because parallelismFirst defaults true, an unreadable
    key resolves to sequential writes, the safe direction."""
    from arrow_experiments_spark.streaming.egress import (
        _resolve_parallel_writes,
    )

    class RaisingConf:
        def get(self, key, default="sentinel-no-default"):
            if default != "sentinel-no-default":
                return default  # the explicit-conf lookup passes None
            raise Exception(f"unregistered conf: {key}")

    class FakeSpark:
        conf = RaisingConf()

    assert _resolve_parallel_writes(FakeSpark()) is False


def test_extra_conf_env_rejects_malformed(monkeypatch):
    """SPARK_GRAFT_EXTRA_CONF entries must be key=value; a bare token
    fails fast instead of silently configuring nothing."""
    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", "not-a-pair")
    with pytest.raises(ValueError, match="key=value"):
        build_session(app_name="malformed-extra-conf")


def test_extra_conf_env_applies_last(spark, monkeypatch):
    """A SPARK_GRAFT_EXTRA_CONF entry lands on the (existing) session —
    getOrCreate applies runtime-settable builder confs to a live
    session, which is exactly how the sweep tools A/B a conf.

    getOrCreate applies ALL the builder's runtime-settable defaults
    onto the live fixture session (shuffle.partitions flips from
    conftest's 8 to the SPARK_GRAFT_CPUS default here), so the confs
    this call touches are snapshotted and restored — otherwise every
    test that runs after this file executes under different confs than
    conftest declared (r12 ADVICE)."""
    key = "spark.arrowExperimentsSpark.test.extraConfProbe"
    touched = [
        "spark.sql.shuffle.partitions",
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        "spark.sql.sources.parallelPartitionDiscovery.threshold",
    ]
    before = {k: spark.conf.get(k, None) for k in touched}
    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", f"{key}=probe-value")
    try:
        s = build_session(app_name="extra-conf-probe")
        assert s is spark  # same JVM session; env conf applied onto it
        assert s.conf.get(key) == "probe-value"
    finally:
        s.conf.unset(key)
        for k, v in before.items():
            if v is None:
                s.conf.unset(k)
            else:
                s.conf.set(k, v)
