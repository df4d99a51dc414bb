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


def test_extra_conf_env_rejects_malformed(monkeypatch):
    """SPARK_GRAFT_EXTRA_CONF entries must be key=value; a bare token
    fails fast instead of silently configuring nothing."""
    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", "not-a-pair")
    with pytest.raises(ValueError, match="key=value"):
        build_session(app_name="malformed-extra-conf")


def test_extra_conf_env_applies_last(spark, monkeypatch):
    """A SPARK_GRAFT_EXTRA_CONF entry lands on the (existing) session —
    getOrCreate applies runtime-settable builder confs to a live
    session, which is exactly how the sweep tools A/B a conf."""
    key = "spark.arrowExperimentsSpark.test.extraConfProbe"
    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", f"{key}=probe-value")
    s = build_session(app_name="extra-conf-probe")
    assert s is spark  # same JVM session; env conf applied onto it
    assert s.conf.get(key) == "probe-value"
