"""SparkSession factory tuned for the local test harness and for scale.

The driver supplies its own SparkSession to ``__spark_entry__``; this factory
is used by tests and ``bench.py``. Settings chosen for a 100 TB posture:
AQE on (runtime join-strategy switches, skew-join splitting, partition
coalescing), Arrow for any pandas exchange, and a shuffle-partition count
sized to the harness (`SPARK_GRAFT_CPUS`) rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tune_for_session_cores(spark: SparkSession) -> None:
    """Right-size shuffle parallelism for a session the engine did not build
    (e.g. the test driver's vanilla SparkSession): Spark's static default of
    200 shuffle partitions schedules 200 tasks — and 200 streaming
    state-store partitions — per exchange regardless of actual parallelism,
    which dominates wall-clock for small-to-mid shuffles and streaming state
    checkpoints. If (and only if) the session still carries the untouched
    ``200`` default, set shuffle partitions to the session's core
    parallelism; a deliberate user setting is left alone. AQE (on by
    default in Spark 4) re-splits or coalesces from there at runtime, so
    this is a starting point, not a cap, at cluster scale."""
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            par = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(par, 1)))
    except Exception:  # pragma: no cover - conf access never fails in practice
        pass


def pin_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC iff it isn't already. The engine is
    UTC-everywhere (``get_spark`` sets it at build time); for sessions the
    engine did NOT build (the driver's vanilla session inherits the
    JVM-local tz) the pin happens at the scan/plan entry — deliberately
    overriding any caller-set timezone, because every oracle comparison
    assumes epoch micros computed under UTC. Guarded so repeated scans don't
    mutate session conf (ADVICE r05)."""
    try:
        if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf access never fails in practice
        pass


def get_spark(
    app_name: str = "msfdp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
