"""SparkSession factory tuned for this engine.

Local-mode defaults are sized for the test container (local[32], single
JVM); every setting is also the right *direction* for a large cluster:
AQE on (runtime coalesce + skew-join), shuffle partitions ~ cores,
Arrow for any pandas exchange, UTC session time so results are
engine-portable (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "streaming_ecom_analytics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, ``master`` comes from spark-submit and the
    shuffle-partition count should be ~2-3x total executor cores; AQE
    then coalesces post-shuffle partitions to the data's actual size,
    so over-provisioning the static number is safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Cached plans otherwise compile without AQE (no runtime
        # partition coalescing or broadcast conversion inside the
        # cached subtree) — the persist-heavy dedup/curation pipelines
        # measurably benefit from adaptive cached plans.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_expected_window_warnings(spark)
    return spark


def _silence_expected_window_warnings(spark: SparkSession) -> None:
    """Raise WindowExec's log level to ERROR.

    Every unpartitioned window in this engine is a PROVABLY bounded
    frame — day spines, |partitions|-row offset tables, sketch-sized
    rank frames (the allowlist lives in PLANS.md and is pinned by
    PLANSHASH's n_global_windows counter + tests/test_plans.py) — so
    WindowExec's per-execution "No Partition Defined" warning is noise
    here, and dozens of copies per bench run drown out warnings that
    would matter (round-6 verdict #6). A NEW data-scaled global window
    is caught structurally by the plan tests, not by eyeballing logs,
    so nothing is lost by muting the logger."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments: cosmetic only, never fail startup
