"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``streaming_ecom_analytics_spark``; this module
only adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from streaming_ecom_analytics_spark.caching import (  # noqa: E402
    release_shared_except,
    release_tracked,
)
from streaming_ecom_analytics_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    daily_revenue — the reference's flagship dashboard tile
    (reference snowflake_refresh.py:6-15, README.md:102-104).
    """
    return REGISTRY["daily_revenue"].fn(spark, SMOKE_SF_DIR)


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the previous query's tracked caches before building the
    next plan — the driver runs queries sequentially, so any cache
    registered by an earlier query has already been materialized and
    consumed by the time the next one is requested. Shared
    family-subtrees for the CURRENT data directory survive (that reuse
    is their point); entries keyed to other directories are dropped so
    a long driver session stays bounded (round-11 advisor — this host
    never calls release_shared())."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_tracked()
        release_shared_except(sf_dir)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Exported in STABLE registry-insertion order. Rounds 7 ran a
    round-salted md5 shuffle here so the driver's first-50-keys sample
    rotated each round; the round-7 advisor correctly flagged that a
    repo-chosen (and repo-precomputable) sample undermines the gate's
    integrity and depends on untracked artifact files. Sampling policy
    belongs to the driver; the full registry is independently checked
    every round by ``scripts/driver_sim.py --emit-json PARITY_r{N}.json``
    and ``tests/test_oracle_parity.py``, so coverage does not rely on
    the driver's sample reaching late-registered queries.
    """
    return {name: _released(REGISTRY[name].fn) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {
        name: REGISTRY[name].oracle
        for name in REGISTRY
        if REGISTRY[name].oracle is not None
    }
