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

from streaming_ecom_analytics_spark.caching import release_tracked  # noqa: E402
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
    consumed by the time the next one is requested."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_tracked()
        return fn(spark, sf_dir)

    return wrapped


def _round_salt() -> int:
    """Number of completed rounds, inferred from the committed
    CORRECTNESS_r*.json artifacts — increments every round with no
    side channel."""
    return len(list(Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json")))


def _rotated_names() -> list[str]:
    """Registry names in a round-keyed deterministic shuffle.

    The driver's correctness gate samples the FIRST 50 keys of
    ``queries()`` in iteration order; with plain insertion order it
    re-checked the same 50 queries every round and never reached the
    ~170 added later (round-6 verdict #2). Salting a stable md5 sort
    with the completed-round count gives every query a fresh chance of
    landing in the sampled head each round while staying reproducible
    within a round.
    """
    import hashlib

    salt = _round_salt()
    return sorted(
        REGISTRY,
        key=lambda n: hashlib.md5(f"{salt}:{n}".encode()).hexdigest(),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _released(REGISTRY[name].fn) for name in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {
        name: REGISTRY[name].oracle
        for name in _rotated_names()
        if REGISTRY[name].oracle is not None
    }
