"""Tracked DataFrame persistence — unpersist discipline for operators
that cache intermediate frames (shingle sets, ANN features).

Operators that return LAZY DataFrames cannot unpersist their own
intermediates (the cache must live until the caller executes the
plan), so they register them here and the host — bench loop, test
fixture, query-registry wrapper — releases them once the query has
materialized. Without this, a long-lived session accumulates cached
shingle sets across every dedup call (CacheManager holds them until an
explicit unpersist; the ContextCleaner only GCs RDD-level caches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for later release.

    Idempotent: a frame that is already persisted (e.g. an operator
    composing another operator that persisted the same object) is
    returned as-is instead of re-persisting — Spark would log an
    'already cached' warning and the double-track would double-release.
    """
    try:
        already = df.storageLevel.useMemory or df.storageLevel.useDisk
    except Exception:
        already = False
    if not already:
        df.persist()
        _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any time: caches are re-materialized on demand if a
    plan that references them runs again.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
