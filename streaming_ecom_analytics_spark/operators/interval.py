"""Interval (range) join — the second time-join operator Spark lacks
natively (alongside as-of, `operators/asof.py`).

Attach to each point row the interval rows containing it:
``point.ts ∈ [interval.start, interval.end)`` within the same key. The
naive form is a non-equi theta-join — Spark plans it as a broadcast
nested loop (or worse), O(|points| × |intervals|) per key. This
implementation is the standard scalable rewrite (the same shape as
Trino's spatial partitioning and KDB's window join):

    intervals  → explode into the fixed-width time buckets they cover
    points     → tagged with their single containing bucket
    equi-join on (key, bucket)   ← a plain hash shuffle, AQE-skew-safe
    exact range filter           ← drops the bucket-boundary misses

A point's bucket is unique, so a (point, interval) match is produced
exactly once — no post-join dedup. Fan-out = interval length / bucket
width; pick ``bucket_seconds`` near the typical interval length so
most intervals explode into 1-2 buckets. Hot (key, bucket) pairs are
ordinary join skew — AQE's skew-join splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner interval join: points.* plus the interval columns, for
    every interval [start, end) containing the point's timestamp under
    the same ``on`` key.

    Buckets are integral microsecond ranges (``floor(unix_micros /
    width)``) — exact for any timestamp, no calendar-unit truncation
    needed. The interval side explodes to one row per covered bucket;
    half-open semantics make the last covered bucket
    ``floor((end - 1µs) / width)``.
    """
    width_us = int(bucket_seconds) * 1_000_000
    # `div` (integer division), not double `/` + cast: keeps bucket ids
    # exact for any microsecond timestamp.
    p = points.withColumn("__b", F.expr(f"unix_micros({ts_col}) div {width_us}"))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {width_us}"),
                F.expr(f"(unix_micros({end_col}) - 1) div {width_us}"),
            )
        ),
    )
    return (
        p.join(i, on=[on, "__b"], how="inner")
        .where(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__b")
    )
