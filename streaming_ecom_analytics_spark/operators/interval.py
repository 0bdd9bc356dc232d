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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval×interval OVERLAP join: every (left, right) pair of the
    same key whose half-open ranges intersect
    (``l.start < r.end AND r.start < l.end``) — sessions×campaigns,
    downtime×deploys, the interval-algebra sibling of the
    point-in-interval join above.

    Same bucketed rewrite, with one extra rule: BOTH sides explode to
    their covered buckets, so an overlapping pair meets in every bucket
    the overlap spans — the join would duplicate it. Instead of a
    post-join distinct (a full shuffle of the output), each pair is
    kept only in the FIRST bucket of its intersection
    (``greatest(l_bucket_start, r_bucket_start)``), which both sides
    provably cover — emitted exactly once, no dedup shuffle.
    """
    width_us = int(bucket_seconds) * 1_000_000

    def exploded(df: DataFrame, s: str, e: str, prefix: str) -> DataFrame:
        return df.withColumn(
            f"__{prefix}b0", F.expr(f"unix_micros({s}) div {width_us}")
        ).withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.col(f"__{prefix}b0"),
                    F.expr(f"(unix_micros({e}) - 1) div {width_us}"),
                )
            ),
        )

    l = exploded(left, left_start, left_end, "l")
    r = exploded(right, right_start, right_end, "r")
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    first_common = F.greatest(F.col("__lb0"), F.col("__rb0"))
    return (
        l.join(r, on=[on, "__b"], how="inner")
        .where(overlap & (F.col("__b") == first_common))
        .drop("__b", "__lb0", "__rb0")
    )
