"""Per-key top-N sampler — the reference's per-day 10k event sampler.

Reference: extractor.py:117-124 ranks events within each event_date by
event_time with row_number() and keeps rank <= 10_000.

Scale note: row_number over partitionBy(day) is a single hash shuffle on
the day key; days are naturally balanced in clickstream data, and N rows
per key bounds the output regardless of input scale. The reference's
ordering (event_time alone) is non-deterministic under ties; we add a
caller-supplied tiebreak column so the sample is stable — a requirement
for reproducible training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_key(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_cols: list[str],
    n: int,
) -> DataFrame:
    """Keep the first ``n`` rows per key, ordered by ``order_cols``."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def daily_event_sample(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    n: int = 10_000,
) -> DataFrame:
    """The reference sampler (extractor.py:117-124) on an event stream:
    first ``n`` events of each day by (ts, tiebreak)."""
    with_day = events.withColumn("event_date", F.to_date(F.col(ts_col)))
    return top_n_per_key(
        with_day, key_cols=["event_date"], order_cols=[ts_col, tiebreak_col], n=n
    ).drop("event_date")
