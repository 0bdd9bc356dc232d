"""Data-quality validation — the reference's warehouse checks as engine ops.

Reference: airflow_docker/dags/ecomm_pipeline/snowflake.py:15-47 runs
three remote SQL probes (row count, OR-chained null audit on key columns,
MAX(date) freshness). Here they fuse into ONE single-pass aggregate —
conditional counts instead of three scans, which at 100 TB is the
difference between one job and three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_events(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id", "ts", "user_id", "event_type"),
    ts_col: str = "ts",
) -> DataFrame:
    """One-row quality summary: total rows, rows with any null key column
    (snowflake.py:27-35), and data freshness (snowflake.py:39-44)."""
    any_null = None
    for c in key_cols:
        cond = F.col(c).isNull()
        any_null = cond if any_null is None else (any_null | cond)
    # count(when) not sum(when): COUNT stays BIGINT in every engine the
    # oracle runs on (DuckDB SUM(int) widens to HUGEINT).
    return df.agg(
        F.count("*").alias("total_rows"),
        F.count(F.when(any_null, 1)).alias("null_key_rows"),
        F.max(F.date_trunc("day", F.col(ts_col))).alias("max_event_date"),
    )
