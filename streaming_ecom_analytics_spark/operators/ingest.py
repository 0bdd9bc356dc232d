"""Batch ingest pipeline — the reference extractor as one lazy plan.

The reference's extract() (reference extractor.py:89-164) reads a
month's CSV, imposes types, samples the first 10k events per day, and
writes parquet, collecting ingest stats along the way. Here the same
semantics compose from the cleaning, sampler, and validation operators
into a single pipeline whose only actions are the final write and the
stats aggregate.

Differences by design:
- one cached frame feeds both the stats and the write (the reference
  recomputes the window for its write, extractor.py:128 vs :138);
- the output is date-partitioned (partition pruning downstream);
- no bespoke JSON checkpoint — month rotation is a source-path loop
  in batch, checkpointLocation in streaming (S9).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.operators.cleaning import clean_events
from streaming_ecom_analytics_spark.operators.sampler import top_n_per_key
from streaming_ecom_analytics_spark.schema import ECOM_EVENT_RAW_SCHEMA
from streaming_ecom_analytics_spark.sources.lake import Lake


@dataclass
class IngestStats:
    total_events: int
    distinct_dates: int


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV ingest with the declared all-string schema — the reference
    reads schemaless (extractor.py:102); we pin the raw schema instead
    (inference is a second full pass at scale)."""
    return spark.read.schema(ECOM_EVENT_RAW_SCHEMA).csv(path, header=True)


def ingest_events(
    spark: SparkSession,
    raw: DataFrame,
    lake: Lake,
    *,
    table: str = "events",
    daily_sample_n: int = 10_000,
) -> IngestStats:
    """Clean → per-day top-N sample → date-partitioned write + stats."""
    cleaned = clean_events(raw)
    sampled = top_n_per_key(
        cleaned,
        key_cols=["event_date"],
        order_cols=["event_time", "user_session"],
        n=daily_sample_n,
    ).cache()
    try:
        stats_row = sampled.agg(
            F.count("*").alias("total"),
            F.countDistinct("event_date").alias("days"),
        ).first()
        lake.write(sampled, "raw", table, partition_by=("event_date",))
        return IngestStats(total_events=stats_row.total, distinct_dates=stats_row.days)
    finally:
        sampled.unpersist()
