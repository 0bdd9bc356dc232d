"""Pipeline runner — the reference's Airflow DAG as a thin engine loop.

The reference orchestrates extract → kafka → validate → materialize as
four Airflow tasks every 3 hours with XCom path handoffs
(reference ecommerce_pipeline_dag.py:50-85). Here each stage is a
function over DataFrames; handoff is return values (C2), empty-input
guards use isEmpty() not count() (C3 — no second scan), failures
isolate per reporting table like the reference's refresh loop
(snowflake.py:55-61), and there is no cron: batch runs are invoked by
the caller, streaming views run continuously (C1/C4).
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streaming_ecom_analytics_spark.operators import aggregates, validation
from streaming_ecom_analytics_spark.operators.ingest import ingest_events, read_raw_csv
from streaming_ecom_analytics_spark.sources.kafka_contract import serialize_events
from streaming_ecom_analytics_spark.sources.lake import Lake

log = logging.getLogger(__name__)

# The six reporting refreshes (snowflake_refresh.py:5-80) on the
# canonical ecom event schema.
REPORTING_VIEWS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "daily_revenue": lambda ev: aggregates.daily_revenue(
        ev, ts_col="event_time", price_col="price"
    ),
    "top_selling_brands": lambda ev: aggregates.top_selling_brands(
        ev, brand_col="brand", price_col="price"
    ),
    "conversion_funnel": lambda ev: aggregates.conversion_funnel(ev),
    "abandoned_cart_users": lambda ev: aggregates.abandoned_cart_users(ev),
    "average_order_value_daily": lambda ev: aggregates.average_order_value_daily(
        ev, ts_col="event_time", price_col="price", order_key_col="user_session"
    ),
    "daily_active_users_by_event_type": lambda ev: aggregates.daily_active_users_by_event_type(
        ev, ts_col="event_time", user_col="user_session"
    ),
    "top_revenue_by_category": lambda ev: aggregates.top_revenue_by_category(
        ev, category_col="category_code", price_col="price"
    ),
}


def run_batch_cycle(
    spark: SparkSession,
    lake: Lake,
    *,
    csv_path: str,
    daily_sample_n: int = 10_000,
    publish: Callable[[DataFrame], None] | None = None,
) -> dict:
    """One extract → publish → validate → materialize cycle."""
    # 1. extract (extractor.py:89-164 parity)
    raw = read_raw_csv(spark, csv_path)
    stats = ingest_events(spark, raw, lake, daily_sample_n=daily_sample_n)
    events = lake.read(spark, "raw", "events")

    # 2. publish — distributed serialization; guard on isEmpty (C3)
    if events.isEmpty():
        log.warning("no events extracted; skipping publish")
    else:
        wire = serialize_events(events.drop("event_date"))
        if publish is not None:
            publish(wire)
        else:
            lake.write(wire, "processed", "events_wire")

    # 3. validate (snowflake.py:15-47 parity)
    quality = validation.validate_events(
        events,
        key_cols=("product_id", "category_id", "event_time", "user_id"),
        ts_col="event_time",
    ).first()

    # 4. materialize with per-view error isolation (snowflake.py:55-61)
    refreshed, failed = [], []
    for name, build in REPORTING_VIEWS.items():
        try:
            lake.refresh(build(events), name)
            refreshed.append(name)
        except Exception:
            log.exception("refresh failed for %s", name)
            failed.append(name)

    return {
        "ingest": stats,
        "quality": quality.asDict(),
        "refreshed": refreshed,
        "failed": failed,
    }
