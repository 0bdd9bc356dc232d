"""Stream-stream joins: click→purchase attribution within a time bound.

The reference's Flink layer is prose-specified as per-stream windowed
aggregation only (README.md:47,51); real-time attribution (join the
purchase stream back to the click that led to it) is the natural next
query a user of that bus asks for, and Structured Streaming supports it
natively: both sides watermarked, join condition carrying a time range
so the state store can evict rows once the other stream's watermark
passes them (Spark SS stream-stream join semantics).

The SAME function works on batch frames (pass ``watermark=None``):
logical plan identity is the engine's core testing trick — the batch
twin is the DuckDB-checkable oracle for the streaming plan.

Scale notes (100 TB posture): state per side is bounded by
watermark + ``within`` horizon, keyed by user — eviction is by event
time, not count. The join shuffles both streams on user_id once;
parallelism = shuffle partitions, skew bounded by per-user fan-in
within the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases_to_clicks(
    events: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    click_type: str = "click",
    purchase_type: str = "purchase",
) -> DataFrame:
    """Every (click, later purchase) pair of the same user within
    ``within`` — the raw attribution pair stream.

    One input frame (batch or streaming source); the two sides are
    filtered views of it. For streaming input, both sides carry the
    watermark and the BETWEEN condition bounds join state.
    """
    clicks = _side(events, click_type, watermark, ts_col, user_col, type_col, "click")
    purchases = _side(
        events, purchase_type, watermark, ts_col, user_col, type_col, "purchase"
    )
    cond = (
        (clicks["__u"] == purchases["__u"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {within}")
        )
    )
    return (
        clicks.join(purchases, on=cond, how="inner")
        .select(
            clicks["__u"].alias("user_id"),
            "click_id",
            "click_ts",
            "purchase_id",
            "purchase_ts",
            "purchase_value",
        )
    )


def _side(
    events: DataFrame,
    event_type: str,
    watermark: str | None,
    ts_col: str,
    user_col: str,
    type_col: str,
    prefix: str,
) -> DataFrame:
    side = events.filter(F.col(type_col) == event_type)
    if watermark:
        side = side.withWatermark(ts_col, watermark)
    cols = [
        F.col(user_col).alias("__u"),
        F.col("event_id").alias(f"{prefix}_id"),
        F.col(ts_col).alias(f"{prefix}_ts"),
    ]
    if prefix == "purchase":
        cols.append(F.col("value").alias("purchase_value"))
    return side.select(*cols)


def clicks_with_conversion_outcome(
    events: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    click_type: str = "click",
    purchase_type: str = "purchase",
) -> DataFrame:
    """Every click with its purchase-within-``within`` outcome — the
    LEFT OUTER stream-stream join: matched clicks carry the purchase
    columns, unmatched ones surface with NULLs once the watermark
    passes the end of their join window (Spark can only then prove no
    match will arrive; a streaming anti-join is not supported natively,
    so outer-join-then-null-filter IS the streaming no-conversion
    pattern). Works identically on a batch frame, where NULLs appear
    immediately.

    Output: (user_id, click_id, click_ts, purchase_id, purchase_ts,
    purchase_value, converted).
    """
    clicks = _side(events, click_type, watermark, ts_col, user_col, type_col, "click")
    purchases = _side(
        events, purchase_type, watermark, ts_col, user_col, type_col, "purchase"
    )
    cond = (
        (clicks["__u"] == purchases["__u"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {within}")
        )
    )
    return clicks.join(purchases, on=cond, how="left_outer").select(
        clicks["__u"].alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        F.col("purchase_id").isNotNull().alias("converted"),
    )


def item_value_baseline(events_batch: DataFrame) -> DataFrame:
    """Static per-item purchase baseline (exact DECIMAL sum + count) —
    the feature table the streaming side serves against. Computed in
    batch (nightly, or by the incremental maintainer); division is
    deliberately deferred so every downstream compare stays exact."""
    return (
        events_batch.filter(
            (F.col("event_type") == "purchase")
            & F.get_json_object(F.col("props"), "$.k").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("item"),
            F.col("value").cast("decimal(18,2)").alias("__v"),
        )
        .groupBy("item")
        .agg(F.sum("__v").alias("__s"), F.count("*").alias("n_item"))
    )


def enrich_purchases_with_baseline(
    purchases: DataFrame, baseline: DataFrame
) -> DataFrame:
    """Stream-static enrichment join (online feature serving): each
    purchase is scored against its item's standing baseline. Works
    identically on a streaming or batch ``purchases`` frame — Spark
    re-evaluates the static side every micro-batch, so a lake-backed
    baseline picks up nightly refreshes without a restart; at real
    scale the baseline is a broadcast (|items| rows).

    ``above_avg`` compares value·n_item > sum — exact DECIMAL×int
    arithmetic, no float mean to disagree across engines.

    Output: (event_id, item, value, n_item, baseline_sum, above_avg).
    """
    p = purchases.filter(
        (F.col("event_type") == "purchase")
        & F.get_json_object(F.col("props"), "$.k").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("item"),
        "value",
    )
    return p.join(baseline, on="item", how="inner").select(
        "event_id",
        "item",
        "value",
        "n_item",
        F.col("__s").cast("double").alias("baseline_sum"),
        (F.col("value").cast("decimal(18,2)") * F.col("n_item") > F.col("__s")).alias(
            "above_avg"
        ),
    )
