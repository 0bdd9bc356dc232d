"""Windowed streaming aggregates — the Flink-prose semantics
(reference README.md:47,51) realized as Structured Streaming plans.

Every function takes any events frame (batch *or* streaming — the
logical plan is identical; pass a readStream frame and the micro-batch
engine runs it incrementally with state) and returns the aggregate.

Watermark policy (ST6): the reference never states a lateness bound —
it silently outsourced late data to Flink defaults. We make it
explicit: ``watermark`` (default 1 hour) bounds state and drops
later-than-watermark rows; pass None for batch frames.

Distinct policy (ST7): streaming aggregation cannot do exact
COUNT(DISTINCT) (unbounded per-group state) → approx_count_distinct
(HLL) in the streaming/processed layer, exact countDistinct in the
batch/reporting layer — the reference's own lambda split
(README.md:40), documented here as an engine policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(events: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return events.withWatermark(ts_col, watermark) if watermark else events


def dedup_events(
    events: DataFrame,
    *,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Ingestion dedup — at-least-once delivery made effectively-once.

    Every real event bus redelivers (producer retries, consumer
    rebalances), so the first stateful operator of any ingestion DAG is
    a keyed dedup. Streaming: ``dropDuplicatesWithinWatermark`` on
    ``id_cols`` — per-key state is EVICTED once the watermark passes the
    key's event time, so state is bounded by the redelivery horizon
    (seconds-to-minutes on a real bus), not by stream length; a
    plain streaming ``dropDuplicates`` would grow state forever.
    Batch (``watermark=None``): plain ``dropDuplicates``, the same
    logical contract — which makes the batch frame the DuckDB-checkable
    oracle twin for the streaming plan.

    Duplicates beyond the watermark horizon are not caught here by
    design — that is the batch reconciliation layer's job (the same
    lambda split as exact-vs-approx COUNT(DISTINCT), documented above).
    """
    if watermark:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(id_cols)
        )
    return events.dropDuplicates(list(id_cols))


def tumbling_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_size: str = "5 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """ST2/ST3/ST5: event counts per (tumbling window, event_type) —
    the streaming funnel. Output: window_start, window_end, event_type,
    event_count."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_size), F.col(type_col).alias("event_type"))
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
        )
    )


def sliding_revenue(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    price_col: str = "value",
    type_col: str = "event_type",
    purchase_type: str = "purchase",
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """ST2: sliding-window purchase revenue (each event contributes to
    size/slide overlapping windows). Exact decimal sum → double."""
    df = _maybe_watermark(events, ts_col, watermark).filter(
        F.col(type_col) == purchase_type
    )
    return (
        df.groupBy(F.window(F.col(ts_col), window_size, slide))
        .agg(F.sum(F.col(price_col).cast("decimal(18,2)")).cast("double").alias("revenue"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "revenue",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """ST2: per-user session windows (gap-based). Output: user_id,
    session_start, session_end (last event + gap), n_events.

    Batch mode plans this as a sort-based session aggregation per user
    partition; streaming mode keeps per-user session state with
    watermark-driven eviction.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_active_users(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    window_size: str = "1 day",
    watermark: str | None = "1 hour",
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """ST7: active users per (window, event_type).

    exact=False (streaming-safe): approx_count_distinct HLL sketch —
    bounded state, mergeable across partitions, the only distinct that
    scales on an unbounded stream. exact=True for the batch reporting
    reconciliation (A9's semantics).
    """
    df = _maybe_watermark(events, ts_col, watermark)
    distinct: Column = (
        F.countDistinct(user_col)
        if exact
        else F.approx_count_distinct(user_col, rsd)
    )
    return (
        df.groupBy(F.window(F.col(ts_col), window_size), F.col(type_col).alias("event_type"))
        .agg(distinct.alias("active_users"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "active_users",
        )
    )


def rank_topk_per_window(
    counts: DataFrame, *, k: int = 3, order_col: str = "event_count"
) -> DataFrame:
    """Top-k rows per (window_start, window_end) by ``order_col`` —
    the rank step of a windowed-leaderboard view. Deterministic
    tiebreak on event_type. Batch-only by design: streaming append
    mode cannot rank (a later row may displace an earlier one), so the
    streaming form runs the COUNTS as the stateful aggregate and
    applies this rank per refresh in the foreachBatch materializer
    (overwrite_materializer(transform=...)) — the view is then always
    a consistent post-rank snapshot."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start", "window_end").orderBy(
        F.desc(order_col), F.asc("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .withColumnRenamed("rn", "rank")
    )


def windowed_top_event_types(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_size: str = "15 minutes",
    k: int = 3,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Batch form of the windowed leaderboard (counts + rank in one
    plan); the streaming deployment splits the same logic into
    tumbling_event_counts (stateful) + rank_topk_per_window (per
    refresh) as documented above."""
    counts = tumbling_event_counts(
        events, ts_col=ts_col, type_col=type_col,
        window_size=window_size, watermark=watermark,
    )
    return rank_topk_per_window(counts, k=k)


def late_dlq_splitter(
    dlq_path: str,
    *,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
):
    """Late-row dead-letter capture: Structured Streaming silently
    DROPS rows behind the watermark once they reach a stateful
    operator — a silent-data-loss class at 100 TB ingest. This
    foreachBatch pre-stage tees rows behind the watermark into an
    append-only parquet DLQ (tagged with the batch id) and returns the
    on-time subset for the downstream aggregate — so nothing is lost
    silently and the DLQ feeds the batch reconciliation layer.

    The lateness rule mirrors Spark\'s watermark arithmetic EXACTLY:
    Spark derives batch N\'s watermark from the max event time of
    batches *before* N (the one-batch propagation lag), so the
    splitter carries that high-water mark across batches in closure
    state and judges each batch against the PRIOR mark, never its own
    max — a row that arrives in the same batch that advances the clock
    is on time, exactly as the stateful operator would treat it. The
    per-batch cost is one scalar max (the same eventTimeStats pass
    Spark runs internally). After a restart the carried mark reseeds
    from the first post-restart batch, so that batch quarantines
    nothing — conservative in the safe direction (rows pass through to
    the stateful operator, which still applies its checkpointed
    watermark).

    NULL event times are quarantined to the DLQ in EVERY batch (r5
    advisor finding): a three-valued late predicate would silently
    exclude them from both the late and the on-time side, and a NULL
    event-time row is unusable downstream anyway — a watermarked
    windowed aggregate can never emit its (NULL-window) group in
    append mode, which is exactly the silent-loss class this operator
    exists to catch. Returns a ``(batch_df, batch_id) -> on_time_df``
    callable for materializer wiring.
    """
    from pyspark.sql import functions as F

    parts = watermark.split()
    unit = parts[1].rstrip("s")
    amount = int(parts[0])
    seconds = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit]
    delay_us = amount * seconds * 1_000_000
    state: dict[str, int | None] = {"hw": None}

    def split_batch(batch, batch_id: int):
        prev_hw = state["hw"]
        ts_us = F.unix_micros(F.col(ts_col))
        # advance the carried mark with THIS batch's max (one scalar)
        cur = batch.agg(F.max(ts_us).alias("hw")).collect()[0].hw
        if cur is not None:
            state["hw"] = cur if prev_hw is None else max(prev_hw, cur)
        # NULL ts can never be judged on time — always quarantined, so
        # the predicate below is never three-valued on the kept side
        quarantine = F.col(ts_col).isNull()
        if prev_hw is not None:
            quarantine = quarantine | (ts_us < F.lit(prev_hw - delay_us))
        late = batch.filter(quarantine).withColumn(
            "dlq_batch_id", F.lit(batch_id)
        )
        if not late.isEmpty():
            late.write.mode("append").parquet(dlq_path)
        return batch.filter(~quarantine)

    return split_batch
