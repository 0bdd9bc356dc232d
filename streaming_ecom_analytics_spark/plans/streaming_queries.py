"""Batch-mode registrations of the streaming window operators.

The window functions in ``streaming/windows.py`` build identical
logical plans for batch and streaming inputs; registering them here on
the batch events table gives the windowed operators (tumbling, sliding,
session, windowed-distinct) a DuckDB oracle. The streaming execution of
the *same plans* — watermarks, late data, incremental state, restart —
is covered by tests/test_streaming.py (the driver's oracle harness is
batch-only by design).

Window-alignment note: Spark aligns epoch-based windows to 1970-01-01,
DuckDB's time_bucket to 2000-01-03 — identical for divisors of a day.
Session windows: Spark merges while ts < prev_session_end (end
exclusive), so the oracle's new-session predicate is gap >= threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark import catalog
from streaming_ecom_analytics_spark.plans.registry import register
from streaming_ecom_analytics_spark.streaming import windows


@register(
    "funnel_5m_tumbling",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
           event_type,
           COUNT(*) AS event_count
    FROM events
    GROUP BY 1, 2, 3
    """,
    headline=True,
)
def q_funnel_5m_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2/ST5 (README.md:47): tumbling 5-minute funnel counts."""
    return windows.tumbling_event_counts(
        catalog.events(spark, sf_dir), watermark=None
    )


@register(
    "sliding_revenue_10m",
    """
    WITH starts AS (
      SELECT unnest([
               time_bucket(INTERVAL '5 minutes', ts),
               time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
             ]) AS window_start,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           CAST(SUM(v) AS DOUBLE) AS revenue
    FROM starts
    GROUP BY 1, 2
    """,
)
def q_sliding_revenue_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: sliding 10-minute/5-minute purchase revenue. Each event
    lands in size/slide windows (the oracle materializes both starts)."""
    return windows.sliding_revenue(catalog.events(spark, sf_dir), watermark=None)


@register(
    "user_sessions_30m",
    """
    WITH l AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    m AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM l
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM m
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    headline=True,
)
def q_user_sessions_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: per-user 30-minute-gap session windows. The oracle is the
    classic gaps-and-islands rewrite of session_window semantics."""
    return windows.session_windows(catalog.events(spark, sf_dir), watermark=None)


@register(
    "active_users_daily_windowed",
    """
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
           event_type,
           COUNT(DISTINCT user_id) AS active_users
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_active_users_daily_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 reporting side: exact windowed distinct users (the batch
    reconciliation of the streaming HLL variant below)."""
    return windows.windowed_active_users(
        catalog.events(spark, sf_dir), watermark=None, exact=True
    )


_APPROX_DAU_ORACLE = """
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS window_start,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL '1 day' AS window_end,
           event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY 1, 2, 3
"""


@register("active_users_daily_approx", _APPROX_DAU_ORACLE)
def q_active_users_daily_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 processed side: approx_count_distinct (HLL, rsd=0.05) — the
    streaming-safe distinct. The sketch estimate is engine-specific,
    so the query surfaces the checkable claim instead: the estimate
    lands within 15% (3x the requested rsd) of the exact count for
    every (day, event_type) window."""
    ev = catalog.events(spark, sf_dir)
    approx = windows.windowed_active_users(ev, watermark=None, exact=False)
    exact = windows.windowed_active_users(ev, watermark=None, exact=True).select(
        "window_start",
        "window_end",
        "event_type",
        F.col("active_users").alias("exact_users"),
    )
    return approx.join(exact, on=["window_start", "window_end", "event_type"]).select(
        "window_start",
        "window_end",
        "event_type",
        "exact_users",
        (
            F.abs(F.col("active_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("approx_ok"),
    )


@register(
    "event_session_attribution",
    """
    WITH l AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    m AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM l
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM m
    ),
    sess AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL '30 minutes' AS session_end
      FROM s GROUP BY user_id, sid
    )
    SELECT e.event_id, e.user_id, sess.session_start, sess.session_end
    FROM events e
    JOIN sess ON e.user_id = sess.user_id
             AND e.ts >= sess.session_start AND e.ts < sess.session_end
    """,
)
def q_event_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: attribute every event to its containing
    30-minute-gap session via the bucketed interval-join operator
    (operators/interval.py) — explode sessions into 30-min time
    buckets, equi-join events on (user_id, bucket), exact range
    filter. The oracle is the naive non-equi BETWEEN join over the
    gaps-and-islands session twin."""
    from streaming_ecom_analytics_spark.operators.interval import interval_join

    ev = catalog.events(spark, sf_dir)
    sessions = windows.session_windows(ev, watermark=None)
    points = ev.select("event_id", "user_id", "ts")
    return interval_join(
        points,
        sessions.select("user_id", "session_start", "session_end"),
        on="user_id",
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
        bucket_seconds=1800,
    ).select("event_id", "user_id", "session_start", "session_end")


_CMS_15M_ORACLE = """
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes'
             AS window_end,
           event_type,
           COUNT(*) AS exact_count,
           TRUE AS cms_ok
    FROM events GROUP BY 1, 2, 3
"""


@register("cms_event_types_15m", _CMS_15M_ORACLE)
def q_cms_event_types_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 companion: windowed count-min sketch grid over event types
    (bounded state per window regardless of cardinality — depth x width
    counters, the ST7 trade for frequencies instead of distincts).
    Cell placement is xxhash64-based, so the oracle checks the CMS
    guarantee per (window, event_type): estimate >= exact and
    <= exact + eps*N_window (eps = e/width). Streaming==batch grid
    equality is separately asserted in tests/test_streaming.py."""
    import math

    from streaming_ecom_analytics_spark.functions import sketch as cms
    from streaming_ecom_analytics_spark.functions.sketch import _cells

    ev = catalog.events(spark, sf_dir)
    width, depth = 256, 5
    grid = cms.windowed_count_min(
        ev, col="event_type", window="15 minutes", watermark=None, width=width
    )
    exact = (
        ev.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count("*").alias("exact_count"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "exact_count",
        )
    )
    win_totals = exact.groupBy("window_start").agg(
        F.sum("exact_count").alias("n_window")
    )
    probes = exact.select(
        "window_start",
        "window_end",
        "event_type",
        F.explode(
            F.array(*_cells(F.col("event_type"), depth=depth, width=width, seed=7))
        ).alias("cell"),
    ).select("window_start", "window_end", "event_type", "cell.d", "cell.idx")
    est = (
        probes.join(grid, on=["window_start", "window_end", "d", "idx"], how="left")
        .groupBy("window_start", "window_end", "event_type")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_count"))
    )
    eps = math.e / width
    return (
        exact.join(est, on=["window_start", "window_end", "event_type"])
        .join(win_totals, on="window_start")
        .select(
            "window_start",
            "window_end",
            "event_type",
            "exact_count",
            (
                (F.col("est_count") >= F.col("exact_count"))
                & (F.col("est_count") <= F.col("exact_count") + F.lit(eps) * F.col("n_window"))
            ).alias("cms_ok"),
        )
    )


@register(
    "click_purchase_attribution_pairs",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           c.ts AS click_ts,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_click_purchase_attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join
    (streaming/joins.py): every (click, purchase-within-30-min) pair
    per user. The identical plan runs as a watermarked stream-stream
    join on readStream input — asserted equal in tests/test_streaming.py."""
    from streaming_ecom_analytics_spark.streaming import joins

    return joins.attribute_purchases_to_clicks(
        catalog.events(spark, sf_dir), within="30 minutes", watermark=None
    )


@register(
    "click_conversion_outcomes",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           c.ts AS click_ts,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value,
           p.event_id IS NOT NULL AS converted
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click'
    """,
)
def q_click_conversion_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream join
    (streaming/joins.py::clicks_with_conversion_outcome): every click
    with its conversion outcome, unconverted clicks surfacing as NULL
    purchase columns. The identical plan runs watermarked on streaming
    input, where NULL rows flush once the watermark closes each join
    window — asserted in tests/test_streaming.py."""
    from streaming_ecom_analytics_spark.streaming import joins

    return joins.clicks_with_conversion_outcome(
        catalog.events(spark, sf_dir), within="30 minutes", watermark=None
    )


_TTC_ORACLE = """
    WITH pairs AS (
      SELECT c.user_id, c.event_id AS click_id,
             MIN(date_diff('second', c.ts, p.ts)) AS secs_to_convert
      FROM events c
      JOIN events p
        ON p.user_id = c.user_id AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      WHERE c.event_type = 'click'
      GROUP BY c.user_id, c.event_id
    )
    SELECT COUNT(*) AS n_converted_clicks,
           CAST(quantile_disc(secs_to_convert, 0.50) AS BIGINT) AS p50_secs,
           CAST(quantile_disc(secs_to_convert, 0.90) AS BIGINT) AS p90_secs,
           CAST(MIN(secs_to_convert) AS BIGINT) AS min_secs,
           CAST(MAX(secs_to_convert) AS BIGINT) AS max_secs
    FROM pairs
"""


@register("time_to_convert_stats", _TTC_ORACLE)
def q_time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase latency distribution: each converted click's
    FASTEST following purchase within the attribution window, then
    exact discrete percentiles over the deltas — the product-analytics
    readout on top of the attribution join. Reuses the stream-join
    pair shape in batch form; the delta aggregate is click-grain, the
    percentile aggregate is a single small pass."""
    from streaming_ecom_analytics_spark.streaming import joins

    pairs = joins.attribute_purchases_to_clicks(
        catalog.events(spark, sf_dir), within="30 minutes", watermark=None
    )
    per_click = pairs.groupBy("user_id", "click_id").agg(
        F.min(
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("secs_to_convert")
    )
    return per_click.agg(
        F.count("*").alias("n_converted_clicks"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY secs_to_convert)"
        ).cast("long").alias("p50_secs"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY secs_to_convert)"
        ).cast("long").alias("p90_secs"),
        F.min("secs_to_convert").alias("min_secs"),
        F.max("secs_to_convert").alias("max_secs"),
    )


@register(
    "event_stream_dedup",
    """
    SELECT * FROM events
    """,
)
def q_event_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion dedup (streaming/windows.py::dedup_events): the input
    simulates at-least-once redelivery — every event whose id is
    divisible by 7 arrives twice — and keyed dedup on event_id must
    restore exactly the original table (event_id is unique in the
    lake, so the oracle is the table itself). The streaming execution
    of the same plan (dropDuplicatesWithinWatermark, bounded state,
    cross-micro-batch duplicates) is pinned in tests/test_streaming.py.
    """
    events = catalog.events(spark, sf_dir)
    redelivered = events.unionByName(events.filter(F.col("event_id") % 7 == 0))
    return windows.dedup_events(redelivered, watermark=None)


@register(
    "top_event_types_15m",
    """
    SELECT * FROM (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
             time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes'
               AS window_end,
             event_type,
             COUNT(*) AS event_count,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY time_bucket(INTERVAL '15 minutes', ts)
               ORDER BY COUNT(*) DESC, event_type ASC
             ) AS INTEGER) AS rank
      FROM events
      GROUP BY 1, 2, 3
    ) WHERE rank <= 3
    """,
)
def q_top_event_types_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed leaderboard: top-3 event types per 15-minute tumbling
    window (windows.windowed_top_event_types). Streaming execution of
    the same semantics — stateful counts + per-refresh rank in the
    materializer — is pinned in tests/test_streaming.py."""
    return windows.windowed_top_event_types(
        catalog.events(spark, sf_dir), watermark=None
    )


@register(
    "purchases_vs_item_baseline",
    """
    WITH p AS (
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
             value
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
        AND value IS NOT NULL
    ),
    b AS (
      SELECT item, SUM(CAST(value AS DECIMAL(18,2))) AS s, COUNT(*) AS n_item
      FROM p GROUP BY item
    )
    SELECT p.event_id, p.item, p.value, b.n_item,
           CAST(b.s AS DOUBLE) AS baseline_sum,
           CAST(p.value AS DECIMAL(18,2)) * b.n_item > b.s AS above_avg
    FROM p JOIN b ON p.item = b.item
    """,
)
def q_purchases_vs_item_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join (online feature
    serving): every purchase scored against its item's standing
    baseline — exact DECIMAL compare, no float mean. The streaming
    side runs the identical transform against the static baseline
    (test_streaming asserts stream == this twin)."""
    from streaming_ecom_analytics_spark.streaming import joins as sjoins

    ev = catalog.events(spark, sf_dir)
    return sjoins.enrich_purchases_with_baseline(
        ev, sjoins.item_value_baseline(ev)
    )


_BOUNCE_ORACLE = """
    WITH l AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    m AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM l
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM m
    ),
    sess AS (
      SELECT user_id, sid, COUNT(*) AS n_events FROM s GROUP BY 1, 2
    ),
    entry AS (
      SELECT user_id, sid, event_type AS entry_type FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, sid ORDER BY ts, event_id
        ) AS rn FROM s
      ) WHERE rn = 1
    )
    SELECT entry_type, COUNT(*) AS n_sessions,
           COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounces,
           ROUND(COUNT(CASE WHEN n_events = 1 THEN 1 END) / COUNT(*), 6)
             AS bounce_rate
    FROM sess JOIN entry USING (user_id, sid)
    GROUP BY entry_type
"""


@register("session_bounce_rate", _BOUNCE_ORACLE)
def q_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry type: single-event sessions over
    30-minute-gap sessionization, grouped by the session's first event
    type (min_by over (ts, event_id) inside the same session_window
    aggregate — entry selection costs no extra window or join). The
    oracle replays sessions as gaps-and-islands SQL."""
    ev = catalog.events(spark, sf_dir)
    sess = (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min_by(
                "event_type", F.struct(F.col("ts"), F.col("event_id"))
            ).alias("entry_type"),
        )
    )
    return sess.groupBy("entry_type").agg(
        F.count("*").alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).alias("n_bounces"),
        F.round(
            F.count(F.when(F.col("n_events") == 1, 1)) / F.count("*"), 6
        ).alias("bounce_rate"),
    )


_DD_15M_ORACLE = """
    WITH b AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
             time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes'
               AS window_end,
             CAST(CEIL(ROUND(LN(value) / 0.020000666706669435, 6)) AS BIGINT)
               AS bucket,
             COUNT(*) AS c
      FROM events WHERE value > 0
      GROUP BY 1, 2, 3
    ),
    t AS (
      SELECT window_start, window_end, CAST(SUM(c) AS BIGINT) AS n_pos
      FROM b GROUP BY 1, 2
    ),
    cum AS (
      SELECT window_start, window_end, bucket,
             CAST(SUM(c) OVER (PARTITION BY window_start, window_end
                               ORDER BY bucket) AS BIGINT) AS cum
      FROM b
    ),
    r AS (
      SELECT t.window_start, t.window_end,
             CAST(q.q_pct AS BIGINT) AS q_pct, t.n_pos,
             (CAST(q.q_pct AS BIGINT) * (t.n_pos - 1)) // 100 + 1 AS rank_1
      FROM t CROSS JOIN (SELECT * FROM (VALUES (50), (99)) AS v(q_pct)) q
    ),
    pick AS (
      SELECT r.window_start, r.window_end, r.q_pct, r.n_pos,
             MIN(cum.bucket) AS bucket
      FROM r JOIN cum
        ON cum.window_start = r.window_start
       AND cum.window_end = r.window_end
       AND cum.cum >= r.rank_1
      GROUP BY 1, 2, 3, 4
    )
    SELECT window_start, window_end, q_pct, n_pos, bucket,
           CAST(FLOOR(2.0 * POW(1.02020202020202, bucket)
                      / (1.02020202020202 + 1.0) * 1000000.0) AS BIGINT)
             AS est_micros
    FROM pick
"""


@register("ddsketch_value_quantiles_15m", _DD_15M_ORACLE)
def q_ddsketch_value_quantiles_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-15-minute-window p50/p99 of event value from the windowed
    DDSketch — the streaming-quantile SLO tile (latency/price
    percentiles per window) with state bounded by the value range per
    open window, not the stream volume. This is the batch twin of
    functions/sketch.windowed_ddsketch (streaming==batch grid equality
    is pinned in tests/test_streaming.py; the sketch's determinism is
    what makes that equality exact); the whole pipeline — bucketing,
    merge, rank walk, midpoint estimate — is bit-mirrored by the SQL
    oracle."""
    from streaming_ecom_analytics_spark.functions import sketch as sk

    ev = catalog.events(spark, sf_dir)
    grid = sk.windowed_ddsketch(
        ev, col="value", window="15 minutes", watermark=None, alpha=0.01
    )
    return sk.ddsketch_quantiles(
        grid,
        alpha=0.01,
        q_pcts=(50, 99),
        group_cols=("window_start", "window_end"),
    )
