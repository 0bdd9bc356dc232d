"""Warehouse-tier queries: cohort retention, RFM segmentation, rolling
anomaly detection, CDC merge apply, SCD2 history, HLL distinct rollups.

These extend the reference's nightly reporting family
(snowflake_refresh.py:5-80) with the warehouse operations its Snowflake
target provides natively (MERGE, window analytics) — re-expressed as
engine operators so a reference user migrating here keeps them.

Oracle conventions follow plans/registry.py (identical aliases, day-
truncated TIMESTAMP grains, DECIMAL money sums, CASE chains written
identically on both engines). The HLL rollup is rows-only: the sketch
estimate is engine-specific (DataSketches HLL), verified instead by a
unit-test error bound against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark import catalog
from streaming_ecom_analytics_spark.functions import sketch
from streaming_ecom_analytics_spark.operators import aggregates, analytics, cdc, validation
from streaming_ecom_analytics_spark.plans.registry import register

_COHORT_ORACLE = """
    WITH fs AS (
      SELECT user_id, MIN(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS activity_day
      FROM events
    ),
    cells AS (
      SELECT fs.cohort_day,
             date_diff('day', fs.cohort_day, act.activity_day) AS day_offset,
             COUNT(*) AS active_users
      FROM act JOIN fs USING (user_id)
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_day, active_users AS cohort_size FROM cells WHERE day_offset = 0
    )
    SELECT c.cohort_day, c.day_offset, c.active_users, s.cohort_size,
           ROUND(c.active_users / s.cohort_size, 6) AS retention
    FROM cells c JOIN sizes s USING (cohort_day)
"""


@register("cohort_retention", _COHORT_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain cohort retention matrix over the events table."""
    return analytics.cohort_retention(catalog.events(spark, sf_dir))


_RFM_ORACLE = """
    WITH purchases AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, value
      FROM events WHERE event_type = 'purchase'
    ),
    per_user AS (
      SELECT user_id, MAX(day) AS last_day, COUNT(*) AS frequency,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS monetary
      FROM purchases GROUP BY user_id
    ),
    ref AS (SELECT MAX(day) AS ref_day FROM purchases),
    metrics AS (
      SELECT user_id,
             date_diff('day', last_day, ref_day) AS recency_days,
             frequency, monetary
      FROM per_user CROSS JOIN ref
    ),
    thr AS (
      SELECT ROUND(quantile_cont(recency_days, 0.25), 6) AS r25,
             ROUND(quantile_cont(recency_days, 0.50), 6) AS r50,
             ROUND(quantile_cont(recency_days, 0.75), 6) AS r75,
             ROUND(quantile_cont(frequency, 0.25), 6) AS f25,
             ROUND(quantile_cont(frequency, 0.50), 6) AS f50,
             ROUND(quantile_cont(frequency, 0.75), 6) AS f75,
             ROUND(quantile_cont(monetary, 0.25), 6) AS m25,
             ROUND(quantile_cont(monetary, 0.50), 6) AS m50,
             ROUND(quantile_cont(monetary, 0.75), 6) AS m75
      FROM metrics
    ),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary,
             CASE WHEN recency_days <= r25 THEN 4
                  WHEN recency_days <= r50 THEN 3
                  WHEN recency_days <= r75 THEN 2 ELSE 1 END AS r_score,
             CASE WHEN frequency > f75 THEN 4
                  WHEN frequency > f50 THEN 3
                  WHEN frequency > f25 THEN 2 ELSE 1 END AS f_score,
             CASE WHEN monetary > m75 THEN 4
                  WHEN monetary > m50 THEN 3
                  WHEN monetary > m25 THEN 2 ELSE 1 END AS m_score
      FROM metrics CROSS JOIN thr
    )
    SELECT *,
           CASE WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'recent'
                ELSE 'hibernating' END AS segment
    FROM scored
"""


@register("rfm_segments", _RFM_ORACLE)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-percentile RFM quartile segmentation of purchasers."""
    return analytics.rfm_segments(catalog.events(spark, sf_dir))


_ANOMALY_ORACLE = """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    stats AS (
      SELECT event_date, revenue,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(revenue AS DECIMAL(18,2)) * CAST(revenue AS DECIMAL(18,2)))
                  OVER w AS DOUBLE) AS s2
      FROM daily
      WINDOW w AS (ORDER BY event_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_date, revenue,
           ROUND(s1 / n, 6) AS trailing_mean,
           CASE WHEN n >= 7 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                THEN ROUND((revenue - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)
                END AS z_score,
           CASE WHEN n >= 7 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                 AND abs((revenue - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) > 2
                THEN 1 ELSE 0 END AS is_anomaly
    FROM stats
"""


@register("revenue_anomaly_zscore", _ANOMALY_ORACLE)
def q_revenue_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day z-score anomaly flags on daily revenue."""
    return analytics.revenue_anomalies(catalog.events(spark, sf_dir))


_CDC_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate"

_CDC_ORACLE = f"""
    WITH base AS (
      SELECT {_CDC_COLS} FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ),
    ch AS (
      SELECT {_CDC_COLS},
             CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3') THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    )
    SELECT {_CDC_COLS} FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT {_CDC_COLS} FROM ch WHERE op <> 'D'
"""


@register("cdc_upsert", _CDC_ORACLE)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a derived change batch (25% deletes by key-hash, rest
    upserts) onto the pre-1999 orders snapshot."""
    cols = [c.strip() for c in _CDC_COLS.split(",")]
    orders = catalog.load_table(spark, "orders", sf_dir).select(*cols)
    cut = F.lit("1999-01-01").cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < cut)
    changes = orders.filter(F.col("o_orderdate") >= cut).withColumn(
        "op",
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            ),
            "D",
        ).otherwise("U"),
    )
    return cdc.apply_changes(
        base, changes, key_cols=["o_orderkey"], seq_col="o_orderdate"
    )


_SCD2_ORACLE = f"""
    WITH obs AS (
      SELECT user_id, ts, event_id,
             CASE WHEN value < 20 THEN 'low'
                  WHEN value < 80 THEN 'mid' ELSE 'high' END AS tier
      FROM events WHERE event_type = 'purchase'
    ),
    marked AS (
      SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM obs
    ),
    chg AS (
      SELECT user_id, tier, ts, event_id FROM marked
      WHERE prev IS NULL OR prev <> tier
    )
    SELECT user_id, tier,
           ts AS effective_from,
           COALESCE(lead(ts) OVER w, TIMESTAMP '{cdc.SCD2_OPEN_END}') AS effective_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 spend-tier history of each purchaser (shared by the SCD2
    and point-in-time-join queries)."""
    obs = (
        catalog.events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("value") < 20, "low")
            .when(F.col("value") < 80, "mid")
            .otherwise("high")
            .alias("tier"),
        )
    )
    return cdc.scd2_intervals(
        obs, key_col="user_id", ts_col="ts", attr_col="tier", tiebreak_col="event_id"
    )


@register("scd2_user_tiers", _SCD2_ORACLE)
def q_scd2_user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity history of each purchaser's spend tier."""
    return _tier_history(spark, sf_dir)


_PIT_ORACLE = f"""
    WITH obs AS (
      SELECT user_id, ts, event_id,
             CASE WHEN value < 20 THEN 'low'
                  WHEN value < 80 THEN 'mid' ELSE 'high' END AS tier
      FROM events WHERE event_type = 'purchase'
    ),
    marked AS (
      SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM obs
    ),
    chg AS (
      SELECT user_id, tier, ts, event_id FROM marked
      WHERE prev IS NULL OR prev <> tier
    ),
    hist AS (
      SELECT user_id, tier, ts AS effective_from,
             COALESCE(lead(ts) OVER w, TIMESTAMP '{cdc.SCD2_OPEN_END}') AS effective_to
      FROM chg
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT COALESCE(h.tier, 'no_purchase_yet') AS tier_at_event,
           COUNT(*) AS n_view_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    LEFT JOIN hist h
      ON e.user_id = h.user_id
     AND e.ts >= h.effective_from AND e.ts < h.effective_to
    WHERE e.event_type = 'view'
    GROUP BY 1
"""


@register("pit_tier_at_view", _PIT_ORACLE)
def q_pit_tier_at_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free point-in-time enrichment: each view event tagged with
    the spend tier the user held AT THAT MOMENT (``cdc.pit_join``
    against the SCD2 history), rolled up per tier. Views before the
    user's first purchase carry no tier — the join must not borrow a
    future version (that would be feature leakage in training data)."""
    hist = _tier_history(spark, sf_dir).select(
        "user_id", "tier", "effective_from", "effective_to"
    )
    views = (
        catalog.events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("user_id", "ts", "event_id")
    )
    joined = cdc.pit_join(views, hist, key_col="user_id", ts_col="ts")
    return joined.groupBy(
        F.coalesce(F.col("tier"), F.lit("no_purchase_yet")).alias("tier_at_event")
    ).agg(
        F.count("*").alias("n_view_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


_HLL_ROLLUP_ORACLE = """
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_ok
    FROM events GROUP BY 1
"""


@register("approx_users_monthly_rollup", _HLL_ROLLUP_ORACLE)
def q_approx_users_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct users: HLL sketches built per DAY, merged to
    months — the rollup never rescans raw events. The DataSketches
    estimate is engine-specific, but its error BOUND is checkable:
    lg_k=12 gives ~1.6% relative standard error, so the oracle asserts
    |approx - exact| <= 5% (3 sigma) alongside the exact count."""
    ev = catalog.events(spark, sf_dir)
    daily = sketch.hll_sketches(
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id"),
        ["day"],
        "user_id",
    )
    monthly = sketch.hll_rollup(
        daily.select(F.date_trunc("month", "day").alias("month"), "hll"),
        ["month"],
        estimate_alias="approx_users",
    )
    exact = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        monthly.join(exact, on="month")
        .select(
            "month",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_ok"),
        )
    )


_INCR_ORACLE = """
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_revenue,
           COUNT(*) AS n_purchases,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
             AS avg_purchase
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
"""


@register("incremental_daily_revenue", _INCR_ORACLE)
def q_incremental_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue maintained INCREMENTALLY: the history is split into
    a 'stored snapshot' batch and a 'delta' batch at an arbitrary cut,
    each reduced to additive DECIMAL partials, then merged with
    operators/incremental.py. The oracle is the full recompute over all
    events — green means the incremental path is bit-identical to the
    from-scratch aggregate (associativity over any batch slicing)."""
    from streaming_ecom_analytics_spark.operators import incremental

    ev = catalog.events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cut = F.lit("2024-01-16").cast("timestamp")
    measures = {
        "rev_sum": F.sum(F.col("value").cast("decimal(18,2)")),
        "n_purchases": F.count("*"),
    }
    key = F.date_trunc("day", "ts").alias("event_date")
    snapshot = incremental.partial_aggregate(ev.filter(F.col("ts") < cut), [key], measures)
    delta = incremental.partial_aggregate(ev.filter(F.col("ts") >= cut), [key], measures)
    merged = incremental.combine_partials(
        snapshot, delta, ["event_date"], ["rev_sum", "n_purchases"]
    )
    return merged.select(
        "event_date",
        F.round(F.col("rev_sum").cast("double"), 2).alias("total_revenue"),
        F.col("n_purchases"),
        F.round(F.col("rev_sum").cast("double") / F.col("n_purchases"), 6).alias(
            "avg_purchase"
        ),
    )


_BLOOM_ORACLE = """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'AUTOMOBILE'
    )
"""


@register("bloom_filtered_orders", _BLOOM_ORACLE)
def q_bloom_filtered_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join accelerated by an explicit Bloom prefilter: the
    automobile-segment customer keys build a broadcastable bit table
    that drops non-matching orders before the exact semi join. Oracle =
    the plain EXISTS semi join, so the bloom stage must be invisible in
    the result (no false negatives, false positives exactly removed)."""
    orders = catalog.load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    autos = (
        catalog.load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return sketch.bloom_semi_join(orders, autos, on="o_custkey", n_bits=1 << 16)


_MAD_ORACLE = """
    WITH med AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS median_value
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(MAX(m.median_value), 6) AS median_value,
           ROUND(quantile_cont(abs(e.value - m.median_value), 0.5), 6) AS mad,
           COUNT(*) AS n
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type
"""


@register("value_mad_by_type", _MAD_ORACLE)
def q_value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type dispersion: median and median absolute deviation
    of event value — two parallel exact-percentile aggregates with a
    broadcast of the tiny group-median frame."""
    return analytics.mad_by_group(
        catalog.events(spark, sf_dir), group_col="event_type", value_col="value"
    )


_COOC_ORACLE = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    )
    SELECT item_a, item_b, ca.n AS n_a, cb.n AS n_b, n_both,
           ROUND(n_both / sqrt(ca.n * cb.n), 6) AS cosine
    FROM pairs
    JOIN cnt ca ON ca.item = item_a
    JOIN cnt cb ON cb.item = item_b
"""


def _shared_item_cooc(spark: SparkSession, sf_dir: str, min_support: int) -> DataFrame:
    """The family-shared co-purchase pair table (round-11): the item-
    graph queries all start from the identical
    ``analytics.item_cooccurrence(events, min_support=m)`` build —
    min_support=2 feeds item_pagerank / item_communities / item_kcore,
    min_support=5 feeds item_cooccurrence / item_triangles /
    item_clustering_coefficients. One persisted pair frame per support
    level per pass; the first consumer pays the basket self-join."""
    from streaming_ecom_analytics_spark.caching import shared_subtree

    return shared_subtree(
        ("item_cooc", sf_dir, min_support),
        lambda: analytics.item_cooccurrence(
            catalog.events(spark, sf_dir), min_support=min_support
        ),
    )


@register("item_cooccurrence", _COOC_ORACLE)
def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase recommender pairs over the category payload
    (props->k), min support 5."""
    return _shared_item_cooc(spark, sf_dir, 5)


_HISTOGRAM_ORACLE = """
    WITH spine AS (SELECT unnest(range(0, 25)) AS bin),
    b AS (
      SELECT CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 20.0), 0), 24) AS BIGINT) AS bin,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS bin_sum
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1
    )
    SELECT s.bin,
           ROUND(0.0 + s.bin * 20.0, 6) AS bin_lo,
           ROUND(0.0 + (s.bin + 1) * 20.0, 6) AS bin_hi,
           COALESCE(b.n, 0) AS n,
           ROUND(CAST(COALESCE(b.bin_sum, 0) AS DOUBLE), 2) AS bin_sum
    FROM spine s LEFT JOIN b USING (bin)
"""


@register("value_histogram", _HISTOGRAM_ORACLE)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiling histogram of event value: 25 fixed-width bins over
    [0, 500) with a zero-filled spine — one clamped-floor hash
    aggregate, at most 25 rows shuffled per map partition."""
    return analytics.histogram_fixed_width(
        catalog.events(spark, sf_dir), "value", lo=0.0, hi=500.0, n_bins=25
    )


_GAPFILL_ORACLE = """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS s
      FROM events
      WHERE event_type = 'purchase' AND value > 180
      GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
                                    (SELECT MAX(day) FROM daily),
                                    INTERVAL 1 DAY)) AS day
    )
    SELECT s.day,
           COALESCE(d.n, 0) AS n,
           ROUND(CAST(d.s AS DOUBLE), 2) AS day_sum,
           ROUND(CAST(LAST_VALUE(d.s IGNORE NULLS) OVER (
             ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS filled_sum,
           d.s IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@register("gapfilled_highvalue_revenue", _GAPFILL_ORACLE)
def q_gapfilled_highvalue_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series of high-value (>180) purchase revenue
    with LOCF carry — the TimescaleDB time_bucket_gapfill + locf
    pattern, day spine built engine-side from a one-row bounds
    aggregate."""
    ev = catalog.events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 180)
    )
    return aggregates.gapfill_daily_locf(ev)


_USER_GROWTH_ORACLE = """
    WITH fs AS (
      SELECT user_id, MIN(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day
      FROM events GROUP BY user_id
    ),
    d AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM d
"""


@register("user_growth_curve", _USER_GROWTH_ORACLE)
def q_user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users and the cumulative growth curve — per-user
    first-seen aggregate, then a running sum over the tiny day
    series."""
    return analytics.user_growth(catalog.events(spark, sf_dir))


_ABC_ORACLE = """
    WITH c AS (
      SELECT json_extract_string(props, '$.k') AS category,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
      GROUP BY 1
    ),
    d AS (SELECT category, revenue,
                 CAST(revenue AS DECIMAL(18,2)) AS rev_dec FROM c),
    t AS (SELECT SUM(rev_dec) AS total FROM d)
    SELECT d.category, d.revenue,
           ROW_NUMBER() OVER (ORDER BY d.revenue DESC, d.category ASC) AS rank,
           ROUND(CAST(SUM(d.rev_dec) OVER (
                   ORDER BY d.revenue DESC, d.category ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS cum_share,
           CASE WHEN ROUND(CAST(SUM(d.rev_dec) OVER (
                   ORDER BY d.revenue DESC, d.category ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS DOUBLE) / CAST(t.total AS DOUBLE), 6) <= 0.8 THEN 'A'
                WHEN ROUND(CAST(SUM(d.rev_dec) OVER (
                   ORDER BY d.revenue DESC, d.category ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS DOUBLE) / CAST(t.total AS DOUBLE), 6) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM d, t
"""


@register("category_abc_classes", _ABC_ORACLE)
def q_category_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of categories by purchase revenue:
    rank, cumulative revenue share, and A/B/C class. The windows run
    over the per-category aggregate (bounded rows), never the fact
    table."""
    ev = catalog.events(spark, sf_dir)
    cat = F.get_json_object(F.col("props"), "$.k")
    per_cat = (
        ev.filter((F.col("event_type") == "purchase") & cat.isNotNull())
        .groupBy(cat.alias("category"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue")
        )
    )
    return analytics.abc_classification(per_cat)


_MOM_ORACLE = """
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month,
           ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
           ROUND(CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE), 2) AS prev_revenue,
           ROUND(CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE)
                 / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE), 6) AS growth
    FROM m
"""


@register("orders_mom_growth", _MOM_ORACLE)
def q_orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order revenue growth over the multi-year
    orders table — lag over the ~84-row month series."""
    orders = catalog.load_table(spark, "orders", sf_dir).select(
        "o_orderdate", "o_totalprice"
    )
    return analytics.mom_growth(orders, ts_col="o_orderdate", value_col="o_totalprice")


_SHIP_LATENCY_ORACLE = """
    SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
           COUNT(*) AS n_lines,
           ROUND(CAST(SUM(CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                                        CAST(l.l_shipdate AS DATE)) AS BIGINT)
                      ) AS DOUBLE) / COUNT(*), 6) AS avg_days_to_ship,
           ROUND(CAST(COUNT(CASE WHEN datediff('day', CAST(o.o_orderdate AS DATE),
                                              CAST(l.l_shipdate AS DATE)) > 90
                                 THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS slow_fraction
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
"""


@register("shipping_latency_monthly", _SHIP_LATENCY_ORACLE)
def q_shipping_latency_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment latency per ship month: average order-to-ship days
    and the slow-shipment fraction (>90 days). Fact-fact equi join on
    the order key feeding one month-grain hash aggregate; day sums
    stay exact integers until the final division."""
    li = catalog.load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    orders = catalog.load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(days.cast("long")).cast("double") / F.count("*"), 6
            ).alias("avg_days_to_ship"),
            F.round(
                F.count(F.when(days > 90, 1)).cast("double") / F.count("*"), 6
            ).alias("slow_fraction"),
        )
    )


_TWA_ORACLE = """
    WITH pts AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             epoch_us(ts) AS t, value,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP)
               ORDER BY epoch_us(ts), value
             ) AS t_next
      FROM events
    ),
    pu AS (
      SELECT user_id, day,
             SUM(CAST(value AS DECIMAL(18,2)) * (t_next - t)) AS vd,
             SUM(t_next - t) AS d
      FROM pts WHERE t_next IS NOT NULL
      GROUP BY 1, 2
    ),
    twa AS (
      SELECT day, ROUND(CAST(vd AS DOUBLE) / CAST(d AS DOUBLE), 6) AS twa
      FROM pu WHERE d > 0
    )
    SELECT day, COUNT(*) AS n_users,
           ROUND(CAST(SUM(CAST(twa AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS avg_twa
    FROM twa GROUP BY day
"""


@register("time_weighted_value_daily", _TWA_ORACLE)
def q_time_weighted_value_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily mean of per-user time-weighted value averages — LOCF
    weighting over irregular event times, per-entity windows only."""
    return analytics.time_weighted_avg_daily(catalog.events(spark, sf_dir))


def _profile_col_sql(col: str, numeric: bool) -> str:
    mn = f"CAST(MIN({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    mx = f"CAST(MAX({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    return f"""
      SELECT '{col}' AS column, COUNT(*) AS n_rows,
             COUNT(CASE WHEN {col} IS NULL THEN 1 END) AS n_nulls,
             ROUND(CAST(COUNT(CASE WHEN {col} IS NULL THEN 1 END) AS DOUBLE)
                   / COUNT(*), 6) AS null_frac,
             COUNT(DISTINCT {col}) AS n_distinct,
             {mn} AS min_val, {mx} AS max_val
      FROM events"""


_PROFILE_ORACLE = " UNION ALL ".join(
    _profile_col_sql(c, n)
    for c, n in [
        ("event_id", True),
        ("user_id", True),
        ("event_type", False),
        ("value", True),
        ("props", False),
    ]
)


@register("events_profile", _PROFILE_ORACLE)
def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the events table (null counts/fracs,
    exact distincts, numeric min/max) in ONE aggregation pass + an
    unpivot. ts is excluded: the oracle engine keeps nanosecond
    precision the Spark reader truncates to micros, so its distinct
    count is not comparable."""
    ev = catalog.events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    return validation.profile_table(
        ev, numeric_cols=("event_id", "user_id", "value")
    )


_BANDS_ORACLE = """
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY 1
"""


@register("daily_value_bands", _BANDS_ORACLE)
def q_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily p50/p90/p99 value bands — one two-phase percentile
    aggregate keyed by day, no global sort."""
    return analytics.daily_percentile_bands(catalog.events(spark, sf_dir))


def _pagerank_oracle(n_iter: int = 4, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank in ANSI SQL: one CTE per power
    iteration, each re-expressing exactly the Spark round (teleport +
    damped in-sum of rank/out_deg; symmetric edges, so no dangling
    mass). Not a recursive CTE — aggregation over the recursive
    relation is restricted in most engines, and unrolling keeps the
    replay bit-for-bit auditable."""
    # Literals via repr() so the SQL decimal string parses to the SAME
    # double Spark computes in Python (1.0 - 0.85 == 0.15000000000000002
    # in binary floating point; writing "0.15" would be one ulp off).
    teleport = f"CAST({(1.0 - damping)!r} AS DOUBLE) / (SELECT n FROM nn)"
    damping_lit = f"CAST({damping!r} AS DOUBLE)"
    base = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT item_a AS src, item_b AS dst FROM pairs
      UNION ALL
      SELECT item_b AS src, item_a AS dst FROM pairs
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
    )"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f""",
    r{i} AS (
      SELECT n.node,
             {teleport} + {damping_lit} * COALESCE(s.in_sum, CAST(0.0 AS DOUBLE))
               AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / d.out_deg) AS in_sum
        FROM edges e
        JOIN r{i - 1} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )""")
    return (
        base
        + "".join(steps)
        + f"\n    SELECT node, ROUND(rank, 8) AS rank FROM r{n_iter}"
    )


@register("item_pagerank", _pagerank_oracle())
def q_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase item graph (both directions of
    each item_cooccurrence pair). Oracle: the same 4 power iterations
    unrolled as one SQL statement (one CTE per round) — the co-purchase
    graph is symmetric, so the Spark dangling-mass term is identically
    zero and both replays reduce to teleport + damped in-sums.
    Closed-form behavior (star graph, rank-mass conservation, deeper
    iteration) is additionally pinned by unit tests.

    n_iter=4 at the registered/bench scale (round-10 verdict #1b): at
    toy SF each fixpoint round costs a fixed ~1 s of pure scheduling
    (join + agg + localCheckpoint on a few-hundred-node graph), so 8
    rounds measured scheduler overhead twice over — the iteration
    MECHANICS (per-round join/agg/lineage-cut, mass conservation) are
    fully exercised at 4, and production callers pick n_iter for
    convergence, not the bench."""
    pairs = _shared_item_cooc(spark, sf_dir, 2).select("item_a", "item_b")
    edges = pairs.selectExpr("item_a AS src", "item_b AS dst").union(
        pairs.selectExpr("item_b AS src", "item_a AS dst")
    )
    return analytics.pagerank(edges, n_iter=4)


# ---------------------------------------------------------------------------
# Feature-engineering ops: rolling time-range features, normalization,
# negative sampling
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d,
           COUNT(*) OVER w AS n_7d
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
"""


@register("rolling_user_spend_7d", _ROLLING_ORACLE)
def q_rolling_user_spend_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free trailing features: every purchase carries the user's
    7-day trailing spend sum and purchase count (time-RANGE frame over
    exact epoch micros — only the past enters the feature)."""
    purchases = (
        catalog.events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    return analytics.rolling_time_features(
        purchases, user_col="user_id", ts_col="ts", value_col="value", window_days=7
    ).select("event_id", "user_id", "ts", "sum_7d", "n_7d")


_SCALE_ORACLE = """
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss,
             MIN(value) AS mn, MAX(value) AS mx
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           ROUND((value - s / n) / NULLIF(sqrt((ss - s * s / n) / NULLIF(CAST(n - 1 AS DOUBLE), 0)), 0), 6) AS z_score,
           ROUND((value - mn) / NULLIF(mx - mn, 0), 6) AS min_max
    FROM events e JOIN stats USING (event_type)
"""


@register("scaled_event_values", _SCALE_ORACLE)
def q_scaled_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score and min-max normalization of the value
    column — feature scaling with exact-DECIMAL group statistics, so
    the scaled features are bit-stable across engines/partitionings."""
    ev = catalog.events(spark, sf_dir).select("event_id", "event_type", "value")
    return analytics.scale_features(ev, value_col="value", group_col="event_type").select(
        "event_id", "event_type", "z_score", "min_max"
    )


_NEG_ORACLE = """
    WITH pos AS (
      SELECT DISTINCT user_id, json_extract_string(props, '$.k') AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    items AS (SELECT DISTINCT item FROM pos),
    users AS (SELECT DISTINCT user_id FROM pos),
    bparam AS (
      SELECT GREATEST(1, CAST(CEIL(COUNT(*) / 32.0) AS BIGINT)) AS b FROM items
    ),
    bucketed AS (
      SELECT item,
             CAST(('0x' || substr(md5(item), 1, 15)) AS UBIGINT)
               % (SELECT b FROM bparam) AS bkt
      FROM items
    ),
    draws AS (
      SELECT u.user_id, t.t,
             CAST(('0x' || substr(md5(CONCAT(CAST(u.user_id AS VARCHAR), '#',
                                             CAST(t.t AS VARCHAR))), 1, 15))
                  AS UBIGINT) % (SELECT b FROM bparam) AS bkt
      FROM users u CROSS JOIN (SELECT unnest(range(1, 13)) AS t) t
    ),
    picked AS (
      SELECT user_id, t, item FROM (
        SELECT d.user_id, d.t, bk.item,
               ROW_NUMBER() OVER (
                 PARTITION BY d.user_id, d.t
                 ORDER BY md5(CONCAT(CAST(d.user_id AS VARCHAR), '#',
                                     CAST(d.t AS VARCHAR), '#', bk.item)),
                          bk.item
               ) AS pn
        FROM draws d JOIN bucketed bk ON bk.bkt = d.bkt
      ) WHERE pn = 1
    ),
    fresh AS (
      SELECT p.user_id, p.item, p.t FROM picked p
      ANTI JOIN pos ON pos.user_id = p.user_id AND pos.item = p.item
    ),
    firsts AS (SELECT user_id, item, MIN(t) AS t FROM fresh GROUP BY user_id, item)
    SELECT user_id, item, CAST(rn AS BIGINT) AS neg_rank
    FROM (
      SELECT user_id, item,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) AS rn
      FROM firsts
    ) WHERE rn <= 3
"""


@register("purchase_negative_samples", _NEG_ORACLE)
def q_purchase_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Up to three deterministic negative items per purchasing user
    (items the user never bought, picked by constant-work hash-bucketed
    draws — rerun-stable, no RNG state, never a user×catalog product),
    the contrastive-training counterpart of the positive interaction
    set. oversample=4 explicitly (12 draws — the oracle's range(1,13)):
    the library default stays 8 because oversample changes outputs,
    not just cost (round-7 advisor); the bench-motivated 4x budget is
    a property of THIS registered query."""
    pos = (
        catalog.events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.get_json_object(F.col("props"), "$.k").alias("item")
        )
    )
    return analytics.negative_samples(
        pos, user_col="user_id", item_col="item", n_neg=3, oversample=4
    )


_MG_ORACLE = """
    SELECT event_type AS item, COUNT(*) AS exact_count,
           TRUE AS present_ok, TRUE AS bound_ok
    FROM events GROUP BY event_type
    ORDER BY exact_count DESC, item ASC
    LIMIT 5
"""


@register("heavy_hitters_mg", _MG_ORACLE)
def q_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent event types at capacity 3 < cardinality 5,
    so evictions and the mergeable-summary decrement are genuinely
    exercised. MG's theorems (every freq > n/(k+1) item survives;
    estimates within [exact - n/(k+1), exact]) hold for ANY input, so
    the oracle emits the exact counts with constant TRUEs — a merge or
    decrement bug flips a boolean (the CMS/HLL bounded-error oracle
    pattern)."""
    return sketch.misra_gries_check(
        catalog.events(spark, sf_dir), "event_type", capacity=3, top=5
    )


_LINKAGE_ORACLE = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS distance
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


@register("customer_name_linkage", _LINKAGE_ORACLE)
def q_customer_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs: same-nation customers whose
    names are within edit distance 1 (substitution or indel).
    Candidates come from deletion-neighborhood blocking (FastSS), so
    the self-join never goes quadratic even though every name shares
    the Customer# prefix; the oracle is the unblocked brute force —
    blocking must not change the result."""
    from streaming_ecom_analytics_spark.functions import dedup

    return dedup.fuzzy_link_pairs(
        catalog.load_table(spark, "customer", sf_dir),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=("c_nationkey",),
        max_distance=1,
    ).select("id_a", "id_b", "name_a", "name_b", "distance")


_APPROX_PCTL_ORACLE = """
    SELECT event_type, q, TRUE AS rank_ok
    FROM (SELECT DISTINCT event_type FROM events)
    CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q)
    ORDER BY event_type, q
"""


@register("approx_percentile_bounds", _APPROX_PCTL_ORACLE)
def q_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna) with its rank guarantee as
    the checkable contract: at accuracy a, the returned value's true
    rank must lie within n/a of the target rank q*n. The query
    re-ranks the approximate answers against the raw data (one extra
    aggregate over a 15-row broadcast probe) and emits the boolean;
    the oracle pins the (event_type, q) grid with constant TRUE —
    the exact approximate VALUES are engine-internal, their guarantee
    is not."""
    events = catalog.events(spark, sf_dir).select("event_type", "value")
    accuracy = 1000
    qs = [0.5, 0.9, 0.99]
    approx = (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", qs, accuracy).alias("apx"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "n",
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(q) for q in qs]).alias("q"), F.col("apx").alias("v")
                )
            ).alias("z"),
        )
        .select("event_type", "n", F.col("z.q").alias("q"), F.col("z.v").alias("v"))
    )
    ranked = (
        events.join(F.broadcast(approx), on="event_type")
        .groupBy("event_type", "q", "n", "v")
        .agg(
            F.count(F.when(F.col("value") <= F.col("v"), 1)).alias("rank_le"),
            F.count(F.when(F.col("value") < F.col("v"), 1)).alias("rank_lt"),
        )
    )
    # Spark's documented contract: floor((p-err)*N) <= rank(x) <=
    # ceil((p+err)*N), err = 1/accuracy. v occupies ranks
    # (rank_lt, rank_le]; the contract holds iff that half-open span
    # intersects [lo, hi] — i.e. rank_le >= lo AND rank_lt < hi (the
    # lowest rank v occupies is rank_lt + 1, which must be <= hi).
    eps = 1.0 / accuracy
    lo = F.floor((F.col("q") - eps) * F.col("n").cast("double"))
    hi = F.ceil((F.col("q") + eps) * F.col("n").cast("double"))
    return ranked.select(
        "event_type",
        "q",
        (
            (F.col("rank_le") >= lo) & (F.col("rank_lt") < hi)
        ).alias("rank_ok"),
    ).orderBy("event_type", "q")


@register(
    "event_value_deciles",
    """
    SELECT event_id, event_type, value,
           CAST(NTILE(10) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS INTEGER) AS decile
    FROM events
    """,
)
def q_event_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (the feature-engineering bucketizer):
    per-type value deciles via NTILE with a deterministic (value,
    event_id) tiebreak. Partitioned by event_type, so the sort is
    per-type and parallel — at scale, swap NTILE for precomputed
    approx-percentile boundaries joined broadcast (documented in
    SCALE.md) when a single type's partition outgrows one task."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return catalog.events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "value",
        F.ntile(10).over(w).alias("decile"),
    )


def _label_prop_oracle(n_iter: int = 6) -> str:
    """Unrolled fixed-iteration min-label propagation in ANSI SQL —
    one CTE per round, exactly the Spark rounds (min of own + neighbor
    labels), over the same co-purchase edge construction as PageRank."""
    base = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT item_a AS src, item_b AS dst FROM pairs
      UNION ALL
      SELECT item_b AS src, item_a AS dst FROM pairs
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
    ),
    l0 AS (SELECT node, node AS label FROM nodes)"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f""",
    l{i} AS (
      SELECT p.node,
             LEAST(p.label, COALESCE(nm.nbr_label, p.label)) AS label
      FROM l{i - 1} p LEFT JOIN (
        SELECT e.dst AS node, MIN(r.label) AS nbr_label
        FROM edges e JOIN l{i - 1} r ON r.node = e.src
        GROUP BY e.dst
      ) nm ON nm.node = p.node
    )""")
    return base + "".join(steps) + f"\n    SELECT node, label FROM l{n_iter}"


@register("item_communities", _label_prop_oracle())
def q_item_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation communities over the co-purchase item
    graph — 6 synchronous rounds, so each label is exactly the min
    item id within 6 hops (deterministic for any input). Oracle: the
    identical rounds unrolled as one SQL statement, one CTE per round,
    same edge construction as item_pagerank."""
    pairs = _shared_item_cooc(spark, sf_dir, 2).select("item_a", "item_b")
    edges = pairs.selectExpr("item_a AS src", "item_b AS dst").union(
        pairs.selectExpr("item_b AS src", "item_a AS dst")
    )
    return analytics.label_propagation_min(edges, n_iter=6)


_JSON_PROFILE_ORACLE = r"""
    WITH kv AS (
      SELECT k AS key, json_extract_string(props, '$.' || k) AS value
      FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    )
    SELECT key,
           COUNT(*) AS n_present,
           COUNT(DISTINCT value) AS n_distinct,
           COUNT(TRY_CAST(value AS DOUBLE)) AS n_numeric,
           MIN(TRY_CAST(value AS DOUBLE)) AS min_num,
           MAX(TRY_CAST(value AS DOUBLE)) AS max_num
    FROM kv GROUP BY key ORDER BY key
"""


@register("props_schema_profile", _JSON_PROFILE_ORACLE)
def q_props_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema profiling of the JSON props column: per
    key, presence count, distinct values, and numeric range — the
    discovery pass a pipeline runs before promoting JSON keys to
    typed columns. Spark parses each document ONCE into
    map<string,string> and explodes (no per-key re-parse, no dynamic
    get_json_object paths); scalar values compare unquoted on both
    engines (nested objects would need a JSON-typed profile — out of
    contract here, props is flat by schema)."""
    kv = catalog.events(spark, sf_dir).select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "value")
    )
    num = F.expr("try_cast(value AS double)")
    return (
        kv.groupBy("key")
        .agg(
            F.count("*").alias("n_present"),
            F.countDistinct("value").alias("n_distinct"),
            F.count(num).alias("n_numeric"),
            F.min(num).alias("min_num"),
            F.max(num).alias("max_num"),
        )
        .orderBy("key")
    )


_TRANSITION_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, COUNT(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY from_type), 6) AS p
    FROM cnt
    ORDER BY from_type, to_type
"""


@register("event_transition_matrix", _TRANSITION_ORACLE)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov transition matrix: per-user event sequences
    (ts, event_id tiebreak) → lead() pairs → global (from, to) counts
    and row-normalized probabilities. One per-user window (bounded by
    a user's own history) + one 25-cell aggregate — the partition-by-
    entity discipline that keeps sequence analytics linear at scale.
    Probability is an integer ratio divided once in double —
    bit-equal across engines."""
    from pyspark.sql.window import Window

    seq = catalog.events(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    )
    cnt = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    w = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(w), 6
        ).alias("p"),
    ).orderBy("from_type", "to_type")


_EXPECTATIONS_ORACLE = """
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN NOT (event_type IN
              ('signup', 'click', 'error', 'view', 'purchase')) THEN 1 END)
          AS v_event_type_in_domain,
        COUNT(CASE WHEN NOT (event_id IS NOT NULL) THEN 1 END)
          AS v_event_id_not_null,
        COUNT(CASE WHEN NOT (ts >= TIMESTAMP '1990-01-01'
                         AND ts < TIMESTAMP '2030-01-01') THEN 1 END)
          AS v_ts_in_sane_range,
        COUNT(CASE WHEN NOT (event_type <> 'purchase' OR value >= 0) THEN 1 END)
          AS v_purchase_value_non_negative,
        COUNT(CASE WHEN NOT (user_id > 0) THEN 1 END) AS v_user_id_positive,
        COUNT(event_id) - COUNT(DISTINCT event_id) AS v_event_id_unique
      FROM events
    ),
    rows_out AS (
      SELECT 'event_id_not_null' AS expectation, n_rows,
             v_event_id_not_null AS n_violations FROM agg
      UNION ALL SELECT 'event_id_unique', n_rows, v_event_id_unique FROM agg
      UNION ALL SELECT 'event_type_in_domain', n_rows,
                       v_event_type_in_domain FROM agg
      UNION ALL SELECT 'purchase_value_non_negative', n_rows,
                       v_purchase_value_non_negative FROM agg
      UNION ALL SELECT 'ts_in_sane_range', n_rows, v_ts_in_sane_range FROM agg
      UNION ALL SELECT 'user_id_positive', n_rows, v_user_id_positive FROM agg
    )
    SELECT expectation, n_rows, n_violations, n_violations = 0 AS passed
    FROM rows_out ORDER BY expectation
"""


@register("events_expectations", _EXPECTATIONS_ORACLE)
def q_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract report over the events table — six
    expectations (domain membership, non-null, sane time range,
    purchase-value sign, positive user ids, event-id uniqueness)
    computed in ONE aggregation pass and unpivoted to a row each
    (validation.expectations_report)."""
    events = catalog.events(spark, sf_dir)
    checks = {
        "event_id_not_null": F.col("event_id").isNotNull(),
        "event_type_in_domain": F.col("event_type").isin(
            "signup", "click", "error", "view", "purchase"
        ),
        "ts_in_sane_range": (
            (F.col("ts") >= F.lit("1990-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2030-01-01").cast("timestamp"))
        ),
        "purchase_value_non_negative": (
            (F.col("event_type") != "purchase") | (F.col("value") >= 0)
        ),
        "user_id_positive": F.col("user_id") > 0,
    }
    return validation.expectations_report(
        events, checks, unique_cols=["event_id"]
    )


_WINSORIZE_ORACLE = """
    WITH b AS (
      SELECT event_type,
             quantile_disc(value, 0.01) AS p01,
             quantile_disc(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           LEAST(GREATEST(e.value, b.p01), b.p99) AS value_winsorized,
           CAST(e.value < b.p01 OR e.value > b.p99 AS BOOLEAN) AS was_clipped
    FROM events e JOIN b USING (event_type)
"""


@register("winsorized_event_values", _WINSORIZE_ORACLE)
def q_winsorized_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier capping at the per-type p01/p99): the
    standard robust-feature transform. Exact DISCRETE percentiles
    (actual data values — percentile_disc on both engines, so no
    interpolation-formula drift), computed once per type and broadcast
    back onto the events. At 100 TB the boundary table stays
    |event_type| rows — the join is always broadcast."""
    events = catalog.events(spark, sf_dir)
    b = events.groupBy("event_type").agg(
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY value)").alias("p01"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY value)").alias("p99"),
    )
    return events.join(F.broadcast(b), on="event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias(
            "value_winsorized"
        ),
        ((F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99"))).alias(
            "was_clipped"
        ),
    )


_TARGET_ENC_ORACLE = """
    WITH e AS (
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS cat,
             value
      FROM events
    ),
    g AS (
      SELECT cat, COUNT(*) AS n_cat,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_cat
      FROM e GROUP BY cat
    )
    SELECT e.event_id, e.cat, e.value,
           CASE WHEN g.n_cat > 1
                THEN (g.sum_cat - e.value) / (g.n_cat - 1) END
             AS target_enc_loo
    FROM e JOIN g USING (cat)
"""


@register("target_encoded_categories", _TARGET_ENC_ORACLE)
def q_target_encoded_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the props category against the
    value target — the leakage-safe mean encoding: each row's code is
    the category mean EXCLUDING itself, (sum - value) / (n - 1), NULL
    for singletons. One aggregate to category grain + a broadcast
    join back. The code is emitted UNROUNDED: every input double and
    the exact-decimal sum are bit-identical on both engines, so the
    quotient is too — while ROUND-on-double is the one step whose
    half-way tie rule differs between engines (see tpch_deep).
    The parsed projection is persisted (round 11): it feeds BOTH the
    category aggregate and the join probe side, and without the cache
    each branch re-runs the full events scan + per-row JSON parse —
    the duplicated-subtree cost is the parse, not the 24-byte rows."""
    from streaming_ecom_analytics_spark.caching import persist_tracked

    e = persist_tracked(
        catalog.events(spark, sf_dir).select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("cat"),
            "value",
        )
    )
    g = e.groupBy("cat").agg(
        F.count("*").alias("n_cat"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_cat"),
    )
    return e.join(F.broadcast(g), on="cat").select(
        "event_id",
        "cat",
        "value",
        F.when(
            F.col("n_cat") > 1,
            (F.col("sum_cat") - F.col("value")) / (F.col("n_cat") - 1),
        ).alias("target_enc_loo"),
    )


_EWMA_ORACLE = r"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
             list(day ORDER BY day) AS days,
             list(revenue ORDER BY day) AS vals
      FROM daily GROUP BY 1
    ),
    expanded AS (
      SELECT event_type, days[i] AS day, vals[i] AS revenue,
             CASE WHEN i = 1 THEN vals[1]
                  ELSE list_reduce(vals[1:i],
                       (acc, x) -> acc * CAST(0.5 AS DOUBLE)
                                   + x * CAST(0.5 AS DOUBLE)) END AS ewma
      FROM series, unnest(generate_series(1, len(vals))) AS t(i)
    )
    SELECT event_type, day, revenue, ROUND(ewma, 6) AS ewma FROM expanded
"""


@register("revenue_ewma_daily", _EWMA_ORACLE)
def q_revenue_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily value smoothing per event type —
    the time-series recurrence class (S_t = αx_t + (1-α)S_{t-1},
    S_1 = x_1, α = 0.5).

    A sequential recurrence has no windowed-aggregate form, and the
    naive fix (a UDF over collected rows) leaves the JVM. The Spark-
    first realization: collect each ~30-row daily series into a sorted
    array (array_sort on (day, value) structs — one shuffle, the same
    one the daily aggregate needs anyway), then compute every prefix
    fold with higher-order `aggregate` over `slice` — pure Catalyst
    expressions, O(n²) per series on n=days, executed inside codegen.
    The DuckDB twin folds the identical list with list_reduce, so the
    IEEE op sequence matches bit-for-bit (α = 0.5 keeps each halving
    exact) and the oracle is value-level. At scale the per-key series
    length is bounded (days), keys parallelize across executors."""
    events = catalog.events(spark, sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("revenue"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "revenue"))).alias("s")
    )
    vals = F.transform("s", lambda x: x.revenue)
    half = F.lit(0.5).cast("double")
    with_arrays = series.select(
        "event_type",
        F.transform("s", lambda x: x.day).alias("days"),
        vals.alias("vals"),
        F.transform(
            vals,
            lambda _, i: F.aggregate(
                F.slice(vals, 2, i),
                F.element_at(vals, 1),
                lambda acc, v: acc * half + v * half,
            ),
        ).alias("ewmas"),
    )
    return (
        with_arrays.select(
            "event_type",
            F.explode(F.arrays_zip("days", "vals", "ewmas")).alias("z"),
        )
        .select(
            "event_type",
            F.col("z.days").alias("day"),
            F.col("z.vals").alias("revenue"),
            F.round(F.col("z.ewmas"), 6).alias("ewma"),
        )
    )


@register(
    "item_ctr_wilson",
    """
    WITH stats AS (
      SELECT CAST(json_extract_string(props, '$.k') AS VARCHAR) AS item,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
             COUNT(CASE WHEN event_type IN ('view', 'purchase') THEN 1 END) AS n
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
      GROUP BY 1
    )
    SELECT item, views, purchases,
           ROUND(CAST(purchases AS DOUBLE) / n, 6) AS conv_rate,
           ROUND((CAST(purchases AS DOUBLE) / n + 1.9208 / n
                  - 1.96 * sqrt((CAST(purchases AS DOUBLE) / n)
                                * (1 - CAST(purchases AS DOUBLE) / n) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS conv_lo,
           ROUND((CAST(purchases AS DOUBLE) / n + 1.9208 / n
                  + 1.96 * sqrt((CAST(purchases AS DOUBLE) / n)
                                * (1 - CAST(purchases AS DOUBLE) / n) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS conv_hi
    FROM stats WHERE n >= 10
    ORDER BY item
    """,
)
def q_item_ctr_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item (props.k) view→purchase conversion with a Wilson 95% score
    interval — the ranking statistic that doesn't over-trust small
    samples (a 2/2 item must not outrank a 90/100 one). Pure
    conditional-count aggregate + closed-form expressions; both
    engines evaluate the identical double formula, so the oracle is
    value-level."""
    ev = catalog.events(spark, sf_dir)
    item = F.get_json_object("props", "$.k")
    stats = (
        ev.filter(item.isNotNull())
        .groupBy(item.alias("item"))
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.count(
                F.when(F.col("event_type").isin("view", "purchase"), 1)
            ).alias("n"),
        )
        .filter(F.col("n") >= 10)
    )
    # trials = view+purchase events, successes = purchases: a true
    # proportion in [0, 1] (purchases are not a subset of views per
    # item, so purchases/views alone is not)
    p = F.col("purchases").cast("double") / F.col("n")
    n = F.col("n")
    z2 = 3.8416  # 1.96^2
    half = F.lit(1.96) * F.sqrt(p * (1 - p) / n + F.lit(0.9604) / (n * n))
    center = p + F.lit(1.9208) / n
    return stats.select(
        "item",
        "views",
        "purchases",
        F.round(p, 6).alias("conv_rate"),
        F.round((center - half) / (1 + z2 / n), 6).alias("conv_lo"),
        F.round((center + half) / (1 + z2 / n), 6).alias("conv_hi"),
    ).orderBy("item")


@register(
    "top_event_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
           COUNT(*) AS n_paths
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_paths DESC, path ASC
    LIMIT 25
    """,
)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 three-step event paths across user timelines — the
    sequence-mining readout over the transition matrix's raw material.
    One shuffle on user_id for the LEAD window (deterministic
    (ts, event_id) order), then a two-phase count +
    TakeOrderedAndProject; the full path distribution is never
    globally sorted."""
    from pyspark.sql import Window

    ev = catalog.events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(25)
    )


@register(
    "daily_value_trend",
    """
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             SUM(CAST(value AS DECIMAL(18,2))) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM daily GROUP BY 1
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_day,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM s
    ORDER BY event_type
    """,
)
def q_daily_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-revenue TREND via closed-form per-group OLS — the
    grouped-regression class, expressed as pure aggregates (n, Σx, Σy,
    Σxy, Σx²) with the slope assembled in double arithmetic at the end.
    Money sums stay exact-DECIMAL (x is an integer day index, so x·y is
    exact too), which makes the assembled doubles — and the value hash —
    partition-order-independent on both engines. One two-level
    aggregate, no window, no UDF; scales as a pair of hash-aggs."""
    ev = catalog.events(spark, sf_dir)
    x = F.datediff(F.date_trunc("DAY", F.col("ts")).cast("date"), F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(
        "event_type", x.alias("x")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
    ).orderBy("event_type")


_TRIANGLE_ORACLE = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    e AS (
      SELECT a.item AS s, b.item AS d
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    ),
    tri AS (
      SELECT e1.s AS a, e1.d AS b, e2.d AS c
      FROM e e1 JOIN e e2 ON e2.s = e1.d JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
    ),
    corners AS (
      SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
"""


@register("item_triangles", _TRIANGLE_ORACLE)
def q_item_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item triangle participation in the co-purchase graph
    (analytics.triangle_counts over the min-support-5 co-occurrence
    edges) — cohesion structure beyond pairwise similarity; each
    triangle found exactly once via the ordered-triple join."""
    edges = _shared_item_cooc(spark, sf_dir, 5).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    return analytics.triangle_counts(edges)


@register(
    "weekend_conversion_ab",
    """
    WITH base AS (
      SELECT CAST(json_extract_string(props, '$.k') AS VARCHAR) AS item,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_we,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
      WHERE event_type IN ('view', 'purchase')
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    s AS (
      SELECT item,
             COUNT(CASE WHEN is_we = 0 THEN 1 END) AS n_wd,
             COUNT(CASE WHEN is_we = 0 AND conv = 1 THEN 1 END) AS c_wd,
             COUNT(CASE WHEN is_we = 1 THEN 1 END) AS n_we,
             COUNT(CASE WHEN is_we = 1 AND conv = 1 THEN 1 END) AS c_we
      FROM base GROUP BY 1
      HAVING COUNT(CASE WHEN is_we = 0 THEN 1 END) >= 10
         AND COUNT(CASE WHEN is_we = 1 THEN 1 END) >= 10
    )
    SELECT item, n_wd, c_wd, n_we, c_we,
           ROUND(CAST(c_wd AS DOUBLE) / n_wd, 6) AS p_wd,
           ROUND(CAST(c_we AS DOUBLE) / n_we, 6) AS p_we,
           ROUND((CAST(c_we AS DOUBLE) / n_we - CAST(c_wd AS DOUBLE) / n_wd)
                 / sqrt((CAST(c_wd + c_we AS DOUBLE) / (n_wd + n_we))
                        * (1 - CAST(c_wd + c_we AS DOUBLE) / (n_wd + n_we))
                        * (1.0 / n_wd + 1.0 / n_we)), 6) AS z
    FROM s
    ORDER BY item
    """,
)
def q_weekend_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test per item: weekend vs weekday
    conversion (purchase share of view+purchase events) — the A/B
    readout as one conditional-count aggregate plus closed-form
    expressions; integer counts make the assembled doubles
    engine-identical, so the oracle is value-level. Guards: both arms
    need >= 10 trials."""
    ev = catalog.events(spark, sf_dir)
    item = F.get_json_object("props", "$.k")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6=Saturday
    is_we = F.dayofweek("ts").isin(1, 7).cast("int")
    conv = (F.col("event_type") == "purchase").cast("int")
    s = (
        ev.filter(F.col("event_type").isin("view", "purchase") & item.isNotNull())
        .groupBy(item.alias("item"))
        .agg(
            F.sum(F.when(is_we == 0, 1).otherwise(0)).alias("n_wd"),
            F.sum(F.when(is_we == 0, conv).otherwise(0)).alias("c_wd"),
            F.sum(F.when(is_we == 1, 1).otherwise(0)).alias("n_we"),
            F.sum(F.when(is_we == 1, conv).otherwise(0)).alias("c_we"),
        )
        .filter((F.col("n_wd") >= 10) & (F.col("n_we") >= 10))
    )
    p_wd = F.col("c_wd").cast("double") / F.col("n_wd")
    p_we = F.col("c_we").cast("double") / F.col("n_we")
    pool = (F.col("c_wd") + F.col("c_we")).cast("double") / (
        F.col("n_wd") + F.col("n_we")
    )
    z = (p_we - p_wd) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / F.col("n_wd") + F.lit(1.0) / F.col("n_we"))
    )
    return s.select(
        "item", "n_wd", "c_wd", "n_we", "c_we",
        F.round(p_wd, 6).alias("p_wd"),
        F.round(p_we, 6).alias("p_we"),
        F.round(z, 6).alias("z"),
    ).orderBy("item")


_CLUSTERING_ORACLE = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    e AS (
      SELECT a.item AS s, b.item AS d
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT s AS node FROM e UNION ALL SELECT d FROM e
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.s AS a, e1.d AS b, e2.d AS c
      FROM e e1 JOIN e e2 ON e2.s = e1.d JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
    ),
    tc AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT a AS node FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT deg.node, deg.degree,
           COALESCE(tc.n_triangles, 0) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN ROUND(2.0 * COALESCE(tc.n_triangles, 0)
                           / (deg.degree * (deg.degree - 1)), 6)
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN tc ON tc.node = deg.node
"""


@register("item_clustering_coefficients", _CLUSTERING_ORACLE)
def q_item_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per item over the co-purchase
    graph (analytics.clustering_coefficients) — neighborhood cohesion
    normalized by degree, the standard community-structure readout on
    top of triangle counts."""
    edges = _shared_item_cooc(spark, sf_dir, 5).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    return analytics.clustering_coefficients(edges)


_ASSOC_ORACLE = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ui),
    cnt AS (SELECT item, COUNT(*) AS n FROM ui GROUP BY item),
    und AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 5
    ),
    rules AS (
      SELECT item_a AS antecedent, item_b AS consequent, n_both FROM und
      UNION ALL
      SELECT item_b AS antecedent, item_a AS consequent, n_both FROM und
    )
    SELECT antecedent, consequent, ca.n AS n_ante, cb.n AS n_cons, n_both,
           ROUND(n_both / ca.n, 6) AS confidence,
           ROUND(CAST(n_both AS DOUBLE) * n_users
                 / (CAST(ca.n AS DOUBLE) * cb.n), 6) AS lift
    FROM rules
    JOIN cnt ca ON ca.item = antecedent
    JOIN cnt cb ON cb.item = consequent
    CROSS JOIN nu
"""


@register("assoc_rules", _ASSOC_ORACLE)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchases (props->k
    baskets, min support 5): confidence and lift per directed rule —
    the recommender step past raw co-occurrence counts."""
    return analytics.association_rules(catalog.events(spark, sf_dir), min_support=5)


_ATTRIBUTION_ORACLE = """
    WITH p AS (
      SELECT event_id AS conv_id, user_id, ts AS pts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    c AS (
      SELECT event_id AS touch_id, user_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT conv_id, cents, touch_id, cts
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cts >= p.pts - INTERVAL '7 days' AND c.cts < p.pts
    ),
    w AS (
      SELECT conv_id, cents, cts,
             COUNT(*) OVER (PARTITION BY conv_id) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY conv_id ORDER BY cts, touch_id
             ) AS rk
      FROM j
    ),
    a AS (
      SELECT CAST(CAST(cts AS DATE) AS TIMESTAMP) AS click_day,
             cents // n
               + CASE WHEN rk <= cents % n THEN 1 ELSE 0 END AS alloc_cents
      FROM w
    )
    SELECT click_day, COUNT(*) AS n_touches,
           ROUND(CAST(SUM(alloc_cents) AS DOUBLE) / 100.0, 2)
             AS attributed_revenue
    FROM a GROUP BY click_day
"""


@register("linear_attribution_daily", _ATTRIBUTION_ORACLE)
def q_linear_attribution_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution: purchase revenue split equally
    (exact penny allocation, largest-remainder) across the user's
    clicks in the prior 7 days, rolled up by touch day. The pairing
    is the bucketed interval join; the oracle is the naive non-equi
    BETWEEN join."""
    return analytics.linear_attribution(catalog.events(spark, sf_dir))


_QNORM_ORACLE = """
    SELECT event_id, event_type, value,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY event_type ORDER BY value ASC
           ), 6) AS qnorm
    FROM events WHERE value IS NOT NULL
"""


@register("value_quantile_normalized", _QNORM_ORACLE)
def q_value_quantile_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type quantile (rank) normalization of event value — the
    distribution-free feature transform; ties share a score, NULLs
    excluded (engines disagree on NULL frame placement)."""
    return analytics.quantile_normalize(catalog.events(spark, sf_dir), "value")


_SKEW_ORACLE = """
    WITH k1 AS (
      SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1
    ),
    k2 AS (
      SELECT event_type AS k, COUNT(*) AS c FROM events GROUP BY 1
    ),
    r1 AS (
      SELECT 'user_id' AS key, CAST(SUM(c) AS BIGINT) AS n_rows,
             COUNT(*) AS n_keys, MAX(c) AS max_key_rows,
             ROUND(MAX(c) / SUM(c), 6) AS top_share,
             ROUND(MAX(c) / percentile_disc(0.5) WITHIN GROUP (ORDER BY c), 6)
               AS skew_ratio
      FROM k1
    ),
    r2 AS (
      SELECT 'event_type' AS key, CAST(SUM(c) AS BIGINT) AS n_rows,
             COUNT(*) AS n_keys, MAX(c) AS max_key_rows,
             ROUND(MAX(c) / percentile_disc(0.5) WITHIN GROUP (ORDER BY c), 6)
               AS skew_ratio,
             ROUND(MAX(c) / SUM(c), 6) AS top_share
      FROM k2
    )
    SELECT key, n_rows, n_keys, max_key_rows, top_share, skew_ratio FROM r1
    UNION ALL
    SELECT key, n_rows, n_keys, max_key_rows, top_share, skew_ratio FROM r2
"""


@register("events_key_skew_report", _SKEW_ORACLE)
def q_events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics for the events table (user_id,
    event_type): key cardinality, heaviest-key share, max/median
    ratio — the report that decides salting vs broadcast vs AQE-skew
    reliance before a big join."""
    return analytics.key_skew_report(
        catalog.events(spark, sf_dir), ["user_id", "event_type"]
    )


_SAMPLED_EST_ORACLE = """
    WITH p AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(value AS DECIMAL(18,2)) AS v,
             (ascii(substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) * 256
              + ascii(substring(md5(CAST(event_id AS VARCHAR)), 2, 1))) % 100
               AS bucket
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    )
    SELECT day,
           CAST(SUM(v) AS DOUBLE) AS exact_revenue,
           CAST(SUM(CASE WHEN bucket < 10 THEN v END) * 10 AS DOUBLE)
             AS est_revenue
    FROM p GROUP BY day
"""


@register("sampled_revenue_estimate", _SAMPLED_EST_ORACLE)
def q_sampled_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-accelerated aggregation: daily purchase revenue estimated
    from a deterministic 10% md5-bucket sample (rerun- and
    engine-stable, unlike TABLESAMPLE) shown against the exact sum.
    Estimates stay in exact DECIMAL (×10 is exact), so the comparison
    is reproducible; the sample predicate pushes to the scan."""
    ev = catalog.events(spark, sf_dir)
    h = F.md5(F.col("event_id").cast("string"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * F.lit(256) + F.ascii(F.substring(h, 2, 1))
    ) % 100
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        bucket.alias("bucket"),
    )
    return p.groupBy("day").agg(
        F.sum("v").cast("double").alias("exact_revenue"),
        (F.sum(F.when(F.col("bucket") < 10, F.col("v"))) * 10)
        .cast("double")
        .alias("est_revenue"),
    )


def _kcore_oracle(k: int = 3, n_rounds: int = 8) -> str:
    """Unrolled fixed-round k-core peel — one (degree, filter) CTE pair
    per round, same graph construction as the pagerank oracle."""
    base = """
    WITH ui AS (
      SELECT DISTINCT user_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    ),
    e0 AS MATERIALIZED (
      SELECT item_a AS src, item_b AS dst FROM pairs
      UNION ALL
      SELECT item_b AS src, item_a AS dst FROM pairs
    )"""
    # Each round references the previous edge set TWICE (degree CTE +
    # filter join); inlined CTEs would double the plan per round
    # (2^n_rounds scans). MATERIALIZED pins each round to one pass —
    # the SQL mirror of the Spark side's per-round localCheckpoint.
    steps = []
    for i in range(1, n_rounds + 1):
        steps.append(f""",
    d{i} AS MATERIALIZED (
      SELECT src AS node FROM e{i - 1} GROUP BY src HAVING COUNT(*) >= {k}
    ),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN d{i} a ON e.src = a.node
      JOIN d{i} b ON e.dst = b.node
    )""")
    return (
        base
        + "".join(steps)
        + f"\n    SELECT src AS item, COUNT(*) AS degree FROM e{n_rounds} GROUP BY src"
    )


@register("item_kcore", _kcore_oracle())
def q_item_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase item graph (8 peel rounds — fixpoint
    at this diameter): the dense sub-network a merchandiser would call
    the catalog's backbone. Oracle: the same peel unrolled as one SQL
    statement, one degree/filter CTE pair per round."""
    pairs = _shared_item_cooc(spark, sf_dir, 2).select("item_a", "item_b")
    edges = pairs.selectExpr("item_a AS src", "item_b AS dst").union(
        pairs.selectExpr("item_b AS src", "item_a AS dst")
    )
    return analytics.kcore(edges, k=3, n_rounds=8)


_KANON_ORACLE = """
    WITH cls AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             FLOOR(value / 50.0) AS vb, COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_classes,
           COUNT(CASE WHEN n < 5 THEN 1 END) AS n_unsafe_classes,
           CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
             AS n_exposed_rows,
           MIN(n) AS min_class_size,
           MIN(n) >= 5 AS k_anonymous
    FROM cls
"""


@register("events_k_anonymity", _KANON_ORACLE)
def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) of the events table under the
    (event_type, day, value-band) quasi-identifier grid — the
    re-identification exposure report gating a data release."""
    ev = catalog.events(spark, sf_dir)
    return validation.k_anonymity_audit(
        ev,
        [
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")),
            F.floor(F.col("value") / 50.0),
        ],
        k=5,
    )


_LDIV_ORACLE = """
    WITH cls AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             COUNT(*) AS n,
             COUNT(DISTINCT FLOOR(value / 50.0)) AS div
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_classes,
           COUNT(CASE WHEN div < 3 THEN 1 END) AS n_undiverse_classes,
           CAST(COALESCE(SUM(CASE WHEN div < 3 THEN n END), 0) AS BIGINT)
             AS n_exposed_rows,
           MIN(div) AS min_diversity,
           MIN(div) >= 3 AS l_diverse
    FROM cls
"""


@register("events_l_diversity", _LDIV_ORACLE)
def q_events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (l=3) of the events table: under the
    (event_type, day) quasi-identifier grid, every class must carry at
    least 3 distinct value-bands — the homogeneity-attack companion to
    events_k_anonymity (a 1000-row class whose values all share one
    band still leaks the band to anyone who can place a user in the
    class)."""
    ev = catalog.events(spark, sf_dir)
    return validation.l_diversity_audit(
        ev,
        [F.col("event_type"), F.date_trunc("day", F.col("ts"))],
        F.floor(F.col("value") / 50.0),
        l=3,
    )


_FK_ORACLE = """
    SELECT 'orders->customer' AS link,
           (SELECT COUNT(*) FROM orders) AS n_child_rows,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_null_fk,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0
           AND (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) = 0 AS ok
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0
           AND (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) = 0
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey)),
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey)) = 0
           AND (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL) = 0
    UNION ALL
    SELECT 'nation->region',
           (SELECT COUNT(*) FROM nation),
           (SELECT COUNT(*) FROM nation WHERE n_regionkey IS NULL),
           (SELECT COUNT(*) FROM nation n
            WHERE n.n_regionkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM region r
                              WHERE r.r_regionkey = n.n_regionkey)),
           (SELECT COUNT(*) FROM nation n
            WHERE n.n_regionkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM region r
                              WHERE r.r_regionkey = n.n_regionkey)) = 0
           AND (SELECT COUNT(*) FROM nation WHERE n_regionkey IS NULL) = 0
"""


@register("fk_integrity_audit", _FK_ORACLE)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's four FK
    links (orphans + NULL FKs per link, anti-join per link) — the
    post-ingest data-quality gate."""
    t = lambda n: catalog.load_table(spark, n, sf_dir)  # noqa: E731
    return validation.fk_integrity_audit(
        [
            ("orders->customer", t("orders"), "o_custkey", t("customer"), "c_custkey"),
            ("lineitem->orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey"),
            ("lineitem->part", t("lineitem"), "l_partkey", t("part"), "p_partkey"),
            ("nation->region", t("nation"), "n_regionkey", t("region"), "r_regionkey"),
        ]
    )


_DOW_INDEP_ORACLE = """
    WITH cells AS (
      -- Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6
      SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS observed
      FROM events GROUP BY 1, 2
    ),
    rm AS (SELECT event_type, SUM(observed) AS r FROM cells GROUP BY 1),
    cm AS (SELECT dow, SUM(observed) AS c FROM cells GROUP BY 1),
    n AS (SELECT SUM(observed) AS n FROM cells)
    SELECT cells.event_type, CAST(cells.dow AS BIGINT) AS dow, observed,
           ROUND(CAST(r AS DOUBLE) * c / n, 6) AS expected,
           ROUND((observed - CAST(r AS DOUBLE) * c / n)
                 / sqrt(CAST(r AS DOUBLE) * c / n), 6) AS pearson_residual,
           ABS((observed - CAST(r AS DOUBLE) * c / n)
               / sqrt(CAST(r AS DOUBLE) * c / n)) > 2 AS significant
    FROM cells
    JOIN rm ON rm.event_type = cells.event_type
    JOIN cm ON cm.dow = cells.dow
    CROSS JOIN n
"""


@register("event_dow_independence", _DOW_INDEP_ORACLE)
def q_event_dow_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square-style independence audit of event_type × day-of-week:
    observed vs expected-under-independence per cell with Pearson
    residuals (|r| > 2 flags the dependent cells). Margins are exact
    integer aggregates; each residual is a single mirrored double
    expression — no order-sensitive global float sum. The contingency
    grid is |types|×7 rows however big the fact table is."""
    ev = catalog.events(spark, sf_dir)
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count("*").alias("observed"))
    rm = cells.groupBy("event_type").agg(F.sum("observed").alias("r"))
    cm = cells.groupBy("dow").agg(F.sum("observed").alias("c"))
    n = cells.agg(F.sum("observed").alias("n"))
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    resid = (F.col("observed") - e) / F.sqrt(e)
    return (
        cells.join(rm, on="event_type")
        .join(F.broadcast(cm), on="dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "observed",
            F.round(e, 6).alias("expected"),
            F.round(resid, 6).alias("pearson_residual"),
            (F.abs(resid) > 2).alias("significant"),
        )
    )


_SNAPSHOT_DIFF_ORACLE = """
    WITH h AS (
      SELECT o_orderkey,
             substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS c
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN c IN ('0', '1') THEN 'changed'
                ELSE 'removed' END AS change_type
    FROM h WHERE c IN ('0', '1', '2', '3')
    UNION ALL
    SELECT o_orderkey + 10000000000 AS o_orderkey, 'added' AS change_type
    FROM h WHERE c IN ('0', '1')
"""


@register("orders_snapshot_diff", _SNAPSHOT_DIFF_ORACLE)
def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff audit: apply a derived change batch (price bumps
    on the 0/1 md5 bucket, deletes on 2/3, brand-new keys from the
    bump set) through the CDC merge, then diff post vs pre — the
    changed/removed/added classification must reproduce the change
    batch exactly. The diff join moves (key, row-hash), never rows."""
    cols = [c.strip() for c in _CDC_COLS.split(",")]
    base = catalog.load_table(spark, "orders", sf_dir).select(*cols)
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    updates = base.filter(bucket.isin("0", "1")).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(10.0)
    )
    inserts = updates.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10000000000)
    )
    deletes = base.filter(bucket.isin("2", "3"))
    changes = (
        updates.withColumn("op", F.lit("U"))
        .unionByName(inserts.withColumn("op", F.lit("U")))
        .unionByName(deletes.withColumn("op", F.lit("D")))
    )
    merged = cdc.apply_changes(
        base, changes, key_cols=["o_orderkey"], seq_col="o_orderdate"
    )
    return cdc.snapshot_diff(base, merged, key_cols=["o_orderkey"])


_IMPUTE_ORACLE = """
    WITH med AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           COALESCE(e.value, m.med) AS value_imputed,
           e.value IS NULL AS was_imputed
    FROM events e JOIN med m ON m.event_type = e.event_type
"""


@register("imputed_event_values", _IMPUTE_ORACLE)
def q_imputed_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL repair by per-type exact median imputation (discrete
    percentile — an actual data value, no interpolation drift). The
    median table is |event_type| rows and broadcasts; the flag column
    keeps imputed rows auditable downstream."""
    ev = catalog.events(spark, sf_dir)
    med = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
            ).alias("med")
        )
    )
    return ev.join(F.broadcast(med), on="event_type").select(
        "event_id",
        "event_type",
        "value",
        F.coalesce("value", "med").alias("value_imputed"),
        F.col("value").isNull().alias("was_imputed"),
    )


_OOO_ORACLE = """
    WITH arr AS (
      SELECT user_id, ts,
             MAX(ts) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS high_water
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN ts < high_water THEN 1 END) AS n_out_of_order,
           CAST(COALESCE(MAX(CASE WHEN ts < high_water
                 THEN epoch_us(high_water) - epoch_us(ts) END), 0) AS BIGINT)
             AS max_lateness_us
    FROM arr GROUP BY user_id
"""


@register("out_of_order_report", _OOO_ORACLE)
def q_out_of_order_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival audit (event time vs arrival order, with
    event_id as the arrival proxy): per-user disorder counts and the
    worst observed lateness — THE input for sizing streaming
    watermarks (SCALE.md's watermark story quantified). One per-user
    window over a running event-time high-water mark; lateness stays
    in exact integer microseconds."""
    from pyspark.sql.window import Window

    ev = catalog.events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        "user_id",
        "ts",
        F.max("ts").over(w).alias("high_water"),
    )
    late = F.col("ts") < F.col("high_water")
    return arr.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(late, 1)).alias("n_out_of_order"),
        F.coalesce(
            F.max(
                F.when(
                    late,
                    F.unix_micros("high_water") - F.unix_micros("ts"),
                )
            ),
            F.lit(0),
        ).alias("max_lateness_us"),
    )


_HITRATE_ORACLE = """
    WITH p AS (
      SELECT DISTINCT user_id AS u,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item, ts
      FROM events
      WHERE event_type = 'purchase'
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    train AS (SELECT DISTINCT u, item FROM p WHERE ts < TIMESTAMP '2024-01-22'),
    test  AS (SELECT DISTINCT u, item FROM p WHERE ts >= TIMESTAMP '2024-01-22'),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
      FROM train a JOIN train b ON a.u = b.u AND a.item <> b.item
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    top AS (
      SELECT item_a, item_b AS rec FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY item_a ORDER BY n_both DESC, item_b ASC
        ) AS rn FROM pairs
      ) WHERE rn <= 3
    ),
    recs AS (
      SELECT DISTINCT t.u, top.rec
      FROM train t JOIN top ON t.item = top.item_a
    ),
    eval_users AS (
      SELECT DISTINCT u FROM train WHERE u IN (SELECT u FROM test)
    ),
    hits AS (
      SELECT DISTINCT t.u FROM test t
      WHERE EXISTS (SELECT 1 FROM recs r WHERE r.u = t.u AND r.rec = t.item)
    )
    SELECT (SELECT COUNT(*) FROM eval_users) AS n_users_eval,
           (SELECT COUNT(*) FROM hits) AS n_hits,
           ROUND((SELECT COUNT(*) FROM hits)
                 / (SELECT COUNT(*) FROM eval_users), 6) AS hit_rate
"""


@register("cooccurrence_hitrate_eval", _HITRATE_ORACLE)
def q_cooccurrence_hitrate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation: temporal split at Jan 22, top-3
    co-occurrence recs from each user's train basket, hit-rate against
    held-out purchases — the leak-free eval harness, exact ranks, one
    engine-replayable summary row."""
    return analytics.cooccurrence_hitrate(
        catalog.events(spark, sf_dir), cutoff="2024-01-22", top_k=3, min_support=2
    )


_XCORR_ORACLE = """
    WITH daily AS (
      SELECT event_type AS t,
             date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             SUM(CAST(value AS DECIMAL(18,2))) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
    j AS (
      SELECT a.t AS type_a, b.t AS type_b, lags.lag,
             a.y AS ya, b.y AS yb
      FROM daily a
      CROSS JOIN lags
      JOIN daily b ON b.x = a.x + lags.lag AND a.t < b.t
    ),
    s AS (
      SELECT type_a, type_b, lag, COUNT(*) AS n,
             CAST(SUM(ya) AS DOUBLE) AS sx, CAST(SUM(yb) AS DOUBLE) AS sy,
             CAST(SUM(ya * yb) AS DOUBLE) AS sxy,
             CAST(SUM(ya * ya) AS DOUBLE) AS sxx,
             CAST(SUM(yb * yb) AS DOUBLE) AS syy
      FROM j GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN ROUND((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
           END AS xcorr
    FROM s
"""


@register("event_type_lead_lag", _XCORR_ORACLE)
def q_event_type_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between event-type daily revenue
    series (lags −3..+3 days): which signals lead which — the
    time-series dependency scan. Sums stay exact DECIMAL until the
    single closed-form double assembly (the daily_value_trend
    discipline); zero-variance windows yield NULL, never a division
    error. Daily series are tiny regardless of fact volume, so the
    lag self-join is |types·days| rows."""
    ev = catalog.events(spark, sf_dir).filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        F.col("event_type").alias("t"),
        F.datediff(
            F.date_trunc("day", F.col("ts")), F.lit("2024-01-01").cast("date")
        ).alias("x"),
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("y"))
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    a = daily.select(
        F.col("t").alias("type_a"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("t").alias("type_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("xb") == F.col("xa") + F.col("lag"))
            & (F.col("type_a") < F.col("type_b")),
        )
    )
    s = j.groupBy("type_a", "type_b", "lag").agg(
        F.count("*").alias("n"),
        F.sum("ya").cast("double").alias("sx"),
        F.sum("yb").cast("double").alias("sy"),
        F.sum(F.col("ya") * F.col("yb")).cast("double").alias("sxy"),
        F.sum(F.col("ya") * F.col("ya")).cast("double").alias("sxx"),
        F.sum(F.col("yb") * F.col("yb")).cast("double").alias("syy"),
    )
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(d1) * F.sqrt(d2)
    )
    return s.select(
        "type_a",
        "type_b",
        "lag",
        "n",
        F.when((d1 > 0) & (d2 > 0), F.round(corr, 6)).alias("xcorr"),
    )


_REPEAT_ORACLE = """
    WITH p AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type = 'purchase'
    ),
    per_user AS (SELECT user_id, COUNT(*) AS n FROM p GROUP BY user_id),
    gaps AS (
      SELECT date_diff('day', CAST(prev AS DATE), CAST(ts AS DATE)) AS gap_days
      FROM p WHERE prev IS NOT NULL
    )
    SELECT (SELECT COUNT(*) FROM per_user) AS n_buyers,
           (SELECT COUNT(*) FROM per_user WHERE n >= 2) AS n_repeat,
           ROUND((SELECT COUNT(*) FROM per_user WHERE n >= 2)
                 / (SELECT COUNT(*) FROM per_user), 6) AS repeat_rate,
           (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)
            FROM gaps) AS median_gap_days
"""


@register("repeat_purchase_rate", _REPEAT_ORACLE)
def q_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase KPI: share of buyers with ≥2 purchases and the
    exact median day gap between consecutive purchases (discrete
    percentile over per-user lag gaps). One user-keyed window + two
    scalar aggregates; the gap frame is |purchases| − |buyers| rows."""
    from pyspark.sql.window import Window

    p = catalog.events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    lagged = p.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev")
    )
    per_user = lagged.groupBy("user_id").agg(F.count("*").alias("n"))
    buyers = per_user.agg(
        F.count("*").alias("n_buyers"),
        F.count(F.when(F.col("n") >= 2, 1)).alias("n_repeat"),
    )
    gaps = lagged.filter(F.col("prev").isNotNull()).select(
        F.datediff(F.col("ts").cast("date"), F.col("prev").cast("date")).alias(
            "gap_days"
        )
    )
    med = gaps.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)").alias(
            "median_gap_days"
        )
    )
    return buyers.crossJoin(F.broadcast(med)).select(
        "n_buyers",
        "n_repeat",
        F.round(F.col("n_repeat") / F.col("n_buyers"), 6).alias("repeat_rate"),
        F.col("median_gap_days").cast("long").alias("median_gap_days"),
    )


_HHI_ORACLE = """
    WITH cb AS (
      SELECT o.o_custkey AS c_custkey, p.p_brand, COUNT(*) AS c
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    )
    SELECT c_custkey,
           CAST(SUM(c) AS BIGINT) AS n_items,
           COUNT(*) AS n_brands,
           CAST(SUM(c * c) * 1000000 // (SUM(c) * SUM(c)) AS BIGINT)
             AS hhi_micros
    FROM cb GROUP BY c_custkey
"""


@register("customer_brand_concentration", _HHI_ORACLE)
def q_customer_brand_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer brand concentration as an exact integer-micro
    Herfindahl index: (Σ c_b²)·10⁶ div (Σ c_b)² over the customer's
    per-brand item counts — 10⁶ = single-brand loyalist, 10⁶/k = even
    spread over k brands. Pure integer arithmetic end to end, so the
    index is aggregation-order-free and engine-exact."""
    orders = catalog.load_table(spark, "orders", sf_dir)
    li = catalog.load_table(spark, "lineitem", sf_dir)
    part = catalog.load_dim(spark, "part", sf_dir)
    cb = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("o_custkey").alias("c_custkey"), "p_brand")
        .agg(F.count("*").alias("c"))
    )
    return cb.groupBy("c_custkey").agg(
        F.sum("c").alias("n_items"),
        F.count("*").alias("n_brands"),
        F.expr("(SUM(c * c) * 1000000) div (SUM(c) * SUM(c))").alias(
            "hhi_micros"
        ),
    )


_NEW_RETURNING_ORACLE = """
    WITH p AS (
      SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS v,
             CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    first AS (
      SELECT user_id, CAST(CAST(MIN(ts) AS DATE) AS TIMESTAMP) AS first_day
      FROM p GROUP BY user_id
    )
    SELECT p.day,
           COUNT(CASE WHEN p.day = f.first_day THEN 1 END) AS n_new_purchases,
           COUNT(CASE WHEN p.day <> f.first_day THEN 1 END)
             AS n_returning_purchases,
           CAST(COALESCE(SUM(CASE WHEN p.day = f.first_day THEN v END), 0)
                AS DOUBLE) AS new_revenue,
           CAST(COALESCE(SUM(CASE WHEN p.day <> f.first_day THEN v END), 0)
                AS DOUBLE) AS returning_revenue
    FROM p JOIN first f USING (user_id)
    GROUP BY p.day
"""


@register("daily_new_vs_returning", _NEW_RETURNING_ORACLE)
def q_daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue split between first-day and returning buyers
    (acquisition vs retention): a purchase is 'new' iff it lands on
    its user's first purchase day. First-day is a ``min(ts) OVER
    (PARTITION BY user_id)`` window — the SAME user-keyed exchange the
    agg+join-back form needs, but exactly once and with no join; the
    day rollup then re-shuffles on day. Exact DECIMAL sums."""
    from pyspark.sql import Window

    ev = catalog.events(spark, sf_dir)
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    w = Window.partitionBy("user_id")
    p = p.withColumn("first_day", F.date_trunc("day", F.min("ts").over(w)))
    is_new = F.col("day") == F.col("first_day")
    return (
        p.groupBy("day")
        .agg(
            F.count(F.when(is_new, 1)).alias("n_new_purchases"),
            F.count(F.when(~is_new, 1)).alias("n_returning_purchases"),
            F.coalesce(F.sum(F.when(is_new, F.col("v"))), F.lit(0))
            .cast("double")
            .alias("new_revenue"),
            F.coalesce(F.sum(F.when(~is_new, F.col("v"))), F.lit(0))
            .cast("double")
            .alias("returning_revenue"),
        )
    )


@register(
    "item_jaccard_topk",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    cnt AS (SELECT p, COUNT(*) AS c FROM op GROUP BY p),
    inter AS (
      SELECT a.p AS pa, b.p AS pb, COUNT(*) AS i
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT pa, pb, i AS n_common,
           CAST(i * 1000000 // (ca.c + cb.c - i) AS BIGINT) AS jaccard_micros
    FROM inter JOIN cnt ca ON ca.p = pa JOIN cnt cb ON cb.p = pb
    ORDER BY jaccard_micros DESC, pa ASC, pb ASC
    LIMIT 25
    """,
)
def q_item_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-purchase similarity: top-25 part pairs by EXACT
    Jaccard over their order sets (|A∩B| / |A∪B| as integer micros) —
    the classic "bought together" candidate generator.

    Scale shape: the pair blow-up is the per-order self-join, bounded
    by (items per order)² — never |parts|²; the per-part counts join
    is part-keyed (broadcastable at dimension tiers); the top-25
    fuses to TakeOrderedAndProject. For catalogs with pathological
    baskets, cap basket size upstream (the standard market-basket
    guard)."""
    from streaming_ecom_analytics_spark.caching import persist_tracked

    li = catalog.load_table(spark, "lineitem", sf_dir)
    # op feeds the per-part counts AND both sides of the per-order
    # self-join; unpersisted, the lineitem scan + distinct shuffle runs
    # three times per query (round-11). Two narrow long columns/row.
    op = persist_tracked(
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
    )
    cnt = op.groupBy("p").agg(F.count("*").alias("c"))
    a = op.select(F.col("o"), F.col("p").alias("pa"))
    b = op.select(F.col("o"), F.col("p").alias("pb"))
    inter = (
        a.join(b, on="o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_common"))
    )
    j = (
        inter.join(cnt.select(F.col("p").alias("pa"), F.col("c").alias("ca")), on="pa")
        .join(cnt.select(F.col("p").alias("pb"), F.col("c").alias("cb")), on="pb")
        .select(
            "pa",
            "pb",
            "n_common",
            F.expr("n_common * 1000000 div (ca + cb - n_common)")
            .cast("long")
            .alias("jaccard_micros"),
        )
    )
    return j.orderBy(
        F.desc("jaccard_micros"), F.asc("pa"), F.asc("pb")
    ).limit(25)


_PARETO_ORACLE = """
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
                   COUNT(*) AS n_customers FROM cr),
    c AS (
      SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cr
    )
    SELECT MAX(n_customers) AS n_customers,
           CAST((SELECT COUNT(*) FROM c CROSS JOIN tot
                 WHERE 5 * (cum - cents) < 4 * t) AS BIGINT)
             AS n_customers_80pct,
           CAST((SELECT MAX(cents) * 1000000 // MAX(t)
                 FROM cr CROSS JOIN tot) AS BIGINT) AS top1_share_ppm
    FROM tot
    """


@register("revenue_pareto", _PARETO_ORACLE)
def q_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration audit: how many customers (ranked by
    lifetime order revenue) cover 80% of total revenue, plus the top
    customer's revenue share — the 80/20 readout behind tiering and
    skew decisions. A customer counts toward the 80% cohort iff the
    revenue BEFORE them hasn't crossed the threshold (the cohort
    includes the boundary-crossing customer — standard Pareto-count
    semantics). Money is exact integer CENTS end to end; the 80%
    comparison is the cross-multiplied integer inequality
    5·(cum−rev) < 4·total and the share is floored integer ppm —
    zero float anywhere. The running sum orders the per-customer
    AGGREGATE (|customers| rows), never raw orders; that aggregate is
    persisted so the three readouts (total, cohort, top share) scan
    orders ONCE (plan-asserted)."""
    from pyspark.sql import Window as W

    from streaming_ecom_analytics_spark.caching import persist_tracked

    orders = catalog.load_table(spark, "orders", sf_dir)
    cr = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents")
    )
    cr = persist_tracked(cr)
    tot = cr.agg(
        F.sum("cents").cast("long").alias("t"),
        F.count("*").alias("n_customers"),
    )
    w = W.orderBy(F.desc("cents"), F.asc("o_custkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = cr.withColumn("cum", F.sum("cents").over(w))
    cohort = (
        c.crossJoin(F.broadcast(tot))
        .filter(
            F.lit(5) * (F.col("cum") - F.col("cents")) < F.lit(4) * F.col("t")
        )
        .agg(F.count("*").cast("long").alias("n_customers_80pct"))
    )
    top_share = cr.crossJoin(F.broadcast(tot)).agg(
        F.expr("max(cents) * 1000000 div max(t)")
        .cast("long")
        .alias("top1_share_ppm")
    )
    return (
        tot.select("n_customers")
        .crossJoin(F.broadcast(cohort))
        .crossJoin(F.broadcast(top_share))
    )


@register("revenue_pareto_scaled", _PARETO_ORACLE)
def q_revenue_pareto_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME Pareto readout as revenue_pareto (identical oracle —
    the two must hash-match each other through DuckDB), but the global
    running sum comes from operators/prefix.running_total: a
    range-partitioned distributed sort + per-partition offsets instead
    of the single-partition ORDER-BY window. revenue_pareto's window
    over |customers| rows is fine into the millions; this is the
    10⁸-customer plan — the only single-partition stage left is the
    |partitions|-row offset frame, which is bounded by cluster config,
    not data. Exact integer cents end to end, so the two plans are
    bit-identical by construction."""
    from streaming_ecom_analytics_spark.caching import persist_tracked
    from streaming_ecom_analytics_spark.operators.prefix import running_total

    orders = catalog.load_table(spark, "orders", sf_dir)
    cr = persist_tracked(
        orders.groupBy("o_custkey").agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents")
        )
    )
    tot = cr.agg(
        F.sum("cents").cast("long").alias("t"),
        F.count("*").alias("n_customers"),
    )
    c = running_total(
        cr,
        order_cols=[F.desc("cents"), F.asc("o_custkey")],
        value_col="cents",
        out_col="cum",
    )
    cohort = (
        c.crossJoin(F.broadcast(tot))
        .filter(
            F.lit(5) * (F.col("cum") - F.col("cents")) < F.lit(4) * F.col("t")
        )
        .agg(F.count("*").cast("long").alias("n_customers_80pct"))
    )
    top_share = cr.crossJoin(F.broadcast(tot)).agg(
        F.expr("max(cents) * 1000000 div max(t)")
        .cast("long")
        .alias("top1_share_ppm")
    )
    return (
        tot.select("n_customers")
        .crossJoin(F.broadcast(cohort))
        .crossJoin(F.broadcast(top_share))
    )


@register(
    "customer_spend_rank_profile",
    """
    WITH spend AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    )
    SELECT c_nationkey, o_custkey AS c_custkey, cents,
           FLOOR(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0
             AS spend_pct_rank,
           FLOOR(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0
             AS spend_cume_dist,
           CAST(ntile(10) OVER w AS BIGINT) AS spend_decile
    FROM spend
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY cents DESC, o_custkey ASC)
    """,
)
def q_customer_spend_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer spend ranking profile — the rank-family
    window functions (percent_rank / cume_dist / ntile) that tiering
    and marketing-segment exports read. Partitioned by nation, so the
    rank windows parallelize across partitions (no global sort); the
    ORDER BY carries a custkey tiebreak so ntile is a total order and
    the output is deterministic on both engines. Spend is exact
    integer cents through DECIMAL(18,2).

    The 6-dp quantization is FLOOR(x·10⁶ + 0.5)/10⁶ on BOTH engines
    (round 12, pre-existing sf0.1 mismatch inherited from r11): k/n
    rank fractions can land exactly on a 7-digit decimal midpoint
    (nation 11 at sf0.1 has 640 customers — 323/640 = 0.5046875), and
    there ROUND diverges across engines: Spark's Round canonicalizes
    the double through its shortest decimal repr then HALF_UP
    (→ .504688) while DuckDB rounds the raw binary (→ .504687). The
    floor formula is the same IEEE ops on the same double on both
    sides — bit-identical everywhere, equal to the old output on every
    non-midpoint row (sf0.001/sf0.01 hashes unchanged)."""
    from pyspark.sql import Window as W

    orders = catalog.load_table(spark, "orders", sf_dir)
    cust = catalog.load_dim(spark, "customer", sf_dir)
    spend = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(F.desc("cents"), F.asc("o_custkey"))

    def _q6(col):
        return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return spend.select(
        "c_nationkey",
        F.col("o_custkey").alias("c_custkey"),
        "cents",
        _q6(F.percent_rank().over(w)).alias("spend_pct_rank"),
        _q6(F.cume_dist().over(w)).alias("spend_cume_dist"),
        F.ntile(10).over(w).cast("long").alias("spend_decile"),
    )


@register(
    "revenue_forecast_baseline",
    """
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    f AS (
      SELECT day, cents,
             CAST(SUM(cents) OVER w // COUNT(*) OVER w AS BIGINT) AS forecast_cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_hist
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, cents, forecast_cents,
           ABS(cents - forecast_cents) AS abs_err_cents
    FROM f WHERE n_hist = 7
    """,
)
def q_revenue_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day moving-average revenue forecast with per-day
    absolute error — the naive baseline every real forecaster must
    beat, and the backbone of a forecast-eval harness. Only days with
    a full 7-day history are scored (no cold-start noise). Money is
    exact integer cents; the forecast is integer-floor mean, so the
    error column is integer-exact on both engines. One day-grain
    aggregate, one ordered window over |days| rows."""
    from pyspark.sql import Window as W

    ev = catalog.events(spark, sf_dir)
    d = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * F.lit(100)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = W.orderBy("day").rowsBetween(-7, -1)
    f = d.select(
        "day",
        "cents",
        F.expr(
            "sum(cents) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)"
            " div "
            "count(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)"
        ).cast("long").alias("forecast_cents"),
        F.count("*").over(w).cast("long").alias("n_hist"),
    )
    return f.filter(F.col("n_hist") == 7).select(
        "day",
        "cents",
        "forecast_cents",
        F.abs(F.col("cents") - F.col("forecast_cents")).alias("abs_err_cents"),
    )


@register(
    "weekly_revenue_wow",
    """
    WITH wk AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    )
    SELECT week, cents,
           lag(cents) OVER (ORDER BY week) AS prev_cents,
           CAST((cents - lag(cents) OVER (ORDER BY week)) * 1000000
                // lag(cents) OVER (ORDER BY week) AS BIGINT) AS wow_growth_ppm
    FROM wk
    """,
)
def q_weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth in exact integer ppm (floored
    rational of integer cents) — the trend tile next to the daily
    revenue dashboard. NULL growth on the first week, by definition.
    One week-grain aggregate + one lag over |weeks| rows."""
    from pyspark.sql import Window as W

    ev = catalog.events(spark, sf_dir)
    wk = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * F.lit(100)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = W.orderBy("week")
    prev = F.lag("cents").over(w)
    return wk.select(
        "week",
        "cents",
        prev.alias("prev_cents"),
        F.expr(
            "(cents - lag(cents) OVER (ORDER BY week)) * 1000000 "
            "div lag(cents) OVER (ORDER BY week)"
        ).cast("long").alias("wow_growth_ppm"),
    )


@register(
    "revenue_forecast_anomalies",
    """
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1
    ),
    f AS (
      SELECT day, cents,
             CAST(SUM(cents) OVER w // COUNT(*) OVER w AS BIGINT)
               AS forecast_cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_hist
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    e AS (
      SELECT day, cents, forecast_cents,
             cents - forecast_cents AS err_cents
      FROM f WHERE n_hist = 7
    ),
    med AS (
      SELECT CAST(quantile_disc(err_cents, 0.5) AS BIGINT) AS m FROM e
    ),
    mad AS (
      SELECT CAST(quantile_disc(abs(err_cents - m), 0.5) AS BIGINT) AS mad
      FROM e CROSS JOIN med
    )
    SELECT e.day, e.cents, e.forecast_cents, e.err_cents,
           abs(e.err_cents - m) > 3 * mad AS is_anomaly
    FROM e CROSS JOIN med CROSS JOIN mad
    """,
)
def q_revenue_forecast_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-residual anomaly labeling: days whose error against
    the trailing-7-day baseline deviates from the median error by more
    than 3 exact MADs — the robust (outlier-immune) gate that a naive
    3-sigma rule gets wrong on heavy-tailed revenue. Everything is
    integer cents: discrete-percentile medians are actual data values,
    so the MAD gate is bit-identical across engines. The median/MAD
    scalars broadcast back over the |days| frame."""
    from pyspark.sql import Window as W

    ev = catalog.events(spark, sf_dir)
    d = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * F.lit(100)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = W.orderBy("day").rowsBetween(-7, -1)
    f = d.select(
        "day",
        "cents",
        F.expr(
            "sum(cents) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)"
            " div "
            "count(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)"
        ).cast("long").alias("forecast_cents"),
        F.count("*").over(w).cast("long").alias("n_hist"),
    )
    e = f.filter(F.col("n_hist") == 7).select(
        "day",
        "cents",
        "forecast_cents",
        (F.col("cents") - F.col("forecast_cents")).alias("err_cents"),
    )
    med = e.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY err_cents)")
        .cast("long")
        .alias("m")
    )
    mad = (
        e.crossJoin(F.broadcast(med))
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(err_cents - m))"
            )
            .cast("long")
            .alias("mad")
        )
    )
    return (
        e.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "day",
            "cents",
            "forecast_cents",
            "err_cents",
            (
                F.abs(F.col("err_cents") - F.col("m")) > F.lit(3) * F.col("mad")
            ).alias("is_anomaly"),
        )
    )


@register(
    "retention_day_n",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    f AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS first_day
      FROM ud
    ),
    tot AS (SELECT COUNT(DISTINCT user_id) AS cohort FROM ud)
    SELECT CAST(day - first_day AS BIGINT) AS day_n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_retained,
           CAST(MAX(cohort) AS BIGINT) AS cohort_size,
           CAST(COUNT(DISTINCT user_id) * 1000000 // MAX(cohort) AS BIGINT)
             AS retention_ppm
    FROM f CROSS JOIN tot
    WHERE day - first_day BETWEEN 0 AND 7
    GROUP BY 1
    """,
)
def q_retention_day_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention curve: of all users ever seen, what fraction is
    active exactly N days after their OWN first day (N = 0..7) — the
    product-health readout next to the cohort matrix, but anchored
    per-user rather than per-calendar-cohort. The per-user first day
    is a min-over-window on the DISTINCT (user, day) frame (one
    user-keyed exchange, |user·days| rows, never raw events); rates
    are exact floored ppm."""
    from pyspark.sql import Window as W

    from streaming_ecom_analytics_spark.caching import persist_tracked

    ev = catalog.events(spark, sf_dir)
    ud = persist_tracked(
        ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    f = ud.withColumn(
        "first_day", F.min("day").over(W.partitionBy("user_id"))
    ).withColumn("day_n", F.datediff("day", "first_day"))
    tot = ud.agg(F.countDistinct("user_id").alias("cohort"))
    return (
        f.filter(F.col("day_n").between(0, 7))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("day_n").cast("long").alias("day_n"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_retained"),
            F.max("cohort").cast("long").alias("cohort_size"),
            F.expr("count(DISTINCT user_id) * 1000000 div max(cohort)")
            .cast("long")
            .alias("retention_ppm"),
        )
    )


@register(
    "discount_banded_demand",
    """
    SELECT CAST(FLOOR(l_discount * 100) AS BIGINT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000000 // COUNT(*)
                AS BIGINT) AS qty_per_line_micros,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT)) // 100)
                AS BIGINT) AS net_revenue_cents
    FROM lineitem
    GROUP BY 1
    """,
)
def q_discount_banded_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand by discount band (whole percentage points): line counts,
    total quantity, exact mean quantity per line (floored micros), and
    net revenue — the table a pricing analyst reads before claiming
    discounts move volume. One scan, one hash aggregate on an
    11-value key. Net revenue is pure integer arithmetic:
    price_cents · (100 − discount_pct) div 100 — floored to the cent
    per line, so no engine's DECIMAL half-rounding rule (half-up vs
    half-even at .xx5 boundaries) can leak into the totals."""
    li = catalog.load_table(spark, "lineitem", sf_dir)
    return li.groupBy(
        F.floor(F.col("l_discount") * F.lit(100)).cast("long").alias(
            "discount_pct"
        )
    ).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
        F.expr("sum(cast(l_quantity as bigint)) * 1000000 div count(*)")
        .cast("long")
        .alias("qty_per_line_micros"),
        F.sum(
            F.expr(
                "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
                " * (100 - cast(floor(l_discount * 100) as bigint)) div 100"
            )
        )
        .cast("long")
        .alias("net_revenue_cents"),
    )


@register(
    "basket_size_distribution",
    """
    WITH b AS (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(n_items AS BIGINT) AS basket_size,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY n_items
    """,
)
def q_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order basket-size histogram — the market-basket sanity check
    behind every co-purchase join's cost model (the pair blow-up is
    quadratic in THIS distribution's tail). Two hash aggregates,
    second over |distinct sizes| rows."""
    li = catalog.load_table(spark, "lineitem", sf_dir)
    b = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    return b.groupBy(F.col("n_items").cast("long").alias("basket_size")).agg(
        F.count("*").cast("long").alias("n_orders")
    )


@register(
    "brand_price_quantity_corr",
    """
    WITH x AS (
      SELECT p.p_brand,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
      SELECT p_brand,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(q) AS DOUBLE) AS sx,
             CAST(SUM(c) AS DOUBLE) AS sy,
             CAST(SUM(q * c) AS DOUBLE) AS sxy,
             CAST(SUM(q * q) AS DOUBLE) AS sxx,
             CAST(SUM(c * c) AS DOUBLE) AS syy,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM x GROUP BY p_brand
    )
    SELECT p_brand, n_lines,
           CASE WHEN (n * sxx - sx * sx) <= 0 OR (n * syy - sy * sy) <= 0
                THEN NULL
                ELSE ROUND((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx)
                              * sqrt(n * syy - sy * sy)), 6)
           END AS corr_qty_price
    FROM s
    """,
)
def q_brand_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between line quantity and line
    price, the distributed-safe way: ONE hash aggregate collects the
    moment sums over EXACT integers (quantity, DECIMAL-derived price
    cents; the squared-cents sum runs through DuckDB's int128 /
    Spark's decimal accumulator, so nothing overflows or drifts), and
    only the final closed form runs in doubles — identical IEEE ops on
    identical inputs on both engines, so the rounded correlation is
    deterministic and aggregation-order-free, unlike a naive corr()
    over double partials. NULL on zero variance. One fact scan, part
    broadcast, |brands| output rows."""
    li = catalog.load_table(spark, "lineitem", sf_dir)
    part = catalog.load_dim(spark, "part", sf_dir)
    x = li.join(part, F.col("p_partkey") == F.col("l_partkey")).select(
        "p_brand",
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * F.lit(100))
        .cast("long")
        .alias("c"),
    )
    dec = "decimal(38,0)"
    s = x.groupBy("p_brand").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("q").cast("double").alias("sx"),
        F.sum("c").cast("double").alias("sy"),
        F.sum((F.col("q") * F.col("c")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("q") * F.col("q")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("c") * F.col("c")).cast(dec)).cast("double").alias("syy"),
        F.count("*").cast("long").alias("n_lines"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "p_brand",
        "n_lines",
        F.when((vx <= 0) | (vy <= 0), F.lit(None))
        .otherwise(F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6))
        .alias("corr_qty_price"),
    )


@register(
    "event_transition_matrix",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM s WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_ppm
    FROM t
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), exact floored ppm — the
    behavioral fingerprint behind session simulation and bot
    detection. One user-keyed exchange for the lead window (ts +
    event_id total order), one hash aggregate on the |types|² key,
    then the row-normalization window runs on the tiny matrix itself."""
    from pyspark.sql import Window as W

    ev = catalog.events(spark, sf_dir)
    s = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    t = (
        s.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wrow = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.expr(
            "n * 1000000 div sum(n) OVER (PARTITION BY from_type)"
        ).cast("long").alias("p_ppm"),
    )


_CUPED_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                     AND ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END),
                  0) AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                     AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END),
                  0) AS BIGINT) AS y,
             CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
      FROM u
    ),
    v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS vx, CAST(SUM(y) AS BIGINT) AS vy
      FROM u GROUP BY variant
    )
    SELECT variant, n_users,
           ROUND(CAST(vy AS DOUBLE) / n_users, 6) AS mean_post_cents,
           ROUND(CAST(vx AS DOUBLE) / n_users, 6) AS mean_pre_cents,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
           ROUND(CAST(vy AS DOUBLE) / n_users
                 - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                   * (CAST(vx AS DOUBLE) / n_users - sx / n), 6)
             AS adjusted_mean_cents
    FROM v CROSS JOIN pooled
    ORDER BY variant
"""


@register("cuped_adjusted_ab", _CUPED_ORACLE)
def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013):
    per-user purchase cents split into a pre-period covariate (days
    1-15) and the experiment metric (days 16-30), a deterministic md5
    coin assigns variants, pooled theta = cov(x,y)/var(x) comes from
    EXACT integer moment sums (cents and cents² in HUGEINT/DECIMAL),
    and each variant's adjusted mean uses the closed form
    mean_y_v − θ·(mean_x_v − mean_x) — identical IEEE doubles on
    identical integers, so the rounded readout is engine-exact. One
    user-grain aggregate, one broadcast scalar of the pooled moments,
    |variants| output rows."""
    from streaming_ecom_analytics_spark.caching import persist_tracked

    ev = catalog.events(spark, sf_dir)
    cents = F.when(
        F.col("event_type") == "purchase",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
    )
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    # user-grain frame feeds BOTH the pooled moments and the variant
    # rollup — persist so events scans once, not twice
    u = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cut, cents)), F.lit(0))
        .cast("long")
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cut, cents)), F.lit(0))
        .cast("long")
        .alias("y"),
    ).withColumn(
        "variant",
        F.when(
            F.ascii(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)) % 2
            == 0,
            F.lit("A"),
        ).otherwise(F.lit("B")),
    )
    u = persist_tracked(u)
    dec = "decimal(38,0)"
    pooled = u.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("y"))).cast("double").alias("sxy"),
        F.sum((F.col("x").cast(dec) * F.col("x"))).cast("double").alias("sxx"),
    )
    v = u.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("vx"),
        F.sum("y").cast("long").alias("vy"),
    )
    theta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    mean_y = F.col("vy").cast("double") / F.col("n_users")
    mean_x = F.col("vx").cast("double") / F.col("n_users")
    return (
        v.crossJoin(F.broadcast(pooled))
        .select(
            "variant",
            "n_users",
            F.round(mean_y, 6).alias("mean_post_cents"),
            F.round(mean_x, 6).alias("mean_pre_cents"),
            F.round(theta, 6).alias("theta"),
            F.round(
                mean_y - theta * (mean_x - F.col("sx") / F.col("n")), 6
            ).alias("adjusted_mean_cents"),
        )
        .orderBy("variant")
    )


_CUSUM_ORACLE = """
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    m AS (SELECT COUNT(*) AS n, SUM(cents) AS tot FROM d),
    p AS (
      SELECT day, cents,
             SUM(CAST(n AS HUGEINT) * cents - tot)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pref
      FROM d CROSS JOIN m
    ),
    s AS (
      SELECT day, cents, pref,
             MIN(pref) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS lo,
             MAX(pref) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS hi
      FROM p
    )
    SELECT day, cents,
           CAST(pref - LEAST(lo, 0) AS BIGINT) AS cusum_up_scaled,
           CAST(GREATEST(hi, 0) - pref AS BIGINT) AS cusum_down_scaled,
           5 * CAST(GREATEST(pref - LEAST(lo, 0), GREATEST(hi, 0) - pref)
                    AS HUGEINT)
             > (SELECT tot FROM m) AS drift
    FROM s ORDER BY day
"""


@register("revenue_cusum_drift", _CUSUM_ORACLE)
def q_revenue_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detection over the daily-revenue series,
    integer-exact end to end: deviations are scaled by the day count
    (D_t = n·x_t − Σx, an integer) so the reference mean never becomes
    a float; the classic recursive CUSUM S_t = max(0, S_{t-1} + D_t)
    is rewritten as the prefix identity S_t = P_t − min(0, min_{j≤t} P_j)
    (and its mirror for downward drift) — the min/max is clamped to
    zero because the recursion's implicit anchor is P_0 = 0, so a
    series that starts above the mean (prefix never dips negative)
    still accumulates drift from day one. Two window functions over
    the tiny day spine instead of an unexpressible recursion. The
    drift flag fires when either side exceeds 5·Σx (i.e. sustained
    deviation worth ~5 average days). Day-spine windows are a
    |days|-row single partition by design — the series is aggregated
    first."""
    ev = catalog.events(spark, sf_dir)
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    from streaming_ecom_analytics_spark.caching import persist_tracked

    d = persist_tracked(d)  # day spine feeds the scalar and the windows
    m = d.agg(
        F.count("*").alias("n"), F.sum("cents").alias("tot")
    )
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    pref_w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    p = d.crossJoin(F.broadcast(m)).withColumn(
        "pref",
        F.sum(
            (F.col("n").cast(dec) * F.col("cents") - F.col("tot")).cast(dec)
        ).over(pref_w),
    )
    s = p.withColumn("lo", F.min("pref").over(pref_w)).withColumn(
        "hi", F.max("pref").over(pref_w)
    )
    zero = F.lit(0).cast(dec)
    up = F.col("pref") - F.least(F.col("lo"), zero)
    down = F.greatest(F.col("hi"), zero) - F.col("pref")
    return s.select(
        "day",
        "cents",
        up.cast("long").alias("cusum_up_scaled"),
        down.cast("long").alias("cusum_down_scaled"),
        (
            F.lit(5).cast(dec) * F.greatest(up, down)
            > F.col("tot").cast(dec)
        ).alias("drift"),
    ).orderBy("day")
