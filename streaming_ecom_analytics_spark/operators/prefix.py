"""Distributed exact prefix aggregation (running totals over a total
order) — the scale-out replacement for ``Window.orderBy(...)`` with no
partition key, which funnels the ENTIRE frame through one reducer.

Spark has no range-partitioned window implementation, so a global
cumulative sum over a 10⁸-row frame (customer Pareto curves, skyline
sweeps, global rank features) single-threads at exactly the moment the
data is biggest. This operator is the classic two-pass fix:

1. range-repartition by the total order and sort within partitions —
   a DISTRIBUTED sort (the same machinery as ``orderBy``);
2. per-partition totals (tiny frame: one row per partition), turned
   into exclusive per-partition offsets by a window over that
   bounded frame (single-partition, but |partitions| rows — bounded
   by cluster config, not data);
3. per-partition running sums via a window PARTITIONED by the range
   partition id, plus the broadcast offset.

The result is bit-identical to the single-partition window whenever
(a) the order is TOTAL (callers must include a tiebreak column) and
(b) the value type is exact (integer/decimal) — float addition would
re-associate across partition boundaries.

The ranged frame is persisted for the duration of the plan: the
partition totals and the main pass must observe the SAME partition
assignment (range bounds come from sampling; recomputing the subtree
for each consumer could legally re-sample). The cache is the price of
the two-pass algorithm — at cluster scale it spills to disk like any
sort run would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.caching import persist_tracked


def running_total(
    df: DataFrame,
    *,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` over the total order
    ``order_cols`` (pass ``F.desc(...)``/``F.asc(...)`` expressions,
    including a tiebreak that makes the order total), computed without
    any data-scaled single-partition stage.
    """
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = persist_tracked(
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__ptot"))
    # exclusive prefix of the per-partition totals: |partitions| rows —
    # bounded by cluster config, so this single-partition window is the
    # legitimate kind
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__ptot").over(off_w), F.lit(0)).alias("__off"),
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offsets), on="__pid")
        .withColumn(out_col, F.col("__off") + F.sum(value_col).over(local_w))
        .drop("__pid", "__off")
    )


def global_rank(
    df: DataFrame,
    *,
    order_cols: list[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global ROW_NUMBER over the total order
    ``order_cols`` — the distributed zipWithIndex every ordered export
    needs (curriculum schedules, deterministic shard assignment, global
    percentile cuts), without funnelling the corpus through the
    single-reducer ``Window.orderBy(...)``.

    It is the rank specialization of :func:`running_total`: with the
    summand ≡ 1 the inclusive prefix sum IS the row number, so the
    shape (range-repartition + per-partition window + a bounded
    |partitions|-row offset pass) and the bit-identical-to-the-global-
    window guarantee carry over unchanged. The order MUST be total —
    callers include a unique tiebreak column (range partition
    boundaries come from sampling, so rows tied on a non-total order
    could legally land on either side of a boundary and swap ranks).
    """
    return running_total(
        df.withColumn("__one", F.lit(1).cast("long")),
        order_cols=order_cols,
        value_col="__one",
        out_col=out_col,
        num_partitions=num_partitions,
    ).drop("__one")
