"""Distributed prefix aggregation: exact equality with the
single-partition window definition under forced multi-partition
execution."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from streaming_ecom_analytics_spark.operators.prefix import running_total


def _reference(rows, key=lambda r: (-r[1], r[0])):
    out = {}
    acc = 0
    for rid, v in sorted(rows, key=key):
        acc += v
        out[rid] = acc
    return out


def test_running_total_equals_global_window(spark):
    rng = random.Random(11)
    rows = [(i, rng.randint(0, 10_000)) for i in range(5_000)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = running_total(
        df,
        order_cols=[F.desc("v"), F.asc("id")],
        value_col="v",
        out_col="cum",
        num_partitions=13,
    )
    expect = _reference(rows)
    res = {r.id: r.cum for r in got.collect()}
    assert res == expect


def test_running_total_ties_need_total_order(spark):
    """Heavy ties: the tiebreak column makes the order total, so the
    prefix is still deterministic and equal to the reference."""
    rows = [(i, 7) for i in range(200)] + [(1000 + i, 7) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(9)
    got = {
        r.id: r.cum
        for r in running_total(
            df,
            order_cols=[F.desc("v"), F.asc("id")],
            value_col="v",
            out_col="cum",
            num_partitions=7,
        ).collect()
    }
    assert got == _reference(rows)


def test_running_total_single_row_and_empty(spark):
    df1 = spark.createDataFrame([(1, 5)], "id long, v long")
    out1 = running_total(
        df1, order_cols=[F.asc("id")], value_col="v", out_col="cum"
    ).collect()
    assert [(r.id, r.cum) for r in out1] == [(1, 5)]
    df0 = spark.createDataFrame([], "id long, v long")
    assert (
        running_total(
            df0, order_cols=[F.asc("id")], value_col="v", out_col="cum"
        ).count()
        == 0
    )


def test_running_total_no_data_scaled_single_partition_stage(spark):
    """The plan property the operator exists for: the only
    single-partition exchange feeds the |partitions|-row offset frame
    (after the per-partition AGGREGATE), never the data-scaled rows —
    the main frame moves through a rangepartitioning exchange and a
    __pid-keyed window."""
    df = spark.createDataFrame([(i, i) for i in range(100)], "id long, v long")
    out = running_total(
        df, order_cols=[F.desc("v"), F.asc("id")], value_col="v", out_col="cum",
        num_partitions=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
    assert "hashpartitioning(__pid" in plan
    # every SinglePartition exchange must sit above a HashAggregate
    # (the per-partition totals), not above raw data
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i + 1 : i + 4])
            assert "HashAggregate" in below or "InMemoryTableScan" in below, ln
