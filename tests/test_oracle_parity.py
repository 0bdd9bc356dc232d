"""Mirror of the driver's correctness gate: every registry query with an
oracle runs on Spark and DuckDB at sf0.001 and must match exactly
(row count + columns + values, order-insensitive)."""

from __future__ import annotations

import pytest

from streaming_ecom_analytics_spark.plans import REGISTRY

from .conftest import SF_DIR, assert_frames_match


def _oracle_names():
    return [n for n, rq in REGISTRY.items() if rq.oracle is not None]


def _rows_only_names():
    return [n for n, rq in REGISTRY.items() if rq.oracle is None]


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, oracle, name):
    rq = REGISTRY[name]
    spark_pdf = rq.fn(spark, SF_DIR).toPandas()
    oracle_pdf = oracle.sql(rq.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_queries_run(spark, name):
    rq = REGISTRY[name]
    df = rq.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
