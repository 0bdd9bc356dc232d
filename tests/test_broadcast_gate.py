"""Size-gated broadcast hints (catalog.dim_hint / load_dim).

The 100 TB contract: a forced F.broadcast() on an SF-scaled table
(customer/part/supplier) overrides AQE's runtime size check and OOMs
executors once the table outgrows memory. The gate keeps the hint only
while the table's on-disk footprint provably fits the session broadcast
threshold; above that the frame is un-hinted and AQE picks the join
strategy from runtime sizes. These tests pin both sides of the gate and
that the gate never changes results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark import catalog
from streaming_ecom_analytics_spark.plans import REGISTRY

from .conftest import SF_DIR

_THRESHOLD_KEY = "spark.sql.autoBroadcastJoinThreshold"


def _hint_count(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def _has_broadcast_hint(df) -> bool:
    return _hint_count(df) > 0


def _with_threshold(spark, value):
    class _Ctx:
        def __enter__(self):
            self.saved = spark.conf.get(_THRESHOLD_KEY)
            spark.conf.set(_THRESHOLD_KEY, value)

        def __exit__(self, *exc):
            spark.conf.set(_THRESHOLD_KEY, self.saved)

    return _Ctx()


def test_scaled_dim_hinted_when_small(spark):
    """At sf0.001 customer is a few KB — well under the default 10MB
    threshold, so the gate keeps the broadcast hint (no perf loss at
    test scale)."""
    df = catalog.load_dim(spark, "customer", SF_DIR)
    assert _has_broadcast_hint(df)


def test_scaled_dim_unhinted_when_large(spark):
    """Shrink the threshold below customer's (decompressed) footprint:
    the gate must drop the hint — this is the 100x-SF code path."""
    with _with_threshold(spark, "8KB"):
        df = catalog.load_dim(spark, "customer", SF_DIR)
        assert not _has_broadcast_hint(df)


def test_constant_dims_always_hinted(spark):
    """nation (25 rows) and region (5 rows) are constant at every SF —
    hinted even when broadcast is disabled for size-estimated plans."""
    with _with_threshold(spark, "-1"):
        for name in ("nation", "region"):
            assert _has_broadcast_hint(catalog.load_dim(spark, name, SF_DIR))


def test_unknown_size_never_hinted(spark):
    df = catalog.load_table(spark, "customer", SF_DIR)
    hinted = catalog.dim_hint(spark, df, "customer", "/nonexistent/dir")
    assert not _has_broadcast_hint(hinted)


def test_parse_byte_conf():
    assert catalog._parse_byte_conf("10485760b") == 10 << 20
    assert catalog._parse_byte_conf("10m") == 10 << 20
    assert catalog._parse_byte_conf("10MB") == 10 << 20
    assert catalog._parse_byte_conf("1g") == 1 << 30
    assert catalog._parse_byte_conf("512") == 512
    assert catalog._parse_byte_conf("-1") == -1


@pytest.mark.parametrize("query", ["revenue_by_nation", "top_selling_brands"])
def test_gate_does_not_change_results(spark, query):
    """The same query with the gate OPEN (SF-scaled dims hinted) and
    CLOSED (AQE decides for them) must return identical rows — the plan
    strategy is performance-only. Closing the gate removes exactly the
    SF-scaled hints; constant nation/region hints stay."""
    open_df = REGISTRY[query].fn(spark, SF_DIR)
    hinted = open_df.collect()
    with _with_threshold(spark, "1KB"):
        closed_df = REGISTRY[query].fn(spark, SF_DIR)
        assert _hint_count(closed_df) < _hint_count(open_df)
        unhinted = closed_df.collect()
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, hinted)) == sorted(map(key, unhinted))


def test_aqe_owns_strategy_when_gate_closed(spark):
    """With the gate closed, the only remaining hint in
    revenue_by_nation is the constant nation dim; the customer join is
    AQE's call and the executed plan is adaptive."""
    with _with_threshold(spark, "1KB"):
        df = REGISTRY["revenue_by_nation"].fn(spark, SF_DIR)
        assert _hint_count(df) == 1  # nation only; customer un-hinted
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan" in plan


def test_parquet_num_rows_footer_count(tmp_path):
    """catalog.parquet_num_rows must read the FOOTER (exact count, no
    Spark job) for both single-file tables and directory tables — it
    feeds plan-parameter sizing (IVF list count, LSH band bits), so a
    wrong count silently mis-sizes a 100 TB plan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streaming_ecom_analytics_spark import catalog

    # single file (the testdata shape)
    pq.write_table(
        pa.table({"x": list(range(123))}), str(tmp_path / "t1.parquet")
    )
    assert catalog.parquet_num_rows(str(tmp_path), "t1") == 123
    # directory of part files (the cluster shape)
    d = tmp_path / "t2.parquet"
    d.mkdir()
    pq.write_table(pa.table({"x": [1, 2]}), str(d / "part-0.parquet"))
    pq.write_table(pa.table({"x": [3, 4, 5]}), str(d / "part-1.parquet"))
    assert catalog.parquet_num_rows(str(tmp_path), "t2") == 5
    # the real testdata contract the IVF queries rely on
    assert catalog.parquet_num_rows("/root/testdata/sf0.001", "embeddings") == 500
