"""End-to-end batch cycle test — the full reference DAG parity path on
a crafted ecom CSV: extract → publish → validate → materialize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.runner import REPORTING_VIEWS, run_batch_cycle
from streaming_ecom_analytics_spark.sources.lake import Lake

CSV_HEADER = "event_time,event_type,product_id,category_id,category_code,brand,price,user_id,user_session"
CSV_ROWS = [
    "2019-11-01 09:00:00,view,101,c1,electronics.phone,acme,9.99,u1,s1",
    "2019-11-01 09:05:00,cart,101,c1,electronics.phone,acme,9.99,u1,s1",
    "2019-11-01 09:10:00,purchase,101,c1,electronics.phone,acme,9.99,u1,s1",
    "2019-11-01 10:00:00,view,102,c2,apparel.shoes,zeta,25.50,u2,s2",
    "2019-11-01 10:05:00,cart,102,c2,apparel.shoes,zeta,25.50,u2,s2",  # abandoned
    "2019-11-02 11:00:00,purchase,103,c3,apparel.shoes,zeta,40.00,u3,s3",
    "2019-11-02 12:00:00,view,104,c4,,,,u4,s4",  # null category/brand/price
]


@pytest.fixture(scope="module")
def cycle(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    csv = root / "events.csv"
    csv.write_text(CSV_HEADER + "\n" + "\n".join(CSV_ROWS) + "\n")
    lake = Lake(str(root / "warehouse"))
    result = run_batch_cycle(spark, lake, csv_path=str(csv), daily_sample_n=100)
    return spark, lake, result


def test_cycle_reports(cycle):
    spark, lake, result = cycle
    assert result["failed"] == []
    assert sorted(result["refreshed"]) == sorted(REPORTING_VIEWS)
    assert result["ingest"].total_events == 7
    assert result["quality"]["total_rows"] == 7
    assert result["quality"]["null_key_rows"] == 0
    assert str(result["quality"]["max_event_date"]).startswith("2019-11-02")


def test_daily_revenue_view(cycle):
    spark, lake, _ = cycle
    out = {
        str(r.event_date)[:10]: r.total_revenue
        for r in lake.read(spark, "reporting", "daily_revenue").collect()
    }
    assert out == {"2019-11-01": 9.99, "2019-11-02": 40.0}


def test_abandoned_cart_view(cycle):
    spark, lake, _ = cycle
    rows = lake.read(spark, "reporting", "abandoned_cart_users").collect()
    assert [(r.user_id, r.cart_events) for r in rows] == [("u2", 1)]


def test_top_brands_view(cycle):
    spark, lake, _ = cycle
    rows = lake.read(spark, "reporting", "top_selling_brands").collect()
    assert [(r.brand, r.revenue) for r in rows] == [("zeta", 40.0), ("acme", 9.99)]


def test_wire_publish(cycle):
    spark, lake, _ = cycle
    wire = lake.read(spark, "processed", "events_wire")
    assert wire.columns == ["key", "value"]
    assert wire.count() == 7
    assert wire.filter(F.col("value").contains('"price":0.0')).count() == 1  # null→0.0


def test_aov_uses_sessions(cycle):
    spark, lake, _ = cycle
    out = {
        str(r.event_date)[:10]: r.average_order_value
        for r in lake.read(spark, "reporting", "average_order_value_daily").collect()
    }
    # day 1: one purchase session s1 → 9.99; day 2: s3 → 40.0
    assert out == {"2019-11-01": 9.99, "2019-11-02": 40.0}
