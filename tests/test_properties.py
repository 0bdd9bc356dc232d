"""Property-based tests (hypothesis): invariants that must hold for
arbitrary inputs, not just the crafted fixtures.

Strategy sizes are kept small — each example builds a Spark DataFrame,
so the value is in input *shape* diversity (nulls, ties, duplicates,
empty partitions), not volume.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streaming_ecom_analytics_spark.functions import dedup
from streaming_ecom_analytics_spark.operators.asof import asof_join
from streaming_ecom_analytics_spark.operators.sampler import top_n_per_key

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_ts = st.datetimes(
    min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 1, 7)
)
_events = st.lists(
    st.tuples(
        st.integers(0, 999_999),           # event_id
        _ts,                               # ts
        st.integers(0, 5),                 # user_id
        st.sampled_from(["view", "cart", "purchase"]),
        st.floats(0, 100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@given(rows=_events, n=st.integers(1, 5))
@settings(**_SETTINGS)
def test_sampler_bound_and_subset(spark, rows, n):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = top_n_per_key(
        df, key_cols=["user_id"], order_cols=["ts", "event_id"], n=n
    ).collect()
    # never more than n rows per key, and every output row is an input row
    per_key: dict[int, int] = {}
    inputs = {tuple(r) for r in rows}
    for r in out:
        per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
        assert (r.event_id, r.ts, r.user_id, r.event_type, r.value) in inputs
    assert all(c <= n for c in per_key.values())


@given(rows=_events)
@settings(**_SETTINGS)
def test_asof_result_never_in_future(spark, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    purchases = df.filter("event_type = 'purchase'").select("user_id", "ts", "value")
    out = asof_join(df, purchases, on="user_id", value_cols=("value",)).collect()
    assert len(out) == len(rows)  # left join preserves cardinality
    for r in out:
        if r.asof_ts is not None:
            assert r.asof_ts <= r.ts  # never matches a future right row


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=60), min_size=1, max_size=12
    )
)
@settings(**_SETTINGS)
def test_jaccard_bounds_and_exact_dups(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_pairs(df, k=2, threshold=0.0).collect()
    for p in pairs:
        assert 0.0 <= p.jaccard <= 1.0 and p.doc_a < p.doc_b
    # identical texts must appear with jaccard 1.0
    seen = {}
    for i, t in rows:
        key = " ".join(t.split())
        if key and key in seen:
            a, b = min(seen[key], i), max(seen[key], i)
            match = [p for p in pairs if (p.doc_a, p.doc_b) == (a, b)]
            if match:
                assert match[0].jaccard == 1.0
        elif key:
            seen[key] = i
