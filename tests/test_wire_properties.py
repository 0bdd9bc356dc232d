"""Property-based wire-contract tests (round-8 verdict #7): while a
real Kafka broker stays environment-impossible, the JSON and AVRO event
codecs are hardened beyond the fixed fixtures — random unicode brands,
boundary timestamps, and null optional fields must round-trip exactly
through the engine's distributed serialize/parse expressions
(reference producer.py:34-45 field order; :36 millisecond truncation).

Two layers:
- hypothesis properties: small, shape-diverse frames (quotes,
  backslashes, control chars, astral-plane unicode, sub-millisecond
  timestamps, nulls) — the shrinker finds minimal counterexamples.
- one seeded bulk round-trip: 1,200 generated events through BOTH
  codecs in single Spark jobs, so the contract is exercised at
  batch-boundary scale (multiple Arrow batches), not row-by-row.
"""

from __future__ import annotations

import datetime as dt
import random
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.schema import ECOM_EVENT_SCHEMA
from streaming_ecom_analytics_spark.sources import avro_wire, kafka_contract

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# naive datetimes interpreted in the session's pinned-UTC zone;
# spans pre-epoch and far-future boundaries
_ts = st.datetimes(
    min_value=dt.datetime(1960, 1, 2), max_value=dt.datetime(2200, 12, 30)
)
# full printable-and-beyond unicode: quotes, backslashes, control
# chars, CJK, astral plane — everything JSON must escape and AVRO
# must carry as raw UTF-8
_uni = st.text(min_size=0, max_size=24)

_events_strategy = st.lists(
    st.tuples(
        _ts,
        st.sampled_from(["view", "cart", "purchase", "remove_from_cart"]),
        _uni,                          # product_id (string on the wire)
        _uni,                          # category_id
        st.one_of(st.none(), _uni),    # category_code (nullable)
        st.one_of(st.none(), _uni),    # brand (nullable)
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        _uni,                          # user_session
    ),
    min_size=1,
    max_size=30,
)


def _frame(spark, rows):
    """Rows → typed event frame; user_id doubles as a join-back key."""
    data = [
        (ts, et, pid, cid, cc, br, price, f"u{i}", sess)
        for i, (ts, et, pid, cid, cc, br, price, sess) in enumerate(rows)
    ]
    return spark.createDataFrame(data, ECOM_EVENT_SCHEMA)


def _ms(ts: dt.datetime) -> dt.datetime:
    """The producer contract truncates to millisecond precision."""
    return ts.replace(microsecond=ts.microsecond // 1000 * 1000)


@given(rows=_events_strategy)
@settings(**_SETTINGS)
def test_json_wire_roundtrip_property(spark, rows):
    """serialize_events → parse_events is lossless for arbitrary
    events, up to the contractual millisecond timestamp truncation; the
    regex gate never drops a legally-produced row."""
    ev = _frame(spark, rows)
    back = {
        r.user_id: r
        for r in kafka_contract.parse_events(
            kafka_contract.serialize_events(ev)
        ).collect()
    }
    assert len(back) == len(rows)  # gate dropped nothing
    for i, (ts, et, pid, cid, cc, br, price, sess) in enumerate(rows):
        r = back[f"u{i}"]
        assert r.event_time == _ms(ts)
        assert (r.event_type, r.product_id, r.category_id) == (et, pid, cid)
        assert r.category_code == cc and r.brand == br
        assert r.price == price
        assert r.user_session == sess


@given(rows=_events_strategy)
@settings(**_SETTINGS)
def test_avro_wire_roundtrip_property(spark, rows):
    """serialize_events_avro bytes decode (spec codec) back to the
    exact wire fields for arbitrary events: union branches for null
    optionals, raw UTF-8 strings, little-endian IEEE price, ms-ISO
    event_time — and key is always the string user_id."""
    ev = _frame(spark, rows)
    got = {
        r.key: avro_wire.decode_event(bytes(r.value))
        for r in kafka_contract.serialize_events_avro(ev).collect()
    }
    assert len(got) == len(rows)
    for i, (ts, et, pid, cid, cc, br, price, sess) in enumerate(rows):
        d = got[f"u{i}"]
        # the wire timestamp string obeys the producer's ms format
        assert d["event_time"] == _ms(ts).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
        assert (d["event_type"], d["product_id"], d["category_id"]) == (et, pid, cid)
        assert d["category_code"] == cc and d["brand"] == br
        assert d["price"] == price
        assert d["user_id"] == f"u{i}" and d["user_session"] == sess


def _bulk_rows(n: int):
    """Seeded generator: n diverse events (unicode brands, boundary
    stamps, nulls) without hypothesis — volume, not shrinking."""
    rng = random.Random(20260815)
    alphabets = [
        string.ascii_letters,
        "áéîöü№Ωλ中文字テスト한글",
        "emoji: 🛒🛍️💳",
        '"\\/\b\f\n\r\t',  # JSON-escape gauntlet
    ]
    rows = []
    for i in range(n):
        a = rng.choice(alphabets)
        word = "".join(rng.choice(a) for _ in range(rng.randint(0, 12)))
        ts = dt.datetime(1970, 1, 1) + dt.timedelta(
            seconds=rng.randint(-(10**9), 4 * 10**9),
            microseconds=rng.randint(0, 999_999),
        )
        rows.append(
            (
                ts,
                rng.choice(["view", "cart", "purchase"]),
                str(rng.randint(0, 10**9)),
                str(rng.randint(0, 10**6)),
                None if rng.random() < 0.2 else f"cat.{word}",
                None if rng.random() < 0.2 else word,
                rng.choice(
                    [0.0, -1.5, 1e-8, 6.022e23, 123.45, rng.random() * 1e6]
                ),
                f"s{rng.randint(0, 10**12)}",
            )
        )
    return rows


def test_bulk_1200_events_roundtrip_both_codecs(spark):
    """1,200 seeded events through BOTH codecs in single distributed
    jobs (multiple Arrow batches / partitions): JSON parse-back equals
    the ms-truncated input exactly, and the AVRO bytes decode to the
    same wire fields the JSON path carries."""
    rows = _bulk_rows(1200)
    ev = _frame(spark, rows).repartition(8)

    parsed = kafka_contract.parse_events(
        kafka_contract.serialize_events(ev)
    )
    back = {r.user_id: r for r in parsed.collect()}
    assert len(back) == 1200
    for i, (ts, et, pid, cid, cc, br, price, sess) in enumerate(rows):
        r = back[f"u{i}"]
        assert r.event_time == _ms(ts) and r.price == price
        assert (r.category_code, r.brand, r.user_session) == (cc, br, sess)

    avro = {
        r.key: avro_wire.decode_event(bytes(r.value))
        for r in kafka_contract.serialize_events_avro(ev).collect()
    }
    assert len(avro) == 1200
    json_wire = {
        r.user_id: r
        for r in parsed.withColumn(
            "wire_time",
            F.date_format("event_time", "yyyy-MM-dd'T'HH:mm:ss.SSS"),
        ).collect()
    }
    for key, d in avro.items():
        j = json_wire[key]
        assert d["event_time"] == j.wire_time
        assert d["brand"] == j.brand and d["category_code"] == j.category_code
        assert d["price"] == j.price and d["user_session"] == j.user_session
