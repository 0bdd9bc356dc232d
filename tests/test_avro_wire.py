"""AVRO wire format: spec conformance (golden bytes), codec round-trip
through Spark, and JSON/AVRO field parity."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.schema import ECOM_EVENT_SCHEMA
from streaming_ecom_analytics_spark.sources import avro_wire
from streaming_ecom_analytics_spark.sources.kafka_contract import (
    kafka_packages_hint,
    serialize_events,
    serialize_events_avro,
)


def test_golden_bytes_spec_conformance():
    """Hand-computed Avro binary for a known record — pins the codec to
    the Apache Avro spec (zigzag varints, length-prefixed UTF-8,
    union-index-prefixed nullables, little-endian double)."""
    rec = {
        "event_time": "2024-01-01T00:00:00.000",
        "event_type": "view",
        "product_id": "p1",
        "category_id": "c1",
        "category_code": None,
        "brand": "acme",
        "price": 1.5,
        "user_id": "u1",
        "user_session": "s1",
    }
    got = avro_wire.encode_event(rec)
    import struct

    expected = (
        bytes([46]) + b"2024-01-01T00:00:00.000"  # len 23 → zigzag 46
        + bytes([8]) + b"view"
        + bytes([4]) + b"p1"
        + bytes([4]) + b"c1"
        + bytes([0])  # union branch 0 = null
        + bytes([2]) + bytes([8]) + b"acme"  # branch 1 = string
        + struct.pack("<d", 1.5)
        + bytes([4]) + b"u1"
        + bytes([4]) + b"s1"
    )
    assert got == expected
    assert avro_wire.decode_event(got) == rec


def test_zigzag_varint_edge_values():
    import io

    for n in (0, -1, 1, -2, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)):
        buf = io.BytesIO()
        avro_wire._write_long(buf, n)
        back, pos = avro_wire._read_long(buf.getvalue(), 0)
        assert back == n and pos == len(buf.getvalue())


def test_avro_schema_json_is_valid():
    schema = json.loads(avro_wire.EVENT_AVRO_SCHEMA_JSON)
    assert schema["type"] == "record"
    names = [f["name"] for f in schema["fields"]]
    assert names == [n for n, _ in avro_wire._AVRO_FIELDS]
    assert json.loads(avro_wire.EVENT_AVRO_SCHEMA_JSON)["fields"][4]["type"] == [
        "null",
        "string",
    ]


@pytest.fixture()
def events(spark):
    rows = [
        (
            dt.datetime(2024, 1, 1, 12, 0, 0, 123000),
            "view",
            "p1",
            "c1",
            "electronics.phone",
            "acme",
            9.99,
            "u1",
            "s1",
        ),
        (
            dt.datetime(2024, 1, 2, 0, 30, 1, 500000),
            "purchase",
            "p2",
            "c2",
            None,
            None,
            100.0,
            "u2",
            "s2",
        ),
    ]
    return spark.createDataFrame(rows, ECOM_EVENT_SCHEMA)


def test_avro_roundtrip_through_spark(spark, events):
    wire = serialize_events_avro(events)
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert wire.schema["value"].dataType.typeName() == "binary"
    back = avro_wire.parse_events_avro(wire).orderBy("user_id").collect()
    orig = events.orderBy("user_id").collect()
    for b, o in zip(back, orig):
        assert b.event_time == o.event_time
        assert b.event_type == o.event_type
        assert b.brand == o.brand
        assert b.category_code == o.category_code
        assert b.price == o.price
        assert b.user_session == o.user_session


def test_avro_and_json_wire_carry_identical_fields(spark, events):
    """Schema-evolution twin formats: same key, same field values."""
    js = {r.key: json.loads(r.value) for r in serialize_events(events).collect()}
    av = {
        r.key: avro_wire.decode_event(bytes(r.value))
        for r in serialize_events_avro(events).collect()
    }
    assert js.keys() == av.keys()
    for k in js:
        # JSON omits null fields (to_json drops them); AVRO carries
        # explicit nulls — the non-null projections must agree
        js_nn = {kk: vv for kk, vv in js[k].items() if vv is not None}
        av_nn = {kk: vv for kk, vv in av[k].items() if vv is not None}
        assert js_nn == av_nn


def test_kafka_packages_hint_pins_session_version(spark):
    hint = kafka_packages_hint(spark)
    assert f"spark-sql-kafka-0-10_2.13:{spark.version}" in hint
    assert f"spark-avro_2.13:{spark.version}" in hint


def test_kafka_source_fails_clearly_without_connector(spark):
    """Without the kafka jar, building the source must fail with the
    standard missing-data-source error (not silently misbehave); with
    the jar (kafka_packages_hint) the same call is the real connector."""
    from streaming_ecom_analytics_spark.sources.kafka_contract import kafka_source

    with pytest.raises(Exception, match="[Kk]afka"):
        kafka_source(spark, brokers="localhost:9092", topic="t").schema
