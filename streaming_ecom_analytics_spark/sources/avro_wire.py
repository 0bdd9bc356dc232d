"""AVRO wire format for the event bus — runnable without the spark-avro jar.

The reference's processed topic carries AVRO for schema evolution
(reference README.md:81,87). Spark's native path is ``to_avro``/
``from_avro`` from the external ``org.apache.spark:spark-avro`` module
(add ``--packages org.apache.spark:spark-avro_2.13:<spark-version>``);
that jar is not bundled in this container, so this module also ships a
self-contained binary codec implementing the Apache Avro 1.x binary
encoding (public spec: zigzag-varint longs, length-prefixed UTF-8
strings, little-endian IEEE doubles, union-index-prefixed nullables),
exercised through Arrow-batched ``mapInPandas``.

``serialize_events_avro`` / ``parse_events_avro`` prefer the JVM
functions when the jar is present (codegen'd, the 100 TB path) and fall
back to the Python codec otherwise — same bytes either way, which the
golden-bytes unit test pins.

Wire record (field order = producer wire order, producer.py:34-45):
event_time is the ISO-8601 millisecond string of the JSON contract —
the two wire formats stay field-for-field interchangeable.
"""

from __future__ import annotations

import io
import json
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.schema import EVENT_TIME_FORMAT

# (name, nullable) in wire order; event_time serialized as string.
_AVRO_FIELDS: tuple[tuple[str, bool], ...] = (
    ("event_time", False),
    ("event_type", False),
    ("product_id", False),
    ("category_id", False),
    ("category_code", True),
    ("brand", True),
    ("price", False),  # double
    ("user_id", False),
    ("user_session", False),
)

#: The writer schema, as Avro schema JSON — publish alongside the topic
#: (schema-registry style) so independent consumers can decode.
EVENT_AVRO_SCHEMA_JSON = json.dumps(
    {
        "type": "record",
        "name": "EcomEvent",
        "namespace": "streaming_ecom_analytics",
        "fields": [
            {
                "name": name,
                "type": (
                    "double"
                    if name == "price"
                    else (["null", "string"] if nullable else "string")
                ),
            }
            for name, nullable in _AVRO_FIELDS
        ],
    }
)


# ---- Avro binary primitives (Apache Avro spec §binary encoding) ----


def _write_long(buf: io.BytesIO, n: int) -> None:
    """zigzag + base-128 varint (spec: int/long encoding)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_string(buf: io.BytesIO, s: str) -> None:
    raw = s.encode("utf-8")
    _write_long(buf, len(raw))
    buf.write(raw)


def _read_string(data: bytes, pos: int) -> tuple[str, int]:
    n, pos = _read_long(data, pos)
    return data[pos : pos + n].decode("utf-8"), pos + n


def encode_event(values: dict) -> bytes:
    """One wire record → Avro binary (no container framing: Kafka-style
    raw message body, schema communicated out of band)."""
    buf = io.BytesIO()
    for name, nullable in _AVRO_FIELDS:
        v = values.get(name)
        if name == "price":
            buf.write(struct.pack("<d", float(v)))
        elif nullable:
            if v is None:
                _write_long(buf, 0)  # union branch 0 = null
            else:
                _write_long(buf, 1)  # union branch 1 = string
                _write_string(buf, v)
        else:
            _write_string(buf, v)
    return buf.getvalue()


def decode_event(data: bytes) -> dict:
    """Avro binary → dict of the wire fields (inverse of encode_event)."""
    out: dict = {}
    pos = 0
    for name, nullable in _AVRO_FIELDS:
        if name == "price":
            (out[name],) = struct.unpack_from("<d", data, pos)
            pos += 8
        elif nullable:
            branch, pos = _read_long(data, pos)
            if branch == 0:
                out[name] = None
            else:
                out[name], pos = _read_string(data, pos)
        else:
            out[name], pos = _read_string(data, pos)
    return out


# ---- Spark surface ----


_JVM_AVRO_AVAILABLE: dict[int, bool] = {}


def _jvm_avro_available(spark) -> bool:
    """True iff the spark-avro module is loadable in this session.

    Building a to_avro Column never fails — the AVRO_NOT_LOADED error
    only surfaces at ANALYSIS, so the probe must resolve a plan's
    schema. Cached per session (the classpath can't change mid-run)."""
    key = id(spark)
    if key not in _JVM_AVRO_AVAILABLE:
        try:
            from pyspark.sql.avro.functions import to_avro

            probe = spark.range(1).select(
                to_avro(F.struct(F.lit("x").alias("a"))).alias("b")
            )
            probe.schema  # forces analysis → raises if module absent
            _JVM_AVRO_AVAILABLE[key] = True
        except Exception:
            _JVM_AVRO_AVAILABLE[key] = False
    return _JVM_AVRO_AVAILABLE[key]


def serialize_events_avro(
    events: DataFrame, *, key_col: str = "user_id", ts_col: str = "event_time"
) -> DataFrame:
    """Events → Kafka-shaped (key string, value binary) in AVRO.

    JVM ``to_avro`` when the spark-avro jar is loaded (whole-stage
    codegen, zero Python); otherwise the spec-conformant Python codec
    over Arrow batches. Works in batch and streaming alike.
    """
    import pandas as pd

    spark = events.sparkSession
    cols = [
        F.date_format(F.col(name), EVENT_TIME_FORMAT).alias(name)
        if name == ts_col
        else (
            F.col(name).cast("double").alias(name)
            if name == "price"
            else F.col(name).cast("string").alias(name)
        )
        for name, _ in _AVRO_FIELDS
        if name in events.columns
    ]
    shaped = events.select(
        F.col(key_col).cast("string").alias("key"), F.struct(*cols).alias("e")
    )
    if _jvm_avro_available(spark):
        from pyspark.sql.avro.functions import to_avro

        return shaped.select("key", to_avro(F.col("e")).alias("value"))

    def enc(batches):
        # struct columns arrive as a Series of dicts under Arrow
        for pdf in batches:
            vals = [encode_event(d) for d in pdf["e"]]
            yield pd.DataFrame({"key": pdf["key"], "value": pd.Series(vals, dtype=object)})

    return shaped.mapInPandas(enc, schema="key string, value binary")


def parse_events_avro(raw: DataFrame, *, value_col: str = "value") -> DataFrame:
    """(value binary) AVRO frame → typed events (inverse of
    serialize_events_avro; event_time restored to timestamp).

    JVM ``from_avro`` with :data:`EVENT_AVRO_SCHEMA_JSON` when the jar
    is loaded, else the Python codec.
    """
    import pandas as pd

    spark = raw.sparkSession
    if _jvm_avro_available(spark):
        from pyspark.sql.avro.functions import from_avro

        parsed = raw.select(
            from_avro(F.col(value_col), EVENT_AVRO_SCHEMA_JSON).alias("e")
        ).select("e.*")
    else:

        def dec(batches):
            for pdf in batches:
                rows = [decode_event(bytes(v)) for v in pdf[value_col]]
                yield pd.DataFrame(
                    rows, columns=[name for name, _ in _AVRO_FIELDS]
                )

        parsed = raw.select(value_col).mapInPandas(
            dec,
            schema=(
                "event_time string, event_type string, product_id string, "
                "category_id string, category_code string, brand string, "
                "price double, user_id string, user_session string"
            ),
        )
    return parsed.withColumn("event_time", F.to_timestamp("event_time"))
