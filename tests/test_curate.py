"""Curation pipeline + streaming dedup tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from streaming_ecom_analytics_spark.functions.curate import curate_documents, dedup_stream

GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "for running in the park with a friend " * 3
)
NEAR = GOOD.replace("fine day", "great day")
SHORT = "tiny"
# short AND stopword-free: len_score 0.16 + stop 0 + punct 0.2 < 0.5
NONSTOP = "zzz qqq xxx yyy www vvv uuu ttt sss rrr " * 2


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),    # exact dup of 1
        (3, NEAR),    # near dup of 1
        (4, SHORT),   # fails quality (length)
        (5, NONSTOP), # fails quality (no stopwords)
        (6, "le chat est dans la maison et les enfants sont dans le jardin avec un chien et la famille " * 3),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_pipeline(corpus):
    out = curate_documents(corpus, min_quality=0.5, near_dup_threshold=0.6)
    ids = sorted(r.doc_id for r in out.collect())
    # 2 (exact dup), 3 (near dup), 4+5 (quality) removed; 1 and 6 survive
    assert ids == [1, 6]
    assert all(r.quality_score >= 0.5 for r in out.collect())


def test_curate_language_filter(corpus):
    out = curate_documents(
        corpus, min_quality=0.5, keep_langs=("en",), near_dup_threshold=0.6
    )
    assert sorted(r.doc_id for r in out.collect()) == [1]  # french doc 6 dropped


def test_dedup_stream(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (1, t0, 1, "view", 1.0, "{}"),  # duplicate event_id (producer retry)
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    d = tmp_path / "ev"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(d) + "/*")
    out = dedup_stream(stream, key_cols=("event_id",))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in got) == [1, 2]
