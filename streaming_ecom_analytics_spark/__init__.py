"""streaming_ecom_analytics_spark — a PySpark-native analytics engine.

A brand-new, Spark-first realization of the query and data-processing
capabilities of the reference pipeline DrUkachi/streaming-ecom-analytics
(batch clickstream ingest + Kafka/Flink streaming aggregates + Snowflake
reporting SQL), re-expressed as one engine on the Spark DataFrame / SQL /
Structured Streaming stack, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, UTC, shuffle sizing)
- ``schema``     : canonical event schema + testdata schemas
- ``catalog``    : table loaders over the driver-provided parquet lake
- ``operators``  : cleaning, sampling, the analytic aggregates, relational ops
- ``sources``    : readers/sinks incl. the Kafka JSON event contract
- ``functions``  : text analysis, dedup (exact/minhash/simhash), similarity
- ``plans``      : the query registry exposed through ``__spark_entry__``
- ``streaming``  : Structured Streaming windows, watermarks, materializer
"""

from streaming_ecom_analytics_spark.session import get_spark

__all__ = ["get_spark"]
