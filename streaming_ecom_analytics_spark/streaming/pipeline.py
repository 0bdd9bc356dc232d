"""The end-to-end streaming pipeline — the reference's whole
architecture (Airflow DAG → Kafka → Flink → Snowflake →
dashboards, reference ecommerce_pipeline_dag.py:50-85, README.md:30-51)
collapsed into one Spark program:

    source (kafka or file lake) → parse/clean → windowed aggregates
      → materialized parquet views (processed layer)

Replay & checkpointing (S9/ST8): the reference hand-rolls a JSON
checkpoint {current_month, global_offset} to replay months without
overlap (extractor.py:25-41,143-154). Structured Streaming's
checkpointLocation subsumes it: source offsets, aggregate state, and
sink epochs all resume exactly-once after restart; a file-lake source
replays deterministically with Trigger.AvailableNow.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from streaming_ecom_analytics_spark.schema import TESTDATA_EVENT_SCHEMA
from streaming_ecom_analytics_spark.streaming import windows
from streaming_ecom_analytics_spark.streaming.materialize import start_materialized_view


@dataclass
class StreamingPipeline:
    """Wires a streaming events source to the processed-layer views.

    Each view is an independent query with its own checkpoint —
    per-view failure isolation, like the reference's per-table refresh
    loop (snowflake.py:55-61), but with exactly-once restarts.
    """

    spark: SparkSession
    warehouse_dir: str
    checkpoint_dir: str
    watermark: str = "1 hour"
    queries: list = field(default_factory=list)

    def file_events_source(self, path: str, *, max_files_per_trigger: int = 1) -> DataFrame:
        """File-lake streaming source (brokerless dev/test path; swap
        for kafka_contract.kafka_source in production). One file per
        trigger ≈ one micro-batch per day-partition — the reference's
        month-rotation replay, minus the bespoke state file."""
        return (
            self.spark.readStream.schema(TESTDATA_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )

    def start_views(self, events: DataFrame, *, available_now: bool = True) -> list:
        """Start the processed-layer views over an events stream."""
        specs = {
            "funnel_5m": windows.tumbling_event_counts(
                events, watermark=self.watermark
            ),
            "sliding_revenue": windows.sliding_revenue(
                events, watermark=self.watermark
            ),
            "active_users_daily": windows.windowed_active_users(
                events, watermark=self.watermark
            ),
        }
        for name, agg in specs.items():
            self.queries.append(
                start_materialized_view(
                    agg,
                    target_path=f"{self.warehouse_dir}/{name}",
                    checkpoint=f"{self.checkpoint_dir}/{name}",
                    output_mode="complete",
                    available_now=available_now,
                )
            )
        return self.queries

    def await_all(self) -> None:
        for q in self.queries:
            q.awaitTermination()
