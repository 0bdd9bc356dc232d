"""Three-layer parquet lakehouse: raw / processed / reporting.

The reference lands data in three Snowflake namespaces — RAW (connector
dumps), PROCESSED (Flink aggregates), REPORTING (batch TRUNCATE+INSERT
refreshes) — per reference README.md:40,159. Here each layer is a
directory namespace of date-partitioned parquet tables.

Scale posture:
- every fact write is ``partitionBy(date_col)`` → static & dynamic
  partition pruning for the daily aggregates (the 100 TB win: a day's
  query reads a day's files);
- refreshes are atomic overwrites, partition-scoped when keyed by date;
- readers go through the catalog (explicit schema, no inference).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Lake:
    """A tiny table namespace over a root directory."""

    LAYERS = ("raw", "processed", "reporting")

    def __init__(self, root: str):
        self.root = root

    def path(self, layer: str, table: str) -> str:
        assert layer in self.LAYERS, f"unknown layer {layer}"
        return os.path.join(self.root, layer, table)

    def write(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        *,
        partition_by: tuple[str, ...] = (),
        mode: str = "overwrite",
    ) -> str:
        """Write a table; date-partition fact tables
        (reference README.md:40 'partitioned based on event timestamps')."""
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        target = self.path(layer, table)
        writer.parquet(target)
        return target

    def refresh(self, df: DataFrame, table: str) -> str:
        """TRUNCATE+INSERT refresh of a reporting table
        (reference snowflake_refresh.py:5-80) — an atomic overwrite here."""
        return self.write(df, "reporting", table, mode="overwrite")

    def read(self, spark: SparkSession, layer: str, table: str) -> DataFrame:
        return spark.read.parquet(self.path(layer, table))

    def write_bucketed(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        *,
        bucket_col: str,
        n_buckets: int = 32,
        mode: str = "overwrite",
    ) -> str:
        """Write a table hash-bucketed (and sorted) on a join key.

        Bucketing is THE co-located-join primitive at scale: two
        tables bucketed on the same key with the same bucket count
        join with ZERO exchange — each task reads matching bucket
        files from both sides (plan-asserted in tests/test_plans.py).
        For a fact table joined repeatedly on user_id/order_key, this
        converts every join's corpus-sized shuffle into a one-time
        write-side cost. Registered as an external table (explicit
        path) so the files stay inside the lake namespace; bucket
        metadata lives in the session catalog, which on a real
        deployment is the shared metastore.
        """
        target = self.path(layer, table)
        name = f"{layer}_{table}".replace("-", "_").replace(".", "_")
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode(mode)
            .format("parquet")
            .option("path", target)
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(name)
        )
        return name

    def read_table(self, spark: SparkSession, layer: str, table: str) -> DataFrame:
        """Read a bucketed table through the catalog (bucket metadata
        only survives the catalog path — spark.read.parquet on the
        same files would lose bucketing and reintroduce the shuffle)."""
        name = f"{layer}_{table}".replace("-", "_").replace(".", "_")
        return spark.table(name)
