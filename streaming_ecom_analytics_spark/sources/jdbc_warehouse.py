"""JDBC warehouse sink/source — the external-warehouse connector
surface (reference parity: ``snowflake.py:5-13`` connects a Python
client to Snowflake; ``snowflake.py:15-47`` runs remote validation
counts; ``snowflake.py:49-63`` materializes views by executing SQL).

Spark-first re-expression: the warehouse is just another JDBC
DataSource. Writes are distributed ``df.write.format("jdbc")`` (every
executor opens its own connection and streams its partitions — no
driver-side collect, unlike the reference's single-connection cursor
loop), reads push the query down as a subquery alias. The remote
"validation" step of the reference becomes the engine's OWN
expectations report run BEFORE the write (validation.expectations_
report), so bad batches never leave the cluster.

No JDBC driver jar ships in this sandbox (same boundary as Kafka —
see KAFKA.md); ``jdbc_driver_hint`` names the artifact to add, and the
builders are pure plan/options construction, unit-testable without a
database.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

# driver class + maven artifact per scheme: what a cluster operator
# must put on the classpath (spark.jars.packages) for each warehouse
_DRIVERS: dict[str, tuple[str, str]] = {
    "postgresql": ("org.postgresql.Driver", "org.postgresql:postgresql:42.7.3"),
    "mysql": ("com.mysql.cj.jdbc.Driver", "com.mysql:mysql-connector-j:8.4.0"),
    "sqlserver": (
        "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "com.microsoft.sqlserver:mssql-jdbc:12.6.1.jre11",
    ),
    "snowflake": (
        "net.snowflake.client.jdbc.SnowflakeDriver",
        "net.snowflake:snowflake-jdbc:3.16.0",
    ),
}


def _scheme(url: str) -> str:
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {url!r}")
    return url.split(":", 2)[1]


def jdbc_driver_hint(url: str) -> str:
    """The --packages coordinate (and driver class) a cluster operator
    needs for this warehouse URL — mirrors kafka_packages_hint."""
    scheme = _scheme(url)
    if scheme not in _DRIVERS:
        raise ValueError(
            f"unknown JDBC scheme {scheme!r}; known: {sorted(_DRIVERS)}"
        )
    cls, artifact = _DRIVERS[scheme]
    return f"--packages {artifact} (driver class {cls})"


def warehouse_writer(
    df: DataFrame,
    *,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    options: Mapping[str, str] | None = None,
):
    """Distributed JDBC write plan: returns the configured
    DataFrameWriter (caller invokes ``.save()``), so tests can assert
    the options without a database. ``num_partitions`` caps concurrent
    connections (repartition BEFORE the write — the JDBC sink opens
    one connection per partition); ``batchsize`` controls rows per
    INSERT round-trip."""
    scheme = _scheme(url)
    if scheme not in _DRIVERS:
        raise ValueError(
            f"unknown JDBC scheme {scheme!r}; known: {sorted(_DRIVERS)}"
        )
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("driver", _DRIVERS[scheme][0])
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "READ_COMMITTED")
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    return writer


def warehouse_reader(
    spark: SparkSession,
    *,
    url: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    options: Mapping[str, str] | None = None,
) -> DataFrameReader:
    """Pushdown JDBC read plan: the warehouse executes ``query`` as a
    subquery; with ``partition_column`` + bounds the read fans out to
    ``num_partitions`` parallel range scans (otherwise one connection
    drains the result — fine for dimension pulls, wrong for facts).
    Returns the configured DataFrameReader (caller invokes
    ``.load()``)."""
    scheme = _scheme(url)
    if scheme not in _DRIVERS:
        raise ValueError(
            f"unknown JDBC scheme {scheme!r}; known: {sorted(_DRIVERS)}"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) AS pushed")
        .option("driver", _DRIVERS[scheme][0])
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader
