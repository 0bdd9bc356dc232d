"""Sources & sinks: the Kafka JSON event contract, parquet lake IO,
and brokerless file-based fallbacks for tests."""
