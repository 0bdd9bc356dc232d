"""Structured Streaming layer: windowed aggregates with watermarks,
approx-distinct streaming variants, and the foreachBatch materializer."""
