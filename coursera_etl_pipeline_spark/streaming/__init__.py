"""Structured Streaming surface: file-source ingest, watermarks,
windowed aggregations, stateful dedup."""
