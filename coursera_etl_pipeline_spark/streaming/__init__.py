"""Structured Streaming surface: file-source ingest, watermarks,
windowed aggregations, stateful dedup."""

from coursera_etl_pipeline_spark.streaming import queries  # noqa: F401  (registers)
from coursera_etl_pipeline_spark.streaming import parity  # noqa: F401  (registers)
