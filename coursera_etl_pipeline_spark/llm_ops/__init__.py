"""LLM-data-pipeline operators: dedup, similarity search, text
analysis, sampling/packing, multimodal column plumbing."""

from coursera_etl_pipeline_spark.llm_ops import (  # noqa: F401  (registers)
    clusters,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
