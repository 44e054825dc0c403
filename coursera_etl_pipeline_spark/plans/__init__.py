"""Reference-parity pipeline plans (nested JSON -> 15-column table)."""

from coursera_etl_pipeline_spark.plans import queries  # noqa: F401  (registers)
