"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``coursera_etl_pipeline_spark``; this file
is the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import coursera_etl_pipeline_spark.llm_ops  # noqa: E402,F401  (registers queries)
import coursera_etl_pipeline_spark.operators  # noqa: E402,F401
import coursera_etl_pipeline_spark.plans  # noqa: E402,F401
import coursera_etl_pipeline_spark.streaming  # noqa: E402,F401
from coursera_etl_pipeline_spark.registry import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: scan->filter->agg->sort) on
    sf0.001; driver checks rows>0 and a stable schema."""
    from coursera_etl_pipeline_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases)."""
    return dict(ORACLE)
