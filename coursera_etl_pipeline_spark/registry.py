"""Query/oracle registry.

Every implemented operator (SURVEY.md §2) registers a named PySpark
query and, when SQL-expressible, a DuckDB-equivalent oracle SQL string.
``__spark_entry__.py`` exposes these to the driver harness.

Determinism contract (SURVEY §7.3 item 3): floating-point aggregates
must hash-match DuckDB's, so sums over doubles go through an exact
DECIMAL accumulator (order-independent) and are cast back to double,
and output timestamps are formatted as strings. Helpers below encode
the pattern once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB SQL equivalent
    (omit for non-SQL-expressible ops -> driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --- determinism helpers (used by both Spark exprs and oracle SQL) ---

def dsum(col_sql: str) -> str:
    """Order-independent double sum: exact decimal accumulate, then a
    single deterministic cast back to double. Identical semantics in
    Spark SQL and DuckDB, so values hash-match bit-for-bit."""
    return f"CAST(SUM(CAST({col_sql} AS DECIMAL(38,6))) AS DOUBLE)"


def davg(col_sql: str) -> str:
    """Order-independent double mean: exact decimal sum / count."""
    return f"CAST(SUM(CAST({col_sql} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({col_sql})"
