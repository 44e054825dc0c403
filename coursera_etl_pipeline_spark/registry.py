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
    """Order-independent double sum: round each value to integer
    micro-units in pure IEEE arithmetic (mul/add/floor — identical
    bit-for-bit in Spark and DuckDB), then sum exactly in
    DECIMAL(38,0) and divide once at the end.

    Why not CAST(x AS DECIMAL(38,6)) per row (rounds 1-6): Spark's
    double->decimal cast goes through Double.toString + BigDecimal
    parse — the single largest per-row constant in every wide
    aggregate (q1 8-agg at ~sf1: 1.23 s -> 0.67 s with this form).
    The long->decimal conversion here never touches strings, and the
    map-side partial sums stay inside whole-stage codegen.

    Why not SUM(bigint) of the micros directly: ~20% faster still,
    but a bigint accumulator overflows (ANSI runtime error) at
    ~9.2e12 currency units per group — reachable near sf200 for q1's
    sum_charge. DECIMAL(38,0) holds 1e32 units per group: effectively
    unbounded at the 100 TB target, for one cheap long->decimal per
    row.

    Measured negative (round 8, 60M-row replica): splitting the
    accumulator into two overflow-safe BIGINT partials
    (hi = FLOOR(m/1e6), lo = m - hi*1e6, recombined in DECIMAL per
    group) is 2.5x FASTER on a 3-sum aggregate over SIMPLE columns
    (2.02 -> 0.80 s) but 1.9x SLOWER on the real q1 (2.36 -> 4.45 s
    interleaved): the emitted string evaluates the per-row micros
    expression ~3x (m in hi, m and hi in lo), aggregate codegen does
    NOT common-subexpression-eliminate across aggregate inputs, and
    q1's 3-factor products make each re-evaluation expensive. A
    string-level helper cannot hoist m into a pre-projection, so the
    single decimal partial stays; revisit only with a
    column-object-level helper that can inject a projection.

    Semantics note: values are rounded half-up to the 6th decimal of
    the IEEE double product, not of its shortest decimal rendering —
    for money-shaped inputs (products of <=3 two-decimal factors the
    7th decimal is exactly 0) the two agree; either way both engines
    evaluate the identical expression tree, so the hash contract
    holds by construction rather than by luck."""
    # Parenthesized so the helper composes safely inside larger
    # expressions (e.g. dsum(a) / dsum(b) in ratio queries): the
    # trailing /1000000 must bind to THIS sum only.
    return f"(CAST({dsum_micros(col_sql)} AS DOUBLE) / 1000000)"


def dsum_micros(col_sql: str) -> str:
    """The micro-unit partial underneath ``dsum``: exact DECIMAL(38,0)
    sum of half-up-rounded integer micros, BEFORE the final
    divide-back-to-double. Use it directly when a predicate compares
    the sum against a constant (HAVING SUM(x) > k becomes
    dsum_micros(x) > k*1e6): the comparison stays in exact integer
    arithmetic on both engines and skips the per-row DECIMAL(38,6)
    cast a separate threshold aggregate would reintroduce.

    The emitted string is byte-identical to the partial inside
    ``dsum`` — composing ``CAST(dsum_micros(x) AS DOUBLE)/1000000``
    reproduces dsum's output exactly, so refactors through this helper
    do not change any registered plan."""
    return (f"SUM(CAST(CAST(FLOOR(({col_sql}) * 1000000 + 0.5) AS BIGINT)"
            f" AS DECIMAL(38,0)))")


def davg(col_sql: str) -> str:
    """Order-independent double mean: exact micro-unit sum / count."""
    return f"({dsum(col_sql)} / COUNT({col_sql}))"
