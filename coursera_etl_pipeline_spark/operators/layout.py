"""Data-layout optimization: the Z-order (Morton) clustering key.

Round-20 pre-build (r18 extended session): the multi-dimensional
clustering verb every lakehouse exposes (Delta OPTIMIZE ZORDER BY,
Iceberg's sort-order z-order — both public designs built on the
Morton curve, Morton 1966): interleave the bits of two key columns so
that sorting by the single z value co-locates rows that are close in
BOTH dimensions, which is what lets parquet row-group min/max stats
prune a two-predicate scan that a single-column sort can only prune
on its leading key. The KEY COMPUTATION is certified here — pure
64-bit integer bit arithmetic, bit-identical on both engines; the
write path is ordinary `df.sort(z).write.parquet` (the engine's
existing sinks), so no new writer is needed. Registration deferred to
round 20; pinned registry name `layout_zorder_key`.

At 100 TB: the z projection is map-only (no shuffle of its own); the
layout rewrite it feeds is one range-partitioned sort — the same
one-shuffle cost as any global sort, paid once at write time to make
every later multi-dimensional scan prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table

ZORDER_BITS = 16


def _interleave_sql(a: str, b: str, bits: int, shl: str, shr: str) -> str:
    """The bit-interleave as one integer expression: z = sum over i of
    (bit i of a) << 2i  |  (bit i of b) << 2i+1. Emitted as a SUM of
    shift/mask terms so the identical arithmetic renders in Spark SQL
    (shiftleft/shiftright functions) and DuckDB (<< >> operators) —
    the `shl`/`shr` format strings carry the dialect."""
    terms = []
    for i in range(bits):
        terms.append(shl.format(x=f"({shr.format(x=a, n=i)} & 1)",
                                n=2 * i))
        terms.append(shl.format(x=f"({shr.format(x=b, n=i)} & 1)",
                                n=2 * i + 1))
    return " + ".join(terms)


def zorder_key(df: DataFrame, c1: str, c2: str,
               bits: int = ZORDER_BITS) -> DataFrame:
    """Append `z`: the Morton interleave of the low `bits` bits of the
    two key columns (values masked into [0, 2^bits) first — at
    production scale the inputs would be rank-buckets, but the
    interleave itself is the certified arithmetic either way)."""
    mask = (1 << bits) - 1
    a = f"(CAST({c1} AS BIGINT) & {mask})"
    b = f"(CAST({c2} AS BIGINT) & {mask})"
    z = _interleave_sql(a, b, bits,
                        shl="shiftleft({x}, {n})",
                        shr="shiftright({x}, {n})")
    return df.withColumn("z", F.expr(z).cast("bigint"))


def layout_zorder_key_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The future `layout_zorder_key` registry callable (deferred to
    r20): the z key over lineitem's (l_partkey, l_suppkey) — the pair
    a part/supplier-predicated scan (q16/q20's shape) would cluster
    by. Map-only; row identity carried by (l_orderkey, l_linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (zorder_key(li, "l_partkey", "l_suppkey")
            .select("l_orderkey", "l_linenumber",
                    "l_partkey", "l_suppkey", "z"))


def r20_layout_zorder_key_oracle() -> str:
    """DuckDB oracle: the identical shift/mask sum with native
    operators (parenthesized per term — << binds looser than + in
    DuckDB's grammar, so each term is wrapped)."""
    mask = (1 << ZORDER_BITS) - 1
    a = f"(CAST(l_partkey AS BIGINT) & {mask})"
    b = f"(CAST(l_suppkey AS BIGINT) & {mask})"
    z = _interleave_sql(a, b, ZORDER_BITS,
                        shl="(({x}) << {n})",
                        shr="(({x}) >> {n})")
    return f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({z} AS BIGINT) AS z
    FROM lineitem
    """
