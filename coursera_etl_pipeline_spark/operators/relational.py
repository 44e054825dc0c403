"""Relational core: scans, filters, joins, aggregations, sorts, set ops.

Each query is a lazy DataFrame plan — Catalyst does predicate pushdown,
column pruning, and join selection; AQE re-plans at runtime. Reference
parity notes cite /root/reference file:line per SURVEY §2.

Scale notes (100 TB posture):
  - dimension joins (region/nation/supplier/part at TPC-H ratios) are
    broadcast — no shuffle of the fact table;
  - fact-fact joins (lineitem x orders) shuffle on the join key once;
    AQE coalesces/splits partitions at runtime;
  - every aggregate is partial (map-side combine) by construction —
    HashAggregateExec emits partial_sum/partial_count before exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import davg, dsum, query


# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan -> filter -> groupBy 8 aggs -> sort).
# Exercises O5 count / O20 scan semantics generalized per SURVEY §2.2;
# the canonical "would-it-scale" plan: pushdown filter, partial agg,
# single shuffle on 2 low-cardinality keys.
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity')}                                   AS sum_qty,
           {dsum('l_extendedprice')}                              AS sum_base_price,
           {dsum('l_extendedprice * (1 - l_discount)')}           AS sum_disc_price,
           {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg('l_quantity')}                                   AS avg_qty,
           {davg('l_extendedprice')}                              AS avg_price,
           {davg('l_discount')}                                   AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity")).alias("sum_qty"),
            F.expr(dsum("l_extendedprice")).alias("sum_base_price"),
            F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("sum_disc_price"),
            F.expr(dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")).alias("sum_charge"),
            F.expr(davg("l_quantity")).alias("avg_qty"),
            F.expr(davg("l_extendedprice")).alias("avg_price"),
            F.expr(davg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
