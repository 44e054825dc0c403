"""Subquery forms: scalar, IN, EXISTS/NOT EXISTS (correlated),
HAVING, and unpivot — the query surface a warehouse user expects
(generalizing O20's SQL layer, README.md:134).

Catalyst decorrelates these into joins (scalar subquery -> broadcast
of a 1-row aggregate; IN/EXISTS -> semi joins) — asserted by the fact
that the same plans pass the oracle and carry no per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table, views
from coursera_etl_pipeline_spark.registry import dsum, dsum_micros, query


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS dev_from_mean
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: the 1-row aggregate broadcasts; no per-row
    recomputation. avg(double) is safe here because both engines
    compute the identical single global mean (one partial order)."""
    views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS dev_from_mean
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    """)


@query(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "orders", "customer", "lineitem")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """)


@query(
    "subquery_exists_correlated",
    oracle=f"""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > c.c_acctbal * 40)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'P')
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a cross-table predicate + anti EXISTS —
    decorrelated by Catalyst into semi/anti joins (no nested loops)."""
    views(spark, sf_dir, "orders", "customer")
    return spark.sql("""
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > c.c_acctbal * 40)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
    """)


@query(
    "agg_having",
    oracle=f"""
    SELECT l_suppkey, COUNT(*) AS n_items, {dsum('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 600 AND {dsum_micros('l_quantity')} > 15000000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over an exact sum. The threshold compares the SAME
    micro-unit DECIMAL(38,0) partial that feeds total_qty (in exact
    integer units: 15000 qty = 15e9 micros), so the whole aggregate
    has one accumulation regime — the per-row DECIMAL(38,6) cast that
    previously existed only for the threshold (the exact
    Double.toString cost the round-7 dsum rewrite removed everywhere
    else) is gone, and Catalyst shares the partial between the output
    column and the predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.expr(dsum("l_quantity")).alias("total_qty"),
             F.expr(dsum_micros("l_quantity")).alias("_dqm"))
        .filter((F.col("n_items") > 600)
                & (F.col("_dqm") > F.lit(15_000_000_000)))
        .drop("_dqm")
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ) WHERE c_custkey <= 100
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): wide columns -> (metric, value) rows —
    a narrow per-row expansion, no shuffle."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.expr("stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))")
        .alias("metric", "val"),
    )


@query(
    "agg_approx",
    # The sketch VALUES are engine-specific (HLL++/KLL internals), so
    # the hash-checkable contract is the error bound: the oracle pins
    # the exact distinct count and expects every within-tolerance flag
    # to be TRUE — a sketch drifting out of tolerance fails the
    # value-hash gate loudly (same pattern as agg_approx_bounds).
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS cd_within_10pct,
           TRUE AS median_within_5pct,
           TRUE AS p25_within_5pct,
           TRUE AS p75_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HyperLogLog++ distinct, quantile sketch)
    — the sketches every 100 TB profile job leans on. One sketch pass
    computes the median AND the IQR quantiles (array-form
    percentile_approx); the exact counterparts ride the same shuffle.
    Emitted as within-error-bound booleans plus the exact distinct
    count as a hash anchor, because the raw sketch values differ
    across engines. agg_approx_bounds keeps the narrower
    count+median contract; this entry certifies the array-form
    quantile sketch as well."""
    li = load_table(spark, sf_dir, "lineitem")
    iqr = F.percentile_approx("l_extendedprice", F.array(F.lit(0.25), F.lit(0.75)))
    per_flag = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("exact_p25"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("exact_p75"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
        iqr.getItem(0).alias("approx_p25"),
        iqr.getItem(1).alias("approx_p75"),
    )

    def _within(approx: str, exact: str, tol: float) -> F.Column:
        return F.abs(F.col(approx) - F.col(exact)) <= tol * F.abs(F.col(exact))

    return per_flag.select(
        "l_returnflag", "exact_parts",
        _within("approx_parts", "exact_parts", 0.10).alias("cd_within_10pct"),
        _within("approx_median", "exact_median", 0.05).alias("median_within_5pct"),
        _within("approx_p25", "exact_p25", 0.05).alias("p25_within_5pct"),
        _within("approx_p75", "exact_p75", 0.05).alias("p75_within_5pct"),
    )


@query(
    "agg_approx_bounds",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS cd_within_10pct,
           TRUE AS median_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable contract for the approximate aggregates: the
    sketches themselves are engine-specific (agg_approx stays
    rows-only), but their ERROR BOUNDS are exact expectations. Emits
    the exact distinct count plus booleans asserting the HLL++ count is
    within 10% and the approx median within 5% of the exact median —
    the oracle expects TRUE, so a sketch drifting out of tolerance
    fails the value-hash gate loudly."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
    )
    return per_flag.select(
        "l_returnflag", "exact_parts",
        (F.abs(F.col("approx_parts") - F.col("exact_parts"))
         <= 0.10 * F.col("exact_parts")).alias("cd_within_10pct"),
        (F.abs(F.col("approx_median") - F.col("exact_median"))
         <= 0.05 * F.col("exact_median")).alias("median_within_5pct"),
    )


@query(
    "agg_stats_pack",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)) * CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(c_custkey AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_custkey AS DECIMAL(38,6)) * CAST(c_custkey AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(c_custkey AS DECIMAL(38,6)) * CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n,
           round(s1 / n, 6)                                    AS mean_bal,
           round((s2 - s1 * s1 / n) / (n - 1), 4)              AS var_bal,
           round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 6)        AS stddev_bal,
           round((sxy - sx * s1 / n)
                 / (sqrt(sxx - sx * sx / n) * sqrt(s2 - s1 * s1 / n)), 6) AS corr_key_bal
    FROM m
    """,
)
def agg_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean/variance/stddev/correlation)
    computed from exact decimal moments, NOT the built-in stddev/corr:
    the builtins use engine-specific streaming algorithms (Welford
    etc.) whose float results differ across engines and partition
    orders. Moment sums in DECIMAL are order-independent and
    bit-identical — the same trick registry.dsum uses, extended to
    second moments. Still one partial-agg'd shuffle."""
    c = load_table(spark, sf_dir, "customer")
    dec = lambda col: F.col(col).cast("decimal(38,6)")  # noqa: E731
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("c_acctbal")).cast("double").alias("s1"),
        F.sum(dec("c_acctbal") * dec("c_acctbal")).cast("double").alias("s2"),
        F.sum(dec("c_custkey")).cast("double").alias("sx"),
        F.sum(dec("c_custkey") * dec("c_custkey")).cast("double").alias("sxx"),
        F.sum(dec("c_custkey") * dec("c_acctbal")).cast("double").alias("sxy"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    sx, sxx, sxy = F.col("sx"), F.col("sxx"), F.col("sxy")
    return m.select(
        "c_mktsegment", "n",
        F.round(s1 / n, 6).alias("mean_bal"),
        F.round((s2 - s1 * s1 / n) / (n - 1), 4).alias("var_bal"),
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6).alias("stddev_bal"),
        F.round((sxy - sx * s1 / n)
                / (F.sqrt(sxx - sx * sx / n) * F.sqrt(s2 - s1 * s1 / n)), 6)
        .alias("corr_key_bal"),
    )
