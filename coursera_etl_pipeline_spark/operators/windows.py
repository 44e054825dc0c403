"""Window functions: ranking, analytic, aggregates over row/range frames.

SURVEY §2.2 "Window functions": absent in the reference except O9's
latest-partition argmax (max over blob names, transform-service/
main.py:89), which generalizes to row_number() OVER (ORDER BY key
DESC) = 1 — implemented here as `window_latest_per_key`.

Scale note: every window here partitions by a key (one shuffle on the
partition key, then a per-partition sort). Windows with no
PARTITION BY collapse to a single task — avoided except on
pre-aggregated (small) inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist()    OVER w, 9) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    )


@query(
    "window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(wfull).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@query(
    "window_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)         AS moving3_spend,
           COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)            AS order_seq
    FROM orders
    """,
)
def window_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving aggregates with ROWS frames. Sums go through the
    decimal accumulator so the running values hash-match the oracle."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(38,6)")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(dec).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double").alias("running_spend"),
        F.sum(dec).over(w.rowsBetween(-2, W.currentRow))
        .cast("double").alias("moving3_spend"),
        F.count(F.lit(1)).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("order_seq"),
    )


@query(
    "window_frame_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice
              RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper
    FROM orders WHERE o_custkey <= 300
    """,
)
def window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric order key: peers within a value band,
    not a row count (frame bounds are value offsets)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w = (W.partitionBy("o_custkey").orderBy("o_totalprice")
         .rangeBetween(-50000, W.currentRow))
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
    )


@query(
    "window_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
    FROM (
      SELECT *, row_number() OVER
        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 generalized (latest-partition argmax, transform-service/
    main.py:89): latest event per user via row_number()=1. At scale this
    is the dedup-to-latest pattern — one shuffle on the key; AQE handles
    skewed users.

    Measured negative result (round 6, 10M-row replica): the tempting
    `max_by(struct(...), struct(ts, event_id))` hash-aggregate form is
    5.4x SLOWER (5.1 s vs 0.94 s) — struct aggregation buffers are not
    UnsafeRow-mutable, so Spark plans SortAggregate on BOTH the partial
    and final stages, sorting all rows twice and forfeiting the
    map-side-combine advantage the rewrite was meant to buy. The
    sort-window below is the right physical plan until HashAggregate
    supports struct buffers.

    Second measured negative (round 7, 10M-row replica): the all-hash
    two-phase argmax (max(ts) per user -> broadcast-join filter ->
    max(event_id) tiebreak -> join back) is 3.6x slower (2.76 s vs
    0.76 s) — it re-scans the fact three times and broadcasts a
    |users|-sized table twice to save one per-partition sort that is
    cheaper than either. The single sort-window pass remains the right
    plan at every measured scale.

    Third measured negative (round 8, same replica): the semi-join
    argmax (groupBy max(ts) -> left_semi on (user_id, ts) -> tiny
    tie-break window) is 2.2x slower (2.19 s vs 1.01 s) — it trades
    the map-side sort for a full shuffle of the fact plus a second
    scan, and the sort was the cheaper of the two. Note the
    'rankLimit-style pre-filter' idea is ALREADY in this plan:
    .explain shows WindowGroupLimit(row_number, 1) in Partial mode
    BEFORE the exchange, so only each map partition's per-user winners
    shuffle (~|users x partitions| rows, not |events|). The remaining
    gap to DuckDB (~2x at the 10M-row point, round-8 measurement) is
    the per-partition Sort feeding WindowGroupLimit versus DuckDB's
    hash argmax — unreachable in Spark without a struct-buffer-mutable
    HashAggregate (negative #1) and closed as an engine constant."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"))
    )
