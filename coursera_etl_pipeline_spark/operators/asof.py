"""As-of join: for each left row, the latest right row with
right_ts <= left_ts per key — the operator Spark lacks natively
(SURVEY §2.2 joins note).

Implementation is the UNION-tag trick, not a per-group merge_asof:
tag both inputs, union them, and take last_value(right attrs,
ignorenulls) over (key ORDER BY ts, tag) — one shuffle on the key,
sorted once, O(n log n) total, no per-key Python. This is the form
that survives 100 TB; pandas merge_asof per group (applyInPandas)
would ship every group through Arrow and die on skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str, right_ts: str,
              right_values: list[str]) -> DataFrame:
    """Backward as-of join (latest right at-or-before each left row).

    Ties on timestamp resolve to the right row (tag 0 sorts before the
    left's tag 1), matching ASOF JOIN's <= semantics.
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_lv_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_values],
        *[F.col(c).alias(f"_lv_{c}") for c in lcols],
    )
    w = (W.partitionBy("_k").orderBy("_ts", "_tag")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = tagged_r.unionByName(tagged_l).select(
        "*",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
          for c in right_values],
    )
    return (filled.filter(F.col("_tag") == 1)
            .select(*[F.col(f"_lv_{c}").alias(c) for c in lcols],
                    *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_values]))


@query(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S')  AS event_ts,
           p.event_id                            AS asof_event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S')  AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'error')      e
    ASOF LEFT JOIN
         (SELECT * FROM events WHERE event_type = 'purchase')   p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each error event paired with the user's latest purchase at or
    before it (DuckDB's native ASOF JOIN is the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error") \
               .select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select(F.col("event_id").alias("p_event_id"),
                          "user_id", F.col("ts").alias("p_ts"))
    joined = asof_join(errors, purchases, on="user_id",
                       left_ts="ts", right_ts="p_ts",
                       right_values=["p_event_id", "p_ts"])
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.col("asof_p_event_id").alias("asof_event_id"),
        F.date_format("asof_p_ts", "yyyy-MM-dd HH:mm:ss").alias("asof_ts"),
    )
