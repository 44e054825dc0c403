"""MERGE INTO / upsert emulation (no Delta/Iceberg jars in this image):
anti-join + union — the engine-level CDC/upsert surface, generalizing
O19's append-only load into keyed upserts (SURVEY §7.0.3's dedup-keyed
append is the streaming cousin of this operator).

Pattern (public 'MERGE without ACID tables' idiom):
  updated  = target MATCHED by key  -> replaced by source row
  retained = target NOT MATCHED     -> kept as-is (anti join)
  inserted = source NOT MATCHED     -> appended
Snapshot = retained UNION source. One shuffle per side on the key;
with both sides bucketed on the key it is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """WHEN MATCHED THEN UPDATE (full-row) / WHEN NOT MATCHED THEN
    INSERT, as a snapshot. Schemas must match by name."""
    retained = target.join(source.select(key), key, "left_anti")
    return retained.unionByName(source.select(*target.columns))


def scd2_apply(history: DataFrame, changes: DataFrame, key: str,
               version_col: str = "version",
               current_col: str = "is_current") -> DataFrame:
    """Slowly-changing-dimension type 2: append changed rows as new
    versions, close out the previous current row. Deterministic
    version numbers (max+1 per key) instead of wall-clock times."""
    cur_ver = history.groupBy(key).agg(F.max(version_col).alias("_maxv"))
    versioned = (changes.join(cur_ver, key, "left")
                 .withColumn(version_col, F.coalesce(F.col("_maxv") + 1, F.lit(1)))
                 .drop("_maxv")
                 .withColumn(current_col, F.lit(True)))
    # close-out via join marker, never a driver-side key list
    changed = changes.select(key).distinct().withColumn("_chg", F.lit(True))
    closed = (history.join(changed, key, "left")
              .withColumn(current_col,
                          F.when(F.col("_chg").isNotNull(), F.lit(False))
                          .otherwise(F.col(current_col)))
              .drop("_chg")
              .select(*history.columns))
    return closed.unionByName(versioned)


@query(
    "merge_upsert_snapshot",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(c_acctbal + 1000.0, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, concat('New#', c_name), c_nationkey,
             0.0, 'NEWSEG'
      FROM customer WHERE c_custkey <= 50
    )
    SELECT * FROM source
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
    """,
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation over customer: every 10th customer updated
    (+1000 balance), 50 new rows inserted; snapshot oracle-checked
    against the equivalent set-SQL."""
    c = load_table(spark, sf_dir, "customer")
    updates = (c.filter(F.col("c_custkey") % 10 == 0)
               .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 1000.0, 2)))
    inserts = (c.filter(F.col("c_custkey") <= 50)
               .select((F.col("c_custkey") + 1000000).alias("c_custkey"),
                       F.concat(F.lit("New#"), F.col("c_name")).alias("c_name"),
                       "c_nationkey",
                       F.lit(0.0).alias("c_acctbal"),
                       F.lit("NEWSEG").alias("c_mktsegment")))
    source = updates.unionByName(inserts)
    return merge_upsert(c, source, "c_custkey")


@query(
    "scd2_versions",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_acctbal, 1 AS version, (c_custkey % 5 <> 0) AS is_current
      FROM customer
    ), changes AS (
      SELECT c_custkey, round(c_acctbal * 2, 2) AS c_acctbal, 2 AS version,
             TRUE AS is_current
      FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT * FROM base UNION ALL SELECT * FROM changes
    """,
)
def scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 shape over customer: every 5th customer gets a v2 row, its
    v1 row closed out — history + current flags, all deterministic."""
    c = load_table(spark, sf_dir, "customer")
    history = (c.select("c_custkey", "c_acctbal")
               .withColumn("version", F.lit(1))
               .withColumn("is_current", F.lit(True)))
    changes = (c.filter(F.col("c_custkey") % 5 == 0)
               .select("c_custkey",
                       F.round(F.col("c_acctbal") * 2, 2).alias("c_acctbal")))
    changed_keys = F.col("c_custkey") % 5 == 0
    closed = history.withColumn(
        "is_current", F.when(changed_keys, F.lit(False)).otherwise(F.col("is_current")))
    v2 = (changes.withColumn("version", F.lit(2))
          .withColumn("is_current", F.lit(True)))
    return closed.unionByName(v2)
