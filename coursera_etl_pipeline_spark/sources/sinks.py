"""Sinks and physical-layout operators: partitioned datasets, bucketed
tables, observe() metrics.

Generalizes O6/O17/O19 (JSON/CSV/warehouse sinks) and O7's
timestamp-partition naming into real columnar layout control — the
levers that matter at 100 TB:
  - partitionBy(date/key): partition pruning turns full scans into
    single-directory reads (the engine-side version of O9's manual
    latest-file selection);
  - bucketBy(key): co-located joins — two tables bucketed on the join
    key join with ZERO shuffle;
  - observe(): streaming-safe row/sum metrics (O5's len() counts,
    extract-service/main.py:182) without a second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Hive-style partitioned dataset: one directory per partition
    value; readers with a partition predicate scan only matching
    directories (PartitionFilters in explain)."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def read_partition_pruned(spark: SparkSession, path: str,
                          fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8, mode: str = "overwrite") -> None:
    """Bucketed managed table: rows hash-distributed into n_buckets
    files by bucket_col. Joins/aggregations on bucket_col between
    co-bucketed tables skip the exchange entirely."""
    (df.write.mode(mode)
       .bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
       .format("parquet").saveAsTable(table))


def overwrite_partitions(df: DataFrame, path: str,
                         partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in df, leaving every other partition's files untouched — the
    idempotent daily-backfill primitive (re-running a day's load
    rewrites that day, never the table). Static overwrite mode would
    drop the whole dataset first; at 100 TB that difference is the
    job."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(*partition_cols)
           .format("parquet").save(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_range_clustered(df: DataFrame, path: str, cluster_col: str,
                          n_files: int = 8, mode: str = "overwrite") -> None:
    """Range-clustered layout: repartitionByRange gives each output
    file a DISJOINT value range of cluster_col, and the within-file
    sort tightens parquet row-group min/max stats. Range predicates on
    cluster_col then skip whole files/row-groups at scan time — the
    data-skipping layout (a poor man's Z-ORDER for one dimension) that
    at 100 TB decides whether a time-range query reads 1% or 100% of
    the dataset. Sampling for range boundaries costs one extra job."""
    (df.repartitionByRange(n_files, cluster_col)
       .sortWithinPartitions(cluster_col)
       .write.mode(mode).parquet(path))


def with_observed_counts(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """O5 row-count metric as a zero-cost observation riding the job
    (no second action): obs.get after the action returns the counts."""
    obs = Observation(name)
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    return observed, obs
