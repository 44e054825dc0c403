"""Table catalog: parquet datasets -> DataFrames + temp views.

The reference treats "a table" as a prefix-named set of objects on GCS
(transform-service/main.py:84-88); here a table is a parquet dataset
path. Loading registers temp views so both the DataFrame API and
spark.sql() address the same relations — one catalog, two surfaces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One table: a vectorized parquet scan with pushdown/pruning free
    via Catalyst (PushedFilters/ReadSchema in .explain).

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    default; read it as nanos-since-epoch (legacy conf) and convert to
    a microsecond TimestampType — floor division, matching DuckDB's
    ns->us truncation, so oracle values stay bit-identical.

    Session timezone is pinned to UTC here (runtime-settable) so
    timestamp formatting matches the DuckDB oracle even when the
    caller's SparkSession (e.g. the driver harness) didn't set it."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        # integer div — float division would lose precision on 1.7e18 ns
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(table_path(sf_dir, name))


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named tables as temp views (for spark.sql queries).

    Re-registration is idempotent and schema-only; queries re-register
    per call so the same session can serve multiple sf_dirs."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load every fixture table present under sf_dir and register each
    as a temp view (idempotent; cheap — schema-only until an action)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
