"""Skew-mitigated join: salting, the manual fallback when AQE's
skew-join splitting isn't available (e.g. bucketed join paths or
pre-3.0 clusters). SURVEY §4.3: skewed keys are the canonical 100 TB
join hazard.

Mechanics: replicate the build side R times with salt 0..R-1; scatter
the probe side's hot keys uniformly over the R salted copies; join on
(key, salt). Row multiplication is R x |build|, shuffle skew drops by
R on the probe side. Semantics are EXACTLY an inner equi-join — the
registry entry is oracle-checked against the plain SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import dsum, query

SALT_BUCKETS = 8


def salted_join(large: DataFrame, small: DataFrame, key_large: str,
                key_small: str, n_salts: int = SALT_BUCKETS,
                how: str = "inner",
                salt_cols: list[str] | None = None) -> DataFrame:
    """Inner/left equi-join with the large (skewed) side salted.

    The salt on the large side must be DETERMINISTIC per row (so task
    retries recompute the same shuffle) yet spread uniformly WITHIN a
    key — correctness never depends on which salt a row gets, only
    that it matches exactly one replica of the small side. Pass
    `salt_cols` naming a per-row identity (e.g. the natural key) to
    hash just those; default hashes the whole row, which is correct
    but moves every column through the hash."""
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*(salt_cols or large.columns)),
                        F.lit(n_salts)).cast("int"))
    replicas = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (salted_large.join(
        replicas,
        (salted_large[key_large] == replicas[key_small])
        & (salted_large["_salt"] == replicas["_salt"]),
        how)
        .drop("_salt"))


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {dsum('l_extendedprice')} AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted lineitem x orders — byte-identical result to the plain
    join (the oracle IS the plain join), different shuffle shape."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(li, o, "l_orderkey", "o_orderkey",
                         salt_cols=["l_orderkey", "l_linenumber"])
    return (joined.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr(dsum("l_extendedprice")).alias("total")))
