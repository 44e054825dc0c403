"""Data-quality audit operator.

Generalizes the reference's response validation (O2,
extract-service/main.py:144-161 — crash on error/empty payload) from
one HTTP payload to TABLE-level expectations, the shape a warehouse
load actually needs (the reference delegates this entirely to BigQuery
load-job failures): null counts on required columns, key uniqueness,
domain membership, referential integrity. One row per check —
`(check_name, metric, passed)` — so a pipeline can gate on
`passed = false` rows exactly as O2 gates on a bad payload.

Scale shape: the column expectations compute in ONE pass over the
fact table (a single multi-aggregate — no per-check scans), and the
referential check is one anti-join on the key; the final assembly
cross-joins two 1-row aggregates (broadcast, O(1)) and unpivots with
`stack`. Nothing here collects to the driver; at 100 TB the same plan
is one scan + one shuffle-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query

ORDER_STATUSES = ("O", "F", "P")


def dq_audit(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Seven expectations over an orders/customer pair. Factored from
    the registered query so tests can feed deliberately-corrupted
    frames and watch the right check fail (a DQ operator whose checks
    never fire is worse than none)."""
    stats = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_key"),
        F.count_distinct(F.col("o_orderkey")).alias("n_key_d"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint").alias("n_badprice"),
        # NULL counts as out-of-domain: when(isin, 0).otherwise(1)
        # routes both FALSE and NULL isin results to 1
        F.sum(F.when(F.col("o_orderstatus").isin(*ORDER_STATUSES), 0)
              .otherwise(1)).cast("bigint").alias("n_badstatus"),
        F.sum(F.col("o_orderdate").isNull().cast("int"))
        .cast("bigint").alias("n_nulldate"),
    )
    orphans = (
        orders.select("o_custkey")
        .join(customer.select("c_custkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan")))
    wide = stats.crossJoin(F.broadcast(orphans))
    return wide.selectExpr("""stack(7,
        'row_count', n_rows, n_rows > 0,
        'orderkey_nulls', n_rows - n_key, n_rows - n_key = 0,
        'orderkey_dups', n_key - n_key_d, n_key - n_key_d = 0,
        'custkey_orphans', n_orphan, n_orphan = 0,
        'totalprice_nonpositive', n_badprice, n_badprice = 0,
        'orderstatus_out_of_domain', n_badstatus, n_badstatus = 0,
        'orderdate_nulls', n_nulldate, n_nulldate = 0
      ) as (check_name, metric, passed)""")


@query(
    "dq_audit_orders",
    # DuckDB integer SUM widens to HUGEINT (the r9 similarity-bucket
    # lesson), so every metric is CAST BIGINT in the outer select to
    # match Spark's type under the driver's value hash.
    oracle=f"""
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(o_orderkey) AS n_key,
             count(DISTINCT o_orderkey) AS n_key_d,
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS n_badprice,
             sum(CASE WHEN o_orderstatus IN {ORDER_STATUSES!r} THEN 0
                      ELSE 1 END) AS n_badstatus,
             sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS n_nulldate
      FROM orders
    ), r AS (
      SELECT count(*) AS n_orphan FROM orders o
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT check_name, CAST(metric AS BIGINT) AS metric, passed FROM (
      SELECT 'row_count' AS check_name, n_rows AS metric,
             n_rows > 0 AS passed FROM s
      UNION ALL SELECT 'orderkey_nulls', n_rows - n_key,
             n_rows - n_key = 0 FROM s
      UNION ALL SELECT 'orderkey_dups', n_key - n_key_d,
             n_key - n_key_d = 0 FROM s
      UNION ALL SELECT 'custkey_orphans', n_orphan, n_orphan = 0 FROM r
      UNION ALL SELECT 'totalprice_nonpositive', n_badprice,
             n_badprice = 0 FROM s
      UNION ALL SELECT 'orderstatus_out_of_domain', n_badstatus,
             n_badstatus = 0 FROM s
      UNION ALL SELECT 'orderdate_nulls', n_nulldate,
             n_nulldate = 0 FROM s
    )
    """,
)
def dq_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DQ expectation suite over the orders table: row count,
    required-column nulls, key uniqueness, price positivity, status
    domain (NULL counts as out-of-domain), and orders->customer
    referential integrity. The oracle recomputes every metric in SQL,
    so the driver hash certifies metric values AND pass verdicts."""
    return dq_audit(load_table(spark, sf_dir, "orders"),
                    load_table(spark, sf_dir, "customer"))


def dq_audit_documents(docs: DataFrame) -> DataFrame:
    """Corpus-hygiene expectations over an LLM documents table — the
    checks a training-data pipeline gates ingest on: identity (key
    nulls/dups), content (empty or non-ASCII text), metadata
    consistency (n_chars must equal the text's length — stale metadata
    silently corrupts length-stratified sampling), and exact-duplicate
    rate (md5 fingerprint, the dedup_exact measure). One pass, one
    multi-aggregate; no joins at all."""
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("doc_id").alias("n_key"),
        F.count_distinct(F.col("doc_id")).alias("n_key_d"),
        F.sum(F.when(F.col("text").isNull() | (F.col("text") == ""), 1)
              .otherwise(0)).cast("bigint").alias("n_empty"),
        F.sum(F.when(F.octet_length("text") != F.length("text"), 1)
              .otherwise(0)).cast("bigint").alias("n_nonascii"),
        F.sum(F.when(F.col("n_chars") != F.length("text"), 1)
              .otherwise(0)).cast("bigint").alias("n_meta_bad"),
        # distinct over NON-EMPTY texts only: an empty string's md5 is
        # a real value, and counting it here while its rows sit in
        # n_empty would understate the dup metric by one
        F.count_distinct(
            F.when(F.col("text").isNotNull() & (F.col("text") != ""),
                   F.md5(F.col("text")))).alias("n_text_d"),
    )
    return stats.selectExpr("""stack(7,
        'row_count', n_rows, n_rows > 0,
        'doc_id_nulls', n_rows - n_key, n_rows - n_key = 0,
        'doc_id_dups', n_key - n_key_d, n_key - n_key_d = 0,
        'empty_text', n_empty, n_empty = 0,
        'non_ascii_text', n_nonascii, n_nonascii = 0,
        'n_chars_metadata_mismatch', n_meta_bad, n_meta_bad = 0,
        'exact_dup_texts', n_rows - n_empty - n_text_d,
            n_rows - n_empty - n_text_d = 0
      ) as (check_name, metric, passed)""")


@query(
    "dq_audit_documents",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(doc_id) AS n_key,
             count(DISTINCT doc_id) AS n_key_d,
             sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
               AS n_empty,
             sum(CASE WHEN octet_length(encode(text)) <> length(text)
                      THEN 1 ELSE 0 END) AS n_nonascii,
             sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
               AS n_meta_bad,
             count(DISTINCT CASE WHEN text IS NOT NULL AND text <> ''
                                 THEN md5(text) END) AS n_text_d
      FROM documents
    )
    SELECT check_name, CAST(metric AS BIGINT) AS metric, passed FROM (
      SELECT 'row_count' AS check_name, n_rows AS metric,
             n_rows > 0 AS passed FROM s
      UNION ALL SELECT 'doc_id_nulls', n_rows - n_key,
             n_rows - n_key = 0 FROM s
      UNION ALL SELECT 'doc_id_dups', n_key - n_key_d,
             n_key - n_key_d = 0 FROM s
      UNION ALL SELECT 'empty_text', n_empty, n_empty = 0 FROM s
      UNION ALL SELECT 'non_ascii_text', n_nonascii, n_nonascii = 0 FROM s
      UNION ALL SELECT 'n_chars_metadata_mismatch', n_meta_bad,
             n_meta_bad = 0 FROM s
      UNION ALL SELECT 'exact_dup_texts', n_rows - n_empty - n_text_d,
             n_rows - n_empty - n_text_d = 0 FROM s
    )
    """,
)
def dq_audit_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DQ suite over the documents table. NULL/empty texts
    are excluded from the exact-dup metric (their md5 is NULL /
    shared-empty, which would double-count the emptiness check).
    Non-ASCII is a first-class check because two certified operators
    (multimodal_frame_sample's char-slice oracle, the byte-level
    fingerprints) assume the fixture's ASCII purity — a regeneration
    that breaks it shows up HERE as a failed expectation on both
    engines, with the metric naming how many docs broke it."""
    return dq_audit_documents(load_table(spark, sf_dir, "documents"))
