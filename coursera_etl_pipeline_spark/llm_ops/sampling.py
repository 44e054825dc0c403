"""Training-corpus sampling and packing operators.

Both are deterministic by construction — no RNG state, no
partition-order dependence — which is what a reproducible 100 TB data
pipeline actually wants (re-running a sample job must select the SAME
documents), and what lets them run under the DuckDB value-hash oracle.

  - hash-bucket sampling: a keyed md5 bucket in [0, 100) with a
    per-stratum rate — the standard "downsample the dominant language"
    curation step. Pure map-side filter: no shuffle, no sort, and the
    selection is stable under repartitioning/retries (unlike
    df.sample(), whose Bernoulli draw depends on partition layout).
  - sequence packing: assign consecutive docs (per source shard) to
    fixed token-budget packs via a running token sum — the standard
    pre-tokenization packing pass. One window per shard, no global
    sort: partitionBy(source) keeps the window parallel at corpus
    scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query

# per-language keep-rate out of 100 (downsample the dominant stratum)
SAMPLE_RATES = {"en": 20, "default": 60}
PACK_BUDGET = 2048  # tokens per pack


def hash_bucket(col) -> F.Column:
    """Deterministic bucket in [0, 100): first 8 md5 hex chars of the
    key, mod 100 — identical in DuckDB, stable across engines/runs."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 100)


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE WHEN lang = 'en' THEN {SAMPLE_RATES['en']}
                 ELSE {SAMPLE_RATES['default']} END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: keep 20% of English docs and
    60% of everything else, selected by id-hash bucket. Reproducible
    and shuffle-free — the curation primitive for rebalancing a
    training corpus."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(SAMPLE_RATES["en"])) \
            .otherwise(F.lit(SAMPLE_RATES["default"]))
    return d.filter(hash_bucket(F.col("doc_id")) < rate).select("doc_id", "lang")


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), cum AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tok
      FROM toks
    )
    SELECT source, doc_id, n_tok,
           CAST(floor((cum_tok - n_tok) / {PACK_BUDGET}) AS BIGINT) AS pack_id
    FROM cum
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: consecutive docs within each source shard are
    assigned to {PACK_BUDGET}-token packs by their running token count
    (pack = floor(tokens-before-this-doc / budget)). Windows partition
    by source, so packing parallelizes across shards at corpus scale
    instead of forcing one global sort."""
    d = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = d.select(
        "source", "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"))
    return (
        toks.withColumn("cum_tok", F.sum("n_tok").over(w))
        .select("source", "doc_id", "n_tok",
                F.floor((F.col("cum_tok") - F.col("n_tok")) / PACK_BUDGET)
                .cast("bigint").alias("pack_id"))
    )
