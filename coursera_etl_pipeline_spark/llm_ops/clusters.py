"""Duplicate-cluster resolution: near-dup PAIRS -> connected
components -> one canonical survivor per cluster.

The iterative-algorithm class (SURVEY §5.2 item 5: non-SQL-expressible
ops): min-label propagation to a fixed point. Each iteration is one
self-join + one aggregate — a bounded number of shuffles (components
from near-dup pairs are shallow: label distance halves each round, so
iterations ~ log(diameter), and duplicate clusters are almost always
diameter <= 3).

At 100 TB this is the standard large-scale connected-components
pattern (alternating small/large-star joins); the loop persists each
frontier (unpersisting the stale one) so every iteration reads a
materialized parent instead of replaying the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import query


def connected_components(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """(doc_a, doc_b) undirected pairs -> (doc_id, component) where
    component = min doc_id reachable. Label propagation:
    component[v] = min(component[v], min over neighbors) to fixpoint."""
    edges = (pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
             .distinct().persist())
    labels = (edges.select(F.col("src").alias("doc_id"))
              .distinct().withColumn("component", F.col("doc_id")))

    prev = None
    for _ in range(max_iter):
        # neighbor's current label, folded into each node's label
        neighbor_min = (
            edges.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
            .groupBy("src").agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("src", "doc_id")
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select("doc_id",
                    F.least("component", F.coalesce("nbr_min", "component"))
                    .alias("component"))
            .persist()  # evictable frontier cache; lineage stays intact
        )
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        if prev is not None:
            prev.unpersist()  # stale frontier: new one is materialized
        prev, labels = labels, new_labels
        if changed == 0:
            break
    return labels


def dedup_survivors(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Full survivor set: docs minus every non-canonical member of a
    duplicate cluster (canonical = min doc_id in the component)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


@query("dedup_clusters")  # rows-only: iterative, not single-statement SQL
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the documents table: jaccard pairs ->
    components -> (component, size, member ids). Completes the dedup
    story: pairs are diagnostics, clusters are what you delete by."""
    from coursera_etl_pipeline_spark.llm_ops.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"),
             F.sort_array(F.collect_list("doc_id")).alias("members"))
        .filter(F.col("cluster_size") >= 2)
        .select("component", "cluster_size",
                F.array_join(F.transform("members", lambda m: m.cast("string")), ",")
                .alias("member_ids"))
    )
