"""Interleaved A/B for the r18 map-only IVF assignment/probe rewrite.

A = r9 form: nearest-centroid and top-n_probe routing via broadcast
    cross join + row_number window — the FULL |corpus| x n_cells
    expansion (each row carrying the embedding vector) is shuffled so
    each row can pick its own maximum
B = r18 form (what similarity.assign_to_centroids now is): transform()
    + array_max()/array_sort() over ONE broadcast centroid-array row —
    zero exchange; same cosine expression, same tie-break

Arms run the registered similarity_ann_ivf and similarity_index_update
queries end to end; equality asserted per run via count + xxhash64
checksum (the oracle gate separately certifies vs DuckDB).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window as W

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("AB_CYCLES", "5"))


def _checksum(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")).collect()[0]
    return row["n"], row["h"]


def assign_A(emb, centroids, vec_col="embedding"):
    from coursera_etl_pipeline_spark.llm_ops.similarity import cosine

    w = W.partitionBy("vec_id").orderBy(F.desc("sim_to_centroid"), F.asc("cell_id"))
    return (emb.crossJoin(F.broadcast(centroids))
            .withColumn("sim_to_centroid", cosine(vec_col, "cv"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", vec_col, "cell_id"))


def build_arms(spark):
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops import similarity as S

    emb = load_table(spark, SF_DIR, "embeddings")
    n_cells, n_probe, k, n_queries = S.N_CELLS, S.N_PROBE, S.TOP_K, S.N_QUERIES
    centroids = (emb.orderBy("vec_id").limit(n_cells)
                 .select(F.col("vec_id").alias("cell_id"),
                         F.col("embedding").alias("cv")))

    def ann_with(assign_fn, probes_fn):
        assigned = assign_fn(emb, centroids)
        queries = (emb.filter(F.col("vec_id") < n_queries)
                   .select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qv")))
        probes = probes_fn(queries)
        w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        return (probes.join(assigned.select(F.col("vec_id").alias("neighbor_id"),
                                            F.col("embedding").alias("nv"), "cell_id"),
                            "cell_id")
                .filter(F.col("query_id") != F.col("neighbor_id"))
                .withColumn("sim", S.cosine("qv", "nv"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("sim", 6).alias("sim")))

    def probes_A(queries):
        wprobe = W.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cell_id"))
        return (queries.crossJoin(F.broadcast(centroids))
                .withColumn("csim", S.cosine("qv", "cv"))
                .withColumn("rk", F.row_number().over(wprobe))
                .filter(F.col("rk") <= n_probe)
                .select("query_id", "qv", "cell_id"))

    def probes_B(queries):
        return (queries.crossJoin(S._collect_centroids(centroids))
                .withColumn("_top", F.slice(
                    F.reverse(F.array_sort(S._scored_cells("qv"))), 1, n_probe))
                .select("query_id", "qv",
                        F.explode(F.col("_top.cell_id")).alias("cell_id")))

    def update_with(assign_fn):
        is_batch = (F.col("vec_id") % 10) == 0
        assigned_t = assign_fn(emb.filter(~is_batch), centroids)
        appended = assigned_t.unionByName(
            assign_fn(emb.filter(is_batch), centroids))
        return appended.select("vec_id", "cell_id")

    return {
        "A": {"ann": lambda: ann_with(assign_A, probes_A),
              "upd": lambda: update_with(assign_A)},
        "B": {"ann": lambda: ann_with(S.assign_to_centroids, probes_B),
              "upd": lambda: update_with(S.assign_to_centroids)},
    }


def main() -> None:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    arms = build_arms(spark)
    for part in ("ann", "upd"):
        ca, cb = _checksum(arms["A"][part]()), _checksum(arms["B"][part]())
        assert ca == cb, f"{part}: A {ca} != B {cb}"
        print(f"equal {part}: n={ca[0]}")
    times = {"A": [], "B": []}
    jobs = {"A": [], "B": []}
    for cyc in range(CYCLES):
        for arm in ("A", "B") if cyc % 2 == 0 else ("B", "A"):
            group = f"ab_ivf_{arm}_{cyc}"
            sc.setJobGroup(group, group)
            t0 = time.monotonic()
            for part in ("ann", "upd"):
                arms[arm][part]().write.format("noop").mode("overwrite").save()
            times[arm].append(round(time.monotonic() - t0, 3))
            jobs[arm].append(len(sc.statusTracker().getJobIdsForGroup(group)))
    for arm in ("A", "B"):
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {times[arm]} jobs {jobs[arm]}")


if __name__ == "__main__":
    main()
