"""Interleaved A/B/C for the connected-components star rounds (r18
optimization): which per-round form is fastest on the real LSH pair
graph, weather-cancelled by alternating arms in one session.

A = r17 groupBy+join-back rounds (AQE broadcasts the tiny mins side)
B = window min-over-partition rounds (one exchange carries the rows)
C = groupBy+join-back, but small-star emits relink/self edges via one
    explode instead of unioning two projections of the join subtree

All three compute identical edge sets per round (distinct-bounded);
equality is asserted on the final labels each cycle.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("AB_CYCLES", "5"))


def large_A(edges):
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (sym.join(mins, "u").filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")).distinct())


def small_A(edges):
    canon = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    joined = canon.join(mins, "u")
    relinked = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfed = joined.select("u", F.col("m").alias("v"))
    return relinked.union(selfed).filter(F.col("u") != F.col("v")).distinct()


def large_B(edges):
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
    return (sym.withColumn("m", m).filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")).distinct())


def small_B(edges):
    canon = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = F.min("v").over(W.partitionBy("u"))
    both = F.array(F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                   F.struct(F.col("u").alias("u"), F.col("m").alias("v")))
    return (canon.withColumn("m", m).select(F.explode(both).alias("e"))
            .select("e.u", "e.v").filter(F.col("u") != F.col("v")).distinct())


def small_C(edges):
    canon = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    both = F.array(F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                   F.struct(F.col("u").alias("u"), F.col("m").alias("v")))
    return (canon.join(mins, "u").select(F.explode(both).alias("e"))
            .select("e.u", "e.v").filter(F.col("u") != F.col("v")).distinct())


ARMS = {"A": (large_A, small_A), "B": (large_B, small_B), "C": (large_A, small_C)}


def components(pairs: DataFrame, large, small, max_iter: int = 20) -> DataFrame:
    edges = (pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
             .filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=False))
    nodes = (edges.select(F.col("u").alias("doc_id"))
             .union(edges.select(F.col("v").alias("doc_id"))).distinct())

    def _sig(df):
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                              F.lit(0)).alias("h")).first()
        return (r.n, r.h)

    sig_old = _sig(edges)
    for _ in range(max_iter):
        new_edges = small(large(edges)).localCheckpoint(eager=False)
        sig_new = _sig(new_edges)
        edges = new_edges
        if sig_new == sig_old:
            break
        sig_old = sig_new
    labels = nodes.join(edges.withColumnRenamed("u", "doc_id"), "doc_id", "left")
    return labels.select("doc_id", F.coalesce("v", "doc_id").alias("component"))


def main() -> None:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops.dedup import minhash_lsh_pairs
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark("ab_cc_r18")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b").localCheckpoint()
    tracker = spark.sparkContext.statusTracker()

    ref = sorted(map(tuple, components(pairs, *ARMS["A"]).collect()))
    times: dict[str, list[float]] = {k: [] for k in ARMS}
    jobs: dict[str, list[int]] = {k: [] for k in ARMS}
    for cyc in range(CYCLES):
        for arm, (lg, sm) in ARMS.items():
            group = f"cc:{arm}:{cyc}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            out = components(pairs, lg, sm)
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            times[arm].append(dt)
            jobs[arm].append(len(tracker.getJobIdsForGroup(group)))
            got = sorted(map(tuple, components(pairs, lg, sm).collect()))
            assert got == ref, f"arm {arm} labels differ"
    for arm in ARMS:
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {[round(t, 3) for t in times[arm]]} jobs {jobs[arm]}")


if __name__ == "__main__":
    main()


# --- r18 second pass: can large-star's trailing distinct be elided? ---------
# D = window form (arm B) but WITHOUT large-star's .distinct(): duplicate
# edges flow into small-star (inflating its window input) and die in its
# trailing distinct, which the algorithm needs anyway. One less exchange
# per round if the duplicate inflation stays cheap.

def large_D(edges):
    from pyspark.sql import Window as W
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
    return (sym.withColumn("m", m).filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")))  # no .distinct()


def main_d() -> None:
    import statistics, time
    from coursera_etl_pipeline_spark.session import get_spark
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops import dedup as DD
    from coursera_etl_pipeline_spark.llm_ops.clusters import (
        _large_star, _small_star, connected_components)

    spark = get_spark()
    sc = spark.sparkContext
    docs = load_table(spark, SF_DIR, "documents")
    pairs = DD.minhash_lsh_pairs(docs).select("doc_a", "doc_b")

    def cc_with(large_fn, small_fn, pairs, max_iter=20):
        edges = (pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
                 .filter(F.col("u") != F.col("v")).distinct()
                 .localCheckpoint(eager=False))
        def sig(df):
            r = df.agg(F.count(F.lit(1)).alias("n"),
                       F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                                   F.lit(0)).alias("h")).first()
            return (r.n, r.h)
        old = sig(edges)
        for _ in range(max_iter):
            new = small_fn(large_fn(edges)).localCheckpoint(eager=False)
            s = sig(new); edges = new
            if s == old: break
            old = s
        return edges

    # equality of final labels
    eb = cc_with(_large_star, _small_star, pairs)
    ed = cc_with(large_D, _small_star, pairs)
    assert sorted(eb.collect()) == sorted(ed.collect())
    print("equal: final star edges identical")

    times = {"B": [], "D": []}
    jobs = {"B": [], "D": []}
    fns = {"B": (_large_star, _small_star), "D": (large_D, _small_star)}
    for cyc in range(CYCLES):
        for arm in ("B", "D") if cyc % 2 == 0 else ("D", "B"):
            g = f"ab_cc2_{arm}_{cyc}"
            sc.setJobGroup(g, g)
            t0 = time.monotonic()
            cc_with(*fns[arm], pairs)
            times[arm].append(round(time.monotonic() - t0, 3))
            jobs[arm].append(len(sc.statusTracker().getJobIdsForGroup(g)))
    for arm in ("B", "D"):
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {times[arm]} jobs {jobs[arm]}")
