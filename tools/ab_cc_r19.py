"""Interleaved A/B for the r19 connected-components loop changes:

A = r18 production form — per-round lazy localCheckpoint whose first
    action is the SEPARATE convergence-signature aggregate, and the
    keep-representative verdict joins docs onto labels built via the
    ``nodes`` frame (union + distinct + LEFT join) before the docs
    LEFT join.
B = r19 candidate — the convergence signature rides the checkpoint
    materialization as observe() metrics (one action per round instead
    of two), and the verdict joins docs DIRECTLY onto the converged
    star edges (docs ⊇ nodes, so coalesce(v, doc_id) gives the same
    label and the nodes union/distinct/join never runs).

Both arms run the FULL dedup_minhash_keep_representative query on the
real LSH pair graph; equality is asserted per cycle on (row count,
commutative xxhash of all three output columns). Arms alternate inside
one session so host weather cancels; per-arm Spark job counts come
from the status tracker (the fixed-overhead driver at bench scale, the
shuffle-stage count at 100 TB).

Usage: python tools/ab_cc_r19.py [cycles]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _sig_first(df: DataFrame) -> tuple:
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                          F.lit(0)).alias("h")).first()
    return (r.n, r.h)


def _star_edges_A(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    from coursera_etl_pipeline_spark.llm_ops.clusters import (
        _large_star, _small_star)

    edges = (pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct().localCheckpoint(eager=False))
    sig_old = _sig_first(edges)
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        sig_new = _sig_first(new_edges)
        edges = new_edges
        if sig_new == sig_old:
            return edges
        sig_old = sig_new
    raise RuntimeError("no convergence")


def _ckpt_sig(df: DataFrame) -> tuple[DataFrame, tuple]:
    obs = Observation(f"cc_sig_{uuid.uuid4().hex[:8]}")
    watched = df.observe(
        obs, F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                   F.lit(0)).alias("h"))
    ck = watched.localCheckpoint(eager=True)
    got = obs.get
    return ck, (got["n"], got["h"])


def _star_edges_B(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    from coursera_etl_pipeline_spark.llm_ops.clusters import (
        _large_star, _small_star)

    edges, sig_old = _ckpt_sig(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v")).distinct())
    for _ in range(max_iter):
        edges, sig_new = _ckpt_sig(_small_star(_large_star(edges)))
        if sig_new == sig_old:
            return edges
        sig_old = sig_new
    raise RuntimeError("no convergence")


def keep_rep_A(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    star = _star_edges_A(pairs)
    # production A builds nodes from the INITIAL edge list (the
    # connected_components contract), not the converged star edges
    edges0 = (pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
              .filter(F.col("u") != F.col("v")))
    nodes = (edges0.select(F.col("u").alias("doc_id"))
             .union(edges0.select(F.col("v").alias("doc_id"))).distinct())
    labels = nodes.join(star.withColumnRenamed("u", "doc_id"), "doc_id", "left")
    comp = labels.select("doc_id", F.coalesce("v", "doc_id").alias("component"))
    return (docs.select("doc_id").join(comp, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", F.col("doc_id")).alias("component"))
            .withColumn("is_kept", F.col("doc_id") == F.col("component")))


def keep_rep_B(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    star = _star_edges_B(pairs)
    return (docs.select("doc_id")
            .join(star.withColumnRenamed("u", "doc_id"), "doc_id", "left")
            .select("doc_id", F.coalesce("v", F.col("doc_id")).alias("component"))
            .withColumn("is_kept", F.col("doc_id") == F.col("component")))


def _checksum(df: DataFrame) -> tuple:
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.coalesce(F.sum(F.xxhash64("doc_id", "component", "is_kept")
                                .cast("decimal(38,0)")), F.lit(0)).alias("h")).first()
    return (r.n, r.h)


def main() -> int:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops.dedup import minhash_lsh_pairs
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark("ab_cc_r19")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    arms = {"A": keep_rep_A, "B": keep_rep_B}

    # warm both arms once (parquet footers, the shared materialized
    # shingle index, codegen)
    base = None
    for name, fn in arms.items():
        cs = _checksum(fn(docs, pairs))
        if base is None:
            base = cs
        assert cs == base, f"arm {name} output differs: {cs} vs {base}"

    times: dict[str, list[float]] = {k: [] for k in arms}
    jobs: dict[str, list[int]] = {k: [] for k in arms}
    for cycle in range(CYCLES):
        for name, fn in arms.items():
            group = f"ab_cc_{name}_{cycle}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(docs, pairs)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            times[name].append(dt)
            jobs[name].append(len(tracker.getJobIdsForGroup(group)))
            cs = _checksum(fn(docs, pairs))
            assert cs == base, f"arm {name} cycle {cycle} differs"
    for name in arms:
        print(f"{name}: median {statistics.median(times[name]):.3f}s "
              f"samples {[round(t, 3) for t in times[name]]} "
              f"jobs {jobs[name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
