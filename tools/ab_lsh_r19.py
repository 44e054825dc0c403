"""Interleaved A/B for r19 banded-index materialization:

A = r18 production — ``minhash_lsh_pairs`` builds the banded signature
    frame lazily; the candidate self-join's two sides each recompute
    the 16-aggregate signature groupBy + band explode over the cached
    postings (the before-plan shows the HashAggregate/Exchange/Generate
    subtree twice). ``minhash_incremental_pairs`` similarly consumes
    its unmaterialized batch band slice twice (probe + tagged union).
B = r19 candidate — the banded frame is _materialize'd once and every
    slice/side scans the cache (the treatment the index-lifecycle
    queries already give their band slices).

Runs the FULL dedup_minhash_lsh and dedup_incremental_minhash queries
per arm; equality asserted per cycle on (count, commutative xxhash).

Usage: python tools/ab_lsh_r19.py [cycles]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _lsh(spark, sf_dir, mat: bool) -> DataFrame:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        JACCARD_THRESHOLD, _banded, _materialize,
        _signatures_from_shingles, _verify_exact_jaccard, shingles)

    df = load_table(spark, sf_dir, "documents")
    sh_idx = _materialize(
        shingles(df)
        .select("doc_id", F.size("_shingles").alias("nsh"),
                F.explode("_shingles").alias("shingle")))
    banded = _banded(_signatures_from_shingles(sh_idx))
    if mat:
        banded = _materialize(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_exact_jaccard(cand, sh_idx, JACCARD_THRESHOLD)


def _inc(spark, sf_dir, mat: bool) -> DataFrame:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        INCREMENTAL_BATCH_MOD, JACCARD_THRESHOLD, _banded, _materialize,
        _signatures_from_shingles, _verify_exact_jaccard, shingles)

    df = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % INCREMENTAL_BATCH_MOD) == 0
    sh_idx = _materialize(
        shingles(df)
        .select("doc_id", F.size("_shingles").alias("nsh"),
                F.explode("_shingles").alias("shingle")))
    banded = _banded(_signatures_from_shingles(sh_idx))
    if mat:
        banded = _materialize(banded)
        corpus_idx = banded.filter(~is_batch)
    else:
        corpus_idx = _materialize(banded.filter(~is_batch))
    batch_banded = banded.filter(is_batch)
    idx = (corpus_idx.withColumn("_corpus", F.lit(True))
           .unionByName(batch_banded.withColumn("_corpus", F.lit(False))))
    b1 = batch_banded.select(F.col("doc_id").alias("b_id"), "band", "bucket")
    r = idx.select(F.col("doc_id").alias("o_id"), "band", "bucket", "_corpus")
    cand = (b1.join(r, ["band", "bucket"])
            .filter(F.col("_corpus") | (F.col("b_id") < F.col("o_id")))
            .select(F.least("b_id", "o_id").alias("doc_a"),
                    F.greatest("b_id", "o_id").alias("doc_b"))
            .distinct())
    return _verify_exact_jaccard(cand, sh_idx, JACCARD_THRESHOLD)


def _checksum(df: DataFrame) -> tuple:
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.coalesce(F.sum(F.xxhash64("doc_a", "doc_b", "jaccard")
                                .cast("decimal(38,0)")), F.lit(0)).alias("h")
               ).first()
    return (r.n, r.h)


def main() -> int:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark("ab_lsh_r19")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    parts = {"lsh": _lsh, "inc": _inc}
    arms = {"A": False, "B": True}

    base: dict[str, tuple] = {}
    for part, fn in parts.items():
        for name, mat in arms.items():
            cs = _checksum(fn(spark, SF_DIR, mat))
            if part not in base:
                base[part] = cs
            assert cs == base[part], \
                f"{part} arm {name} differs: {cs} vs {base[part]}"

    times = {p: {a: [] for a in arms} for p in parts}
    jobs = {p: {a: [] for a in arms} for p in parts}
    for cycle in range(CYCLES):
        for part, fn in parts.items():
            for name, mat in arms.items():
                group = f"ab_lsh_{part}_{name}_{cycle}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                fn(spark, SF_DIR, mat).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup(None, None)
                times[part][name].append(dt)
                jobs[part][name].append(len(tracker.getJobIdsForGroup(group)))
    for part in parts:
        for name in arms:
            print(f"{part} {name}: median "
                  f"{statistics.median(times[part][name]):.3f}s "
                  f"samples {[round(t, 3) for t in times[part][name]]} "
                  f"jobs {jobs[part][name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
