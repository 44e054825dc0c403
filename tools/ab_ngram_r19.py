"""Interleaved A/B for the r19 ngram prefix materialization:

A = r18 production — ``jaccard_pairs_prefix`` builds the ranked prefix
    frame lazily; the candidate self-join's two sides each recompute
    the df-window + rank-window chain over the cached postings (the
    before-plan shows the 2-Exchange/3-Window subtree twice, once under
    the probe side and once under the broadcast build).
B = r19 candidate — the prefix frame is _materialize'd, so the window
    chain runs ONCE and both join sides scan the cache (the same
    treatment the shingle index itself already gets).

Runs the FULL dedup_ngram_jaccard query per arm; equality asserted per
cycle on (count, commutative xxhash). Job counts from the tracker.

Usage: python tools/ab_ngram_r19.py [cycles]
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
CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _pairs(spark, sf_dir, materialize_prefix: bool) -> DataFrame:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        JACCARD_THRESHOLD, _materialize, _shingle_index,
        _verify_exact_jaccard)

    sh_idx = _shingle_index(load_table(spark, sf_dir, "documents"))
    wsh = W.partitionBy("shingle")
    w = W.partitionBy("doc_id")
    ranked = (
        sh_idx.withColumn("df", F.count(F.lit(1)).over(wsh))
        .filter(F.col("df") >= 2)
        .select("doc_id", "nsh", "shingle",
                F.row_number().over(w.orderBy("df", "shingle")).alias("rk"),
                F.count(F.lit(1)).over(w).alias("n2"))
    )
    threshold = JACCARD_THRESHOLD
    prefix = ranked.filter(
        F.col("rk") <= F.col("n2")
        - F.ceil(F.lit(threshold) * F.col("n2") - 1e-9) + 1)
    if materialize_prefix:
        prefix = _materialize(prefix)
    pa = prefix.select(F.col("doc_id").alias("doc_a"),
                       F.col("nsh").alias("na"), "shingle")
    pb = prefix.select(F.col("doc_id").alias("doc_b"),
                       F.col("nsh").alias("nb"), "shingle")
    cand = (
        pa.join(pb, "shingle")
        .filter((F.col("doc_a") < F.col("doc_b"))
                & (F.least("na", "nb")
                   >= F.lit(threshold) * F.greatest("na", "nb") - 1e-9))
        .select("doc_a", "doc_b").distinct()
    )
    return _verify_exact_jaccard(cand, sh_idx, threshold)


def _checksum(df: DataFrame) -> tuple:
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.coalesce(F.sum(F.xxhash64("doc_a", "doc_b", "jaccard")
                                .cast("decimal(38,0)")), F.lit(0)).alias("h")
               ).first()
    return (r.n, r.h)


def main() -> int:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark("ab_ngram_r19")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    arms = {"A": False, "B": True}

    base = None
    for name, mat in arms.items():
        cs = _checksum(_pairs(spark, SF_DIR, mat))
        if base is None:
            base = cs
        assert cs == base, f"arm {name} differs: {cs} vs {base}"

    times = {k: [] for k in arms}
    jobs = {k: [] for k in arms}
    for cycle in range(CYCLES):
        for name, mat in arms.items():
            group = f"ab_ngram_{name}_{cycle}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            _pairs(spark, SF_DIR, mat).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            times[name].append(dt)
            jobs[name].append(len(tracker.getJobIdsForGroup(group)))
    for name in arms:
        print(f"{name}: median {statistics.median(times[name]):.3f}s "
              f"samples {[round(t, 3) for t in times[name]]} "
              f"jobs {jobs[name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
