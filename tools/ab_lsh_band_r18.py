"""Interleaved A/Bs for the r18 dedup candidate-generation rewrites.

Experiment 1 — minhash LSH pair dedup (dedup_minhash_lsh and, via
minhash_lsh_pairs, dedup_minhash_keep_representative):

A = narrow band rows + .distinct() on the candidate pairs (a pair
    matching in k bands is emitted k times, then dedup-shuffled)
B = band rows carry the doc's 4 bucket values (array); a pair is kept
    only at its FIRST matching band — an expression filter replaces
    the distinct exchange (the dedup_simhash first-zero-byte trick).

Experiment 2 — ngram-jaccard prefix ranking (dedup_ngram_jaccard):

A = df per shingle via groupBy + join-back (AQE broadcasts the
    df table locally; at corpus scale the join-back is a second
    full shuffle of the postings)
B = df via count() over (partition by shingle) — the exchange that
    computes df carries the rows.

Output equality asserted per cycle (full verified pair set).
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


def lsh_arms(spark):
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    sh_idx = D._materialize(
        D.shingles(docs).select("doc_id", F.size("_shingles").alias("nsh"),
                                F.explode("_shingles").alias("shingle")))
    sigs = D._signatures_from_shingles(sh_idx)

    def arm_A():
        banded = D._banded(sigs)
        a, b = banded.alias("a"), banded.alias("b")
        cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
                .distinct())
        return D._verify_exact_jaccard(cand, sh_idx, D.JACCARD_THRESHOLD)

    def arm_B():
        rows_per = D.NUM_HASHES // D.NUM_BANDS
        buckets = F.array(*[
            F.md5(F.concat_ws(",", *[F.col(f"mh{bi * rows_per + r}")
                                     for r in range(rows_per)]))
            for bi in range(D.NUM_BANDS)])
        wide = (sigs.select("doc_id", buckets.alias("bks"))
                .select("doc_id", "bks",
                        F.posexplode("bks").alias("band", "bucket")))
        a, b = wide.alias("a"), wide.alias("b")
        first = F.expr(
            "array_position(zip_with(a.bks, b.bks, (x, y) -> x <=> y), true)") - 1
        cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .filter(F.col("a.band") == first)
                .select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b")))
        return D._verify_exact_jaccard(cand, sh_idx, D.JACCARD_THRESHOLD)

    return {"A": arm_A, "B": arm_B}


def ngram_arms(spark):
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    sh_idx = D._materialize(
        D.shingles(docs).select("doc_id", F.size("_shingles").alias("nsh"),
                                F.explode("_shingles").alias("shingle")))
    threshold = D.JACCARD_THRESHOLD

    def _pairs(ranked):
        prefix = ranked.filter(
            F.col("rk") <= F.col("n2")
            - F.ceil(F.lit(threshold) * F.col("n2") - 1e-9) + 1)
        pa = prefix.select(F.col("doc_id").alias("doc_a"),
                           F.col("nsh").alias("na"), "shingle")
        pb = prefix.select(F.col("doc_id").alias("doc_b"),
                           F.col("nsh").alias("nb"), "shingle")
        cand = (pa.join(pb, "shingle")
                .filter((F.col("doc_a") < F.col("doc_b"))
                        & (F.least("na", "nb")
                           >= F.lit(threshold) * F.greatest("na", "nb") - 1e-9))
                .select("doc_a", "doc_b").distinct())
        return D._verify_exact_jaccard(cand, sh_idx, threshold)

    def arm_A():
        df_cnt = (sh_idx.groupBy("shingle")
                  .agg(F.count(F.lit(1)).alias("df"))
                  .filter(F.col("df") >= 2))
        w = W.partitionBy("doc_id")
        ranked = (sh_idx.join(df_cnt, "shingle")
                  .select("doc_id", "nsh", "shingle",
                          F.row_number().over(w.orderBy("df", "shingle")).alias("rk"),
                          F.count(F.lit(1)).over(w).alias("n2")))
        return _pairs(ranked)

    def arm_B():
        wsh = W.partitionBy("shingle")
        w = W.partitionBy("doc_id")
        withdf = (sh_idx
                  .withColumn("df", F.count(F.lit(1)).over(wsh))
                  .filter(F.col("df") >= 2))
        ranked = withdf.select(
            "doc_id", "nsh", "shingle",
            F.row_number().over(w.orderBy("df", "shingle")).alias("rk"),
            F.count(F.lit(1)).over(w).alias("n2"))
        return _pairs(ranked)

    return {"A": arm_A, "B": arm_B}


def run_experiment(spark, name, arms):
    sc = spark.sparkContext
    ca, cb = _checksum(arms["A"]()), _checksum(arms["B"]())
    assert ca == cb, f"{name}: A {ca} != B {cb}"
    print(f"[{name}] equal: n={ca[0]}")
    times = {"A": [], "B": []}
    jobs = {"A": [], "B": []}
    for cyc in range(CYCLES):
        for arm in ("A", "B") if cyc % 2 == 0 else ("B", "A"):
            group = f"ab_{name}_{arm}_{cyc}"
            sc.setJobGroup(group, group)
            t0 = time.monotonic()
            arms[arm]().write.format("noop").mode("overwrite").save()
            times[arm].append(round(time.monotonic() - t0, 3))
            jobs[arm].append(len(sc.statusTracker().getJobIdsForGroup(group)))
    for arm in ("A", "B"):
        print(f"[{name}] {arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {times[arm]} jobs {jobs[arm]}")


def main() -> None:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark()
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("lsh", "both"):
        run_experiment(spark, "lsh", lsh_arms(spark))
    if which in ("ngram", "both"):
        run_experiment(spark, "ngram", ngram_arms(spark))


if __name__ == "__main__":
    main()
