"""Interleaved A/B for the r18 single-join candidate generation in the
dedup index lifecycle.

A = r9 form (_increment_drop_candidates / minhash_incremental_pairs):
    the batch band index probes the corpus index and ITSELF in two
    separate joins, each followed by its own distinct — the probe side
    is shuffled twice, the pair set deduped twice.
B = single join: the batch probes ONE unioned (corpus + batch) index
    carrying an is_corpus tag; the bb ordering constraint and the
    _drop rule become row-local CASE expressions; one distinct.

Both arms run the registered queries end to end (update's new_index
and incremental's verified pairs); equality asserted per arm.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("AB_CYCLES", "5"))


def _checksum(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")).collect()[0]
    return row["n"], row["h"]


def drop_candidates_B(b_band, corpus_index):
    """Single-join spelling of _increment_drop_candidates."""
    idx = (corpus_index.withColumn("_corpus", F.lit(True))
           .unionByName(b_band.withColumn("_corpus", F.lit(False))))
    b1 = b_band.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = idx.select(F.col("doc_id").alias("doc_b"), "band", "bucket", "_corpus")
    return (b1.join(r, ["band", "bucket"])
            .filter(F.col("_corpus") | (F.col("doc_a") < F.col("doc_b")))
            .select("doc_a", "doc_b",
                    F.when(F.col("_corpus"), F.col("doc_a"))
                    .otherwise(F.col("doc_b")).alias("_drop"))
            .distinct())


def incremental_cand_B(batch_banded, corpus_idx):
    """Single-join spelling of minhash_incremental_pairs' candidates
    (this family orients batch x corpus pairs by least/greatest)."""
    idx = (corpus_idx.withColumn("_corpus", F.lit(True))
           .unionByName(batch_banded.withColumn("_corpus", F.lit(False))))
    b1 = batch_banded.select(F.col("doc_id").alias("b_id"), "band", "bucket")
    r = idx.select(F.col("doc_id").alias("o_id"), "band", "bucket", "_corpus")
    return (b1.join(r, ["band", "bucket"])
            .filter(F.col("_corpus") | (F.col("b_id") < F.col("o_id")))
            .select(F.least("b_id", "o_id").alias("doc_a"),
                    F.greatest("b_id", "o_id").alias("doc_b"))
            .distinct())


def build_arms(spark):
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    is_batch = (F.col("doc_id") % D.INCREMENTAL_BATCH_MOD) == 0
    sh_idx = D._materialize(
        D.shingles(docs).select("doc_id", F.size("_shingles").alias("nsh"),
                                F.explode("_shingles").alias("shingle")))
    banded = D._banded(D._signatures_from_shingles(sh_idx))
    c_band = D._materialize(banded.filter(~is_batch))
    b_band = D._materialize(banded.filter(is_batch))

    def update_with(cand_fn):
        cand = cand_fn(b_band, c_band)
        dropped = (D._verify_exact_jaccard(cand, sh_idx,
                                           D.JACCARD_THRESHOLD,
                                           carry=("_drop",))
                   .select(F.col("_drop").alias("doc_id")).distinct())
        survivors = (docs.filter(is_batch).select("doc_id")
                     .join(dropped, "doc_id", "left_anti"))
        return c_band.unionByName(b_band.join(survivors, "doc_id", "left_semi"))

    def incr_with(cand_fn):
        cand = cand_fn(b_band, c_band)
        return D._verify_exact_jaccard(cand, sh_idx, D.JACCARD_THRESHOLD)

    def incr_A(b, c):
        ci = c.select(F.col("doc_id").alias("c_id"), "band", "bucket")
        b1 = b.select(F.col("doc_id").alias("b_id"), "band", "bucket")
        bc = (b1.join(ci, ["band", "bucket"])
              .select(F.least("b_id", "c_id").alias("doc_a"),
                      F.greatest("b_id", "c_id").alias("doc_b")))
        b2 = b.select(F.col("doc_id").alias("b_id2"), "band", "bucket")
        bb = (b1.join(b2, ["band", "bucket"])
              .filter(F.col("b_id") < F.col("b_id2"))
              .select(F.col("b_id").alias("doc_a"),
                      F.col("b_id2").alias("doc_b")))
        return bc.unionAll(bb).distinct()

    return {
        "A": {"upd": lambda: update_with(D._increment_drop_candidates),
              "inc": lambda: incr_with(incr_A)},
        "B": {"upd": lambda: update_with(drop_candidates_B),
              "inc": lambda: incr_with(incremental_cand_B)},
    }


def main() -> None:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    arms = build_arms(spark)
    for part in ("upd", "inc"):
        ca, cb = _checksum(arms["A"][part]()), _checksum(arms["B"][part]())
        assert ca == cb, f"{part}: A {ca} != B {cb}"
        print(f"equal {part}: n={ca[0]}")
    times = {"A": [], "B": []}
    jobs = {"A": [], "B": []}
    for cyc in range(CYCLES):
        for arm in ("A", "B") if cyc % 2 == 0 else ("B", "A"):
            g = f"ab_cand_{arm}_{cyc}"
            sc.setJobGroup(g, g)
            t0 = time.monotonic()
            for part in ("upd", "inc"):
                arms[arm][part]().write.format("noop").mode("overwrite").save()
            times[arm].append(round(time.monotonic() - t0, 3))
            jobs[arm].append(len(sc.statusTracker().getJobIdsForGroup(g)))
    for arm in ("A", "B"):
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {times[arm]} jobs {jobs[arm]}")


if __name__ == "__main__":
    main()
