"""Interleaved A/B for the r18 index-delete resurrection rewrite:

A = r9 spelling: still_justified anti-join + distinct, dropped distinct,
    resurrected = dropped anti still_justified (3 doc_id-set shuffles)
B = r18 spelling: one broadcast partner-mark + one count aggregate

Both run the FULL dedup_index_delete query end to end (shared memoized
artifacts warm, exactly the bench context); arm equality is asserted
on the returned index rows each cycle.
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
CYCLES = int(os.environ.get("AB_CYCLES", "5"))


def delete_A(removed_ids, postings, index, drop_ledger,
             tombstone_postings, tombstone_index):
    removed = removed_ids.select("doc_id")
    rem_partner = removed.withColumnRenamed("doc_id", "partner")
    still_justified = (drop_ledger.join(rem_partner, "partner", "left_anti")
                       .select("doc_id").distinct())
    resurrected = (drop_ledger.select("doc_id").distinct()
                   .join(still_justified, "doc_id", "left_anti"))
    new_index = (index.join(removed, "doc_id", "left_anti")
                 .unionByName(tombstone_index
                              .join(resurrected, "doc_id", "left_semi")))
    return new_index


def query_with(spark, delete_fn) -> DataFrame:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    is_batch = (F.col("doc_id") % D.INCREMENTAL_BATCH_MOD) == 0
    is_removed = (F.col("doc_id") % D.INCREMENTAL_BATCH_MOD) == D.TAKEDOWN_RESIDUE
    sh_idx = D._materialize(
        D.shingles(docs).select("doc_id", F.size("_shingles").alias("nsh"),
                                F.explode("_shingles").alias("shingle")))
    banded = D._banded(D._signatures_from_shingles(sh_idx))
    c_band = D._materialize(banded.filter(~is_batch))
    b_band = D._materialize(banded.filter(is_batch))
    ledger = D._materialize(D.minhash_drop_ledger(b_band, c_band, sh_idx))
    dropped = ledger.select("doc_id").distinct()
    batch_ids = docs.filter(is_batch).select("doc_id")
    survivors = batch_ids.join(dropped, "doc_id", "left_anti")
    index_t1 = c_band.unionByName(b_band.join(survivors, "doc_id", "left_semi"))
    return delete_fn(
        removed_ids=docs.filter(is_removed).select("doc_id"),
        postings=None, index=index_t1, drop_ledger=ledger,
        tombstone_postings=None,
        tombstone_index=b_band.join(dropped, "doc_id", "left_semi"))


def delete_B(removed_ids, postings, index, drop_ledger,
             tombstone_postings, tombstone_index):
    from coursera_etl_pipeline_spark.llm_ops.dedup import minhash_index_delete

    # current in-tree implementation, via the shared verb (postings leg
    # replaced by the index leg's twin — only new_index is compared)
    _post, new_index, _res = minhash_index_delete(
        removed_ids, index, index, drop_ledger, tombstone_index,
        tombstone_index)
    return new_index


def main() -> None:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark("ab_delete_r18")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    arms = {"A": delete_A, "B": delete_B}

    ref = None
    times = {k: [] for k in arms}
    jobs = {k: [] for k in arms}
    for cyc in range(CYCLES):
        for arm, fn in arms.items():
            group = f"del:{arm}:{cyc}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            out = query_with(spark, fn)
            out.write.format("noop").mode("overwrite").save()
            times[arm].append(time.perf_counter() - t0)
            spark.sparkContext.setJobGroup(None, None)
            jobs[arm].append(len(tracker.getJobIdsForGroup(group)))
            got = sorted(map(tuple, out.collect()))
            if ref is None:
                ref = got
            assert got == ref, f"arm {arm} differs"
    for arm in arms:
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {[round(t, 3) for t in times[arm]]} jobs {jobs[arm]}")


if __name__ == "__main__":
    main()
