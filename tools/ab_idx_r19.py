"""Interleaved A/B for the r19 dedup-index lifecycle join elisions:

A = r18 production — dropped = verify(...).distinct(); survivors =
    batch ∖ dropped; the new artifacts SEMI-join b_band/b_post against
    survivors (an anti + semi two-join chain per artifact), and the
    delete verb's removed-set joins are left to AQE's strategy choice.
B = r19 candidate — the artifacts ANTI-join ``dropped`` directly
    (b_band's doc_ids ⊆ batch ids, so b_band ⋉ (batch ∖ dropped) ==
    b_band ⋉̸ dropped row for row), the ``dropped``/``removed`` sets
    drop their .distinct() (anti/semi joins are duplicate-insensitive
    on the build side; the distinct only paid an exchange), and the
    delete verb pins F.broadcast on the removed/partner sets (ADVICE
    r18: the hint keeps the ledger pass from planning sort-merge at
    scale).

Both arms run the FULL registered dedup_index_update and
dedup_index_delete queries; equality asserted per cycle on (count,
commutative xxhash over all columns). Arms alternate in one session;
job counts from the status tracker.

Usage: python tools/ab_idx_r19.py [cycles]
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


def update_A(spark, sf_dir):
    from coursera_etl_pipeline_spark.llm_ops.dedup import dedup_index_update
    return dedup_index_update(spark, sf_dir)


def delete_A(spark, sf_dir):
    from coursera_etl_pipeline_spark.llm_ops.dedup import dedup_index_delete
    return dedup_index_delete(spark, sf_dir)


def _shared(spark, sf_dir):
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        INCREMENTAL_BATCH_MOD, _banded, _materialize,
        _signatures_from_shingles, shingles)

    docs = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % INCREMENTAL_BATCH_MOD) == 0
    sh_idx = _materialize(
        shingles(docs)
        .select("doc_id", F.size("_shingles").alias("nsh"),
                F.explode("_shingles").alias("shingle")))
    banded = _banded(_signatures_from_shingles(sh_idx))
    c_band = _materialize(banded.filter(~is_batch))
    b_band = _materialize(banded.filter(is_batch))
    return docs, is_batch, sh_idx, c_band, b_band


def update_B(spark, sf_dir):
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        JACCARD_THRESHOLD, _increment_drop_candidates, _verify_exact_jaccard)

    _docs, _is_batch, sh_idx, c_band, b_band = _shared(spark, sf_dir)
    cand = _increment_drop_candidates(b_band, c_band)
    dropped = (_verify_exact_jaccard(cand, sh_idx, JACCARD_THRESHOLD,
                                     carry=("_drop",))
               .select(F.col("_drop").alias("doc_id")))
    return c_band.unionByName(b_band.join(dropped, "doc_id", "left_anti"))


def delete_B(spark, sf_dir):
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        TAKEDOWN_RESIDUE, INCREMENTAL_BATCH_MOD, _materialize,
        minhash_drop_ledger)

    docs, is_batch, sh_idx, c_band, b_band = _shared(spark, sf_dir)
    is_removed = (F.col("doc_id") % INCREMENTAL_BATCH_MOD) == TAKEDOWN_RESIDUE
    ledger = _materialize(minhash_drop_ledger(b_band, c_band, sh_idx))
    dropped = ledger.select("doc_id")  # anti/semi build side: dups fine
    index_t1 = c_band.unionByName(b_band.join(dropped, "doc_id", "left_anti"))
    tomb_index = b_band.join(dropped, "doc_id", "left_semi")

    removed = F.broadcast(docs.filter(is_removed).select("doc_id"))
    rem_partner = F.broadcast(
        docs.filter(is_removed)
        .select(F.col("doc_id").alias("partner"), F.lit(True).alias("_rm")))
    alive = F.when(F.col("_rm").isNull(), 1).otherwise(0)
    resurrected = (ledger.join(rem_partner, "partner", "left")
                   .groupBy("doc_id").agg(F.sum(alive).alias("_n_alive"))
                   .filter(F.col("_n_alive") == 0).select("doc_id"))
    return (index_t1.join(removed, "doc_id", "left_anti")
            .unionByName(tomb_index.join(resurrected, "doc_id", "left_semi")))


def _checksum(df: DataFrame) -> tuple:
    cols = df.columns
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.coalesce(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")),
                          F.lit(0)).alias("h")).first()
    return (r.n, r.h)


def main() -> int:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark("ab_idx_r19")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    parts = {"update": {"A": update_A, "B": update_B},
             "delete": {"A": delete_A, "B": delete_B}}

    base: dict[str, tuple] = {}
    for part, arms in parts.items():
        for name, fn in arms.items():
            cs = _checksum(fn(spark, SF_DIR))
            if part not in base:
                base[part] = cs
            assert cs == base[part], \
                f"{part} arm {name} differs: {cs} vs {base[part]}"

    times = {p: {a: [] for a in arms} for p, arms in parts.items()}
    jobs = {p: {a: [] for a in arms} for p, arms in parts.items()}
    for cycle in range(CYCLES):
        for part, arms in parts.items():
            for name, fn in arms.items():
                group = f"ab_idx_{part}_{name}_{cycle}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup(None, None)
                times[part][name].append(dt)
                jobs[part][name].append(len(tracker.getJobIdsForGroup(group)))
    for part in parts:
        for name in parts[part]:
            print(f"{part} {name}: median "
                  f"{statistics.median(times[part][name]):.3f}s "
                  f"samples {[round(t, 3) for t in times[part][name]]} "
                  f"jobs {jobs[part][name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
