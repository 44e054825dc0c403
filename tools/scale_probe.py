"""Scaling-evidence probe: replicate the sf0.1 fixtures K-fold with
shifted keys into a temp dataset, then time a linear-semantics subset
of the headline queries at 1x vs Kx and report the growth ratio.

Purpose (BASELINE.md §3): the within-2x bench gate at sf0.1 mostly
measures fixed JVM/planning overhead; what actually predicts 100 TB
behavior is how the DATA-PROPORTIONAL part of each plan grows. A plan
whose time grows ~= Kx (or less, where per-query fixed cost amortizes)
under a Kx input is shuffle/partition-healthy; super-linear growth
flags an accidental O(n^2).

Key-shifted replication keeps join/window semantics realistic: each
replica's orderkeys/custkeys/user_ids are disjoint, so joins stay
1:1 fan-out and windows gain new partitions, exactly like ingesting
more days of data. Queries with pairwise self-join semantics over
near-identical text (dedup_*) are excluded — replicating identical
documents K-fold grows their TRUE output quadratically, which measures
the data generator, not the plan.

Usage: python tools/scale_probe.py [K]      (default 10)
Prints one JSON line {"k": K, "queries": {name: {"t1": s, "tk": s,
"ratio": r}}, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from coursera_etl_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/spark_graft_scale_probe"

# key columns to shift per replica so joins stay 1:1 across replicas
KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

# linear-semantics subset: scan/agg, broadcast join chains, fact-fact
# join, windows, sessionization, text featurization, packing
PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q12_shipmode_priority",
    "q6_forecast_revenue",
    "window_ranking",
    "window_latest_per_key",
    "events_session_window",
    "events_interval_join",
    "text_quality_score",
    "text_pack_sequences",
    "sample_stratified_hash",
    "q8_market_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "text_repetition_score",
]

SHIFT = 100_000_000  # far above any fixture key range


def build_scaled(spark, k: int, dest: str | None = None,
                 reuse: bool = False) -> str:
    dest = dest or f"{OUT_DIR}_sf{k}x"
    if os.path.exists(dest):
        if reuse:
            return dest
        shutil.rmtree(dest)
    os.makedirs(dest)
    # events.ts encoding varies across fixture regenerations (nanos /
    # micros-NTZ / UTC); under nanosAsLong a nanos file surfaces as raw
    # INT64 and is written back as such, any real timestamp type round-
    # trips as-is — catalog.normalize_ts handles either form in the
    # replica, and bench_scale's DuckDB view dispatches on the observed
    # type the same way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        src = table_path(SF_DIR, t)
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        keys = KEY_SHIFTS.get(t, [])
        if not keys:  # pure dimensions: one copy keeps FK integrity
            df.write.mode("overwrite").parquet(os.path.join(dest, f"{t}.parquet"))
            continue
        replicas = []
        for i in range(k):
            r = df
            for c in keys:
                # bigint, NOT the source type: casting the shift back to a
                # 32-bit column wraps silently once i*SHIFT exceeds int32
                # (k > ~21), corrupting the disjoint-key invariant. Both
                # sides of every replica join shift together, so the
                # widened types stay join-compatible.
                r = r.withColumn(c, F.col(c).cast("bigint") + F.lit(i * SHIFT))
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.union(r)
        out.write.mode("overwrite").parquet(os.path.join(dest, f"{t}.parquet"))
    return dest


def _time(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, k)
    queries = entrymod.queries()
    out = {}
    for name in PROBE_QUERIES:
        fn = queries.get(name)
        if fn is None:
            continue
        t1 = _time(fn, spark, SF_DIR)
        tk = _time(fn, spark, scaled)
        out[name] = {"t1": t1, "tk": tk,
                     "ratio": round(tk / t1, 2) if t1 else None}
    print(json.dumps({"k": k, "sf_base": SF_DIR, "queries": out}))


if __name__ == "__main__":
    main()
