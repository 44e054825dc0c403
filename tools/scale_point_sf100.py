"""K=1000 (~sf100) single-point scale evidence (VERDICT r9 item 7).

Extends BASELINE §4's growth table one more decade for a handful of
headline queries: engine AND DuckDB timed on the identical parquet at
~600M lineitem rows / ~100M events / ~5M documents. Protocol is the
bench one (noop sink / fetchall, median of 3 warm runs).

Replica construction: two-stage — reuse the K=100 replica (built by
tools/bench_scale.py) and replicate IT 10-fold with a second-stage
key shift of 10^10 per copy (the K=100 keys span < 10^10, so replica
keys stay disjoint and joins stay 1:1), avoiding a 1000-way union
plan. Dimensions (region/nation) keep one copy, same as build_scaled.

Query subset: q1 (scan+8-agg), agg_cube (multi-grouping),
events_resample_gapfill (per-key grid+fill — the row where the engine
already wins 5.8x at sf10), dedup_exact (md5-fingerprint groupBy —
the dedup row whose work is linear under replication; the
near-dup/self-join family stays excluded per the §3 rule: replicated
near-identical text grows TRUE pair output ~K^2).

Usage: python tools/scale_point_sf100.py
Prints one JSON line {"k": 1000, "engine": {...}, "duckdb": {...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from coursera_etl_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402
from tools.scale_probe import KEY_SHIFTS, build_scaled  # noqa: E402

QUERIES = ["q1_pricing_summary", "agg_cube", "events_resample_gapfill",
           "dedup_exact"]
STAGE2_SHIFT = 10_000_000_000  # > max K=100 key (99 * 1e8 + fixture keys)
DEST = "/tmp/spark_graft_bench_1000x"


def build_1000x(spark) -> str:
    # completion marker, not bare existence: a crashed build (likely
    # at ~600M rows — OOM/disk-full) must not be silently reused as
    # the ~sf100 dataset and record wrong scale evidence
    done = os.path.join(DEST, "_BUILD_COMPLETE")
    if os.path.exists(done):
        return DEST
    if os.path.exists(DEST):
        import shutil

        shutil.rmtree(DEST)
    base = build_scaled(spark, 100, dest="/tmp/spark_graft_bench_100x",
                        reuse=True)
    os.makedirs(DEST)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        keys = KEY_SHIFTS.get(t, [])
        out_path = os.path.join(DEST, f"{t}.parquet")
        if not keys:
            df.write.mode("overwrite").parquet(out_path)
            continue
        replicas = []
        for i in range(10):
            r = df
            for c in keys:
                r = r.withColumn(
                    c, F.col(c).cast("bigint") + F.lit(i * STAGE2_SHIFT))
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.union(r)
        out.write.mode("overwrite").parquet(out_path)
    open(done, "w").close()
    return DEST


def _median3(fn) -> float:
    fn()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    spark = get_spark("scale_point_sf100")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_1000x(spark)
    queries = entrymod.queries()
    engine = {}
    for name in QUERIES:
        fn = queries[name]
        engine[name] = _median3(
            lambda: fn(spark, dest).write.format("noop")
                      .mode("overwrite").save())
        print(json.dumps({name: engine[name]}), file=sys.stderr)

    con = duckdb.connect()
    for t in TABLES:
        p = table_path(dest, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
    ts_type = con.execute(
        f"SELECT typeof(ts) FROM read_parquet('{dest}/events.parquet/"
        "*.parquet') LIMIT 1").fetchone()[0]
    ts_expr = "make_timestamp(ts // 1000)" if ts_type == "BIGINT" else "ts"
    con.execute(f"""
        CREATE OR REPLACE VIEW events AS
        SELECT event_id, {ts_expr} AS ts, user_id, event_type, value, props
        FROM read_parquet('{dest}/events.parquet/*.parquet')
    """)
    oracles = entrymod.oracle_sql()
    duck = {}
    for name in QUERIES:
        duck[name] = _median3(lambda: con.execute(oracles[name]).fetchall())
        print(json.dumps({name: duck[name]}), file=sys.stderr)
    print(json.dumps({"k": 1000, "sf_equiv": 100.0,
                      "engine": engine, "duckdb": duck}))


if __name__ == "__main__":
    main()
