"""Generic quiet-window engine-vs-DuckDB probe at a K-fold replica.

Round-11 evidence collector (VERDICT r10 items 6 and 7): times named
registry queries on the K-fold key-shifted replica — engine (noop
sink) and DuckDB (fetchall on the same parquet via the query's own
oracle SQL) — with N samples per side so single host-pause episodes
self-identify as outliers instead of poisoning a median-of-3.

K=1000 routes through scale_point_sf100.build_1000x (two-stage
replication); every other K through scale_probe.build_scaled.

Usage: python tools/quiet_probe.py K SAMPLES query [query ...]
Prints one JSON line {"k": K, "rows": {name: {"engine": [..],
"duckdb": [..], "engine_median": s, "duckdb_median": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from coursera_etl_pipeline_spark.catalog import TABLES, table_path  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402


def _duck_con(dest: str):
    con = duckdb.connect()
    # Bound the oracle side's memory (scale_pairwise's r18 lesson: an
    # uncapped feasibility-class oracle summoned the kernel OOM killer
    # at ~70 GB RSS and took the whole probe process with it). 24 GB
    # is far above any healthy probe's need, so non-pathological
    # timings are unaffected; a pathological rebuild fails as a
    # recorded DuckDB error instead. Override with DUCK_MEM_LIMIT.
    con.execute(f"SET memory_limit = "
                f"'{os.environ.get('DUCK_MEM_LIMIT', '24GB')}'")
    for t in TABLES:
        p = table_path(dest, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
    # events.ts may surface as raw INT64 nanos in the replica (see
    # scale_probe.build_scaled) — normalize exactly as bench_scale does
    ev = table_path(dest, "events")
    if os.path.exists(ev):
        ts_type = con.execute(
            f"SELECT typeof(ts) FROM read_parquet('{ev}/*.parquet') "
            "LIMIT 1").fetchone()[0]
        ts_expr = ("make_timestamp(ts // 1000)" if ts_type == "BIGINT"
                   else "ts")
        con.execute(f"""
            CREATE OR REPLACE VIEW events AS
            SELECT event_id, {ts_expr} AS ts, user_id, event_type, value,
                   props
            FROM read_parquet('{ev}/*.parquet')
        """)
    return con


def main() -> None:
    k = int(sys.argv[1])
    samples = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("quiet_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if k == 1000:
        from tools.scale_point_sf100 import build_1000x
        dest = build_1000x(spark)
    else:
        from tools.scale_probe import build_scaled
        dest = build_scaled(spark, k, dest=f"/tmp/spark_graft_bench_{k}x",
                            reuse=True)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = _duck_con(dest)
    rows = {}
    for name in names:
        fn = queries[name]

        def run_engine():
            fn(spark, dest).write.format("noop").mode("overwrite").save()

        run_engine()  # warm
        eng = []
        for _ in range(samples):
            t0 = time.perf_counter()
            run_engine()
            eng.append(round(time.perf_counter() - t0, 3))
            print(json.dumps({name: {"engine_sample": eng[-1]}}),
                  file=sys.stderr)
        duck = []
        sql = oracles.get(name)
        if sql:
            con.execute(sql).fetchall()  # warm
            for _ in range(samples):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                duck.append(round(time.perf_counter() - t0, 3))
                print(json.dumps({name: {"duckdb_sample": duck[-1]}}),
                      file=sys.stderr)
        em = statistics.median(eng)
        dm = statistics.median(duck) if duck else None
        rows[name] = {"engine": eng, "duckdb": duck,
                      "engine_median": round(em, 3),
                      "duckdb_median": round(dm, 3) if dm else None,
                      "ratio": round(em / dm, 2) if dm else None}
    print(json.dumps({"k": k, "samples": samples, "rows": rows}))


if __name__ == "__main__":
    main()
