"""Round-14 interleaved engine-vs-DuckDB replica probe.

Written for the q18 sf100 settlement (VERDICT r13 item 3) and then
used as the round's generic instrument: the q1/q3/q5/q10 quiet-window
refresh, the interval-join K=1000 decade row, and the
dedup_paragraph_keep_first K=100 row all ran through it (BASELINE §4
round-14 sections).

q18's standing sf100 figure is the last headline scale row carrying a
weather-bounded adjudication (~3.3-3.9x from overlapping 69-130 s
bands recorded across r11-r13 sessions). This tool produces one clean
INTERLEAVED engine-vs-DuckDB 3x3 on the persisted K=1000 replica —
per cycle: one engine sample (noop sink), then one DuckDB sample
(fetchall on the query's own oracle SQL) — so a host-weather episode
lands on both sides of the same cycle instead of biasing one column.
A pure-CPU microbench brackets the run so the reader can place the
session on the quiet-vs-throttled axis (quiet ~1.2 s, throttled 2-3 s).

Usage: python tools/ab_q18_r14.py [cycles] [dest] [query]
Prints one JSON line with samples, medians, ratio, and microbenches.
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


def microbench() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_1000x"
    name = sys.argv[3] if len(sys.argv) > 3 else "q18_large_orders"
    spark = get_spark("ab_q18_r14")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(dest, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
    mb_start = microbench()

    def eng_once() -> float:
        t0 = time.perf_counter()
        fn(spark, dest).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    def duck_once() -> float:
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return round(time.perf_counter() - t0, 2)

    print(json.dumps({"warm": {"engine": eng_once(),
                               "duckdb": duck_once()}}), file=sys.stderr)
    eng, duck = [], []
    for c in range(cycles):
        eng.append(eng_once())
        duck.append(duck_once())
        print(json.dumps({"cycle": c, "engine": eng[-1],
                          "duckdb": duck[-1]}), file=sys.stderr)
    mb_end = microbench()
    em, dm = statistics.median(eng), statistics.median(duck)
    print(json.dumps({
        "query": name, "dest": dest, "cycles": cycles,
        "engine": eng, "duckdb": duck,
        "engine_median": em, "duckdb_median": dm,
        "ratio": round(em / dm, 2),
        "microbench": {"start": mb_start, "end": mb_end},
    }))


if __name__ == "__main__":
    main()
