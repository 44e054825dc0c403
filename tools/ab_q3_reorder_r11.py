"""Round-11 q3 join-reorder A/B at the sf100 replica.

The r11 sf100 probe measured q3 at ~10x DuckDB (engine 22-38 s
steady-decaying vs 3.6 s) — the worst standing scale row. Hypothesis:
the plan joins lineitem x orders FIRST, shuffling ~97% of orders
(the date filter is barely selective), and only then applies the
broadcast customer BUILDING filter that would cut the orders side
~5x. Catalyst does not reorder inner joins without CBO stats, so the
fix is syntactic: broadcast-join orders to the filtered customer dim
BEFORE the fact-fact shuffle (a narrow, shuffle-free join), then
shuffle the reduced orders side against lineitem.

Protocol: identity assert at sf0.01, then interleaved old/new cycles
on the existing sf100 replica (must be built already); episode cycles
(slower arm > 5x the running floor) are discarded-and-reported.

Usage: python tools/ab_q3_reorder_r11.py [cycles] [dest]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from coursera_etl_pipeline_spark.catalog import load_table  # noqa: E402
from coursera_etl_pipeline_spark.registry import dsum  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402


def q3_reordered(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    o_cut = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .select("o_orderkey", "o_orderdate"))
    return (
        li.join(o_cut, li.l_orderkey == o_cut.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr(dsum("l_extendedprice * (1 - l_discount)"))
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_1000x"
    spark = get_spark("ab_q3_r11")
    spark.sparkContext.setLogLevel("ERROR")
    q3_old = entrymod.queries()["q3_shipping_priority"]

    sf001 = "/root/testdata/sf0.01"
    a = [tuple(r) for r in q3_old(spark, sf001).collect()]
    b = [tuple(r) for r in q3_reordered(spark, sf001).collect()]
    assert a == b, "q3 variants diverge at sf0.01 — abort"
    print("identity: q3 old/reordered bit-identical at sf0.01",
          file=sys.stderr)

    _noop(q3_old(spark, dest))
    _noop(q3_reordered(spark, dest))
    ts_old, ts_new, wins, discarded = [], [], 0, []
    retries = cycles
    c = 0
    while c < cycles:
        t0 = time.perf_counter()
        _noop(q3_old(spark, dest))
        t_old = time.perf_counter() - t0
        t0 = time.perf_counter()
        _noop(q3_reordered(spark, dest))
        t_new = time.perf_counter() - t0
        floor = min(ts_old + ts_new + [t_old, t_new])
        if max(t_old, t_new) > 5 * floor and retries > 0:
            discarded.append({"old": round(t_old, 3), "new": round(t_new, 3)})
            retries -= 1
            continue
        ts_old.append(t_old)
        ts_new.append(t_new)
        wins += t_new < t_old
        c += 1
        print(json.dumps({"cycle": c, "old": round(t_old, 3),
                          "new": round(t_new, 3)}), file=sys.stderr)
    print(json.dumps({
        "cycles": cycles, "dest": dest,
        "old_median": round(statistics.median(ts_old), 3),
        "new_median": round(statistics.median(ts_new), 3),
        "old_min": round(min(ts_old), 3), "new_min": round(min(ts_new), 3),
        "new_wins": wins,
        "old_runs": [round(t, 3) for t in ts_old],
        "new_runs": [round(t, 3) for t in ts_new],
        "discarded_episode_cycles": discarded,
    }))


if __name__ == "__main__":
    main()
