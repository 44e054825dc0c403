"""Round-11 quiet-window confirmation of the q5 split-dsum conversion.

The round-10 conversion (relational.py q5_local_supplier_volume,
commit 786a813) rests on ONE erratic-host A/B (BASELINE.md round-10
note: 6/8 paired cycles, medians 2.80 vs 3.54 s, but both re-probes
that day were destroyed by full-VM pauses). VERDICT r10 item 1 says:
re-run the interleaved A/B in a quiet window and either record the win
in BASELINE §4 or revert the conversion.

The registry plan IS the new arm now, so the OLD arm is reconstructed
here verbatim from the pre-conversion source
(`git show 786a813^:.../relational.py`): one-stage decimal dsum over
the joined frame, no scan-side micros projection.

Protocol (same as every A/B in BASELINE.md): assert bit-identical rows
at sf0.01 first, then interleave old/new per cycle on the K=100
(~sf10) replica so host drift hits both arms equally; report per-arm
medians, minima, and the per-cycle win count. A host-episode guard
discards and re-runs any cycle whose slower arm exceeds 5x the faster
arms' running minimum (the documented full-VM-pause signature), up to
a retry budget — discarded cycles are reported, never silently eaten.

Usage: python tools/ab_q5_r11.py [K] [cycles]
Prints one JSON line.
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
from tools.scale_probe import build_scaled  # noqa: E402


def q5_old(spark, sf_dir):
    """Pre-conversion q5: one-stage decimal dsum after the star join
    (byte-for-byte the plan removed by commit 786a813)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(dsum("l_extendedprice * (1 - l_discount)"))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("ab_q5_r11")
    spark.sparkContext.setLogLevel("ERROR")
    q5_new = entrymod.queries()["q5_local_supplier_volume"]

    sf001 = "/root/testdata/sf0.01"
    a = [tuple(r) for r in q5_old(spark, sf001).collect()]
    b = [tuple(r) for r in q5_new(spark, sf001).collect()]
    assert a == b, "old/new q5 diverge at sf0.01 — abort before timing"
    print("identity: old/new q5 bit-identical at sf0.01", file=sys.stderr)

    dest = build_scaled(spark, k, dest=f"/tmp/spark_graft_bench_{k}x",
                        reuse=True)
    _noop(q5_old(spark, dest))  # warm both arms
    _noop(q5_new(spark, dest))

    ts_old, ts_new, wins_new, discarded = [], [], 0, []
    retries = cycles  # episode-retry budget
    c = 0
    while c < cycles:
        t0 = time.perf_counter()
        _noop(q5_old(spark, dest))
        t_old = time.perf_counter() - t0
        t0 = time.perf_counter()
        _noop(q5_new(spark, dest))
        t_new = time.perf_counter() - t0
        floor = min(ts_old + ts_new + [t_old, t_new])
        if max(t_old, t_new) > 5 * floor and retries > 0:
            discarded.append({"old": round(t_old, 3), "new": round(t_new, 3)})
            retries -= 1
            continue
        ts_old.append(t_old)
        ts_new.append(t_new)
        wins_new += t_new < t_old
        c += 1
        print(json.dumps({"cycle": c, "old": round(t_old, 3),
                          "new": round(t_new, 3)}), file=sys.stderr)

    print(json.dumps({
        "k": k, "cycles": cycles,
        "old_median": round(statistics.median(ts_old), 3),
        "new_median": round(statistics.median(ts_new), 3),
        "old_min": round(min(ts_old), 3),
        "new_min": round(min(ts_new), 3),
        "new_wins": wins_new,
        "old_runs": [round(t, 3) for t in ts_old],
        "new_runs": [round(t, 3) for t in ts_new],
        "discarded_episode_cycles": discarded,
    }))


if __name__ == "__main__":
    main()
