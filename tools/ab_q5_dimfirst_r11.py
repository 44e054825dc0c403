"""Round-11 q5 dim-first A/B (the audit-rule sweep's one remaining hit).

q5's ASIA region restriction rides the broadcast customer/supplier
chain AFTER lineitem x orders shuffles; the customer side alone
implies an ~20% orders cut (5 of 25 nations) that can apply BEFORE
the fact-fact shuffle, and hashing the reduced orders side
(SHUFFLE_HASH) removes the lineitem-side sort — the q3/q7 mechanism.
Lineitem itself has no reachable pre-cut (its supplier constraint
needs the customer's nation, only known post-join), so the expected
win is bounded: the lineitem exchange is unchanged, only the orders
exchange shrinks and the sort disappears.

Identity assert at sf0.01, then interleaved old/new cycles; episode
guard at 5x (NOTE q7's lesson: a genuine >5x win also trips the
guard — read the raw cycle lines, not just the medians).

Usage: python tools/ab_q5_dimfirst_r11.py [cycles] [sf_dir]
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
from coursera_etl_pipeline_spark.registry import (  # noqa: E402
    dsum_join,
    dsum_split,
    micros_expr,
)
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402


def q5_dimfirst(spark, sf_dir):
    hi, lo = dsum_split("_m")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey",
                  F.expr(micros_expr("l_extendedprice * (1 - l_discount)"))
                  .alias("_m")))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # ASIA nations, broadcast into customer, customer into orders —
    # all before the fact-fact shuffle
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    c_cut = (c.join(F.broadcast(n_asia.select("n_nationkey", "n_name")),
                    c.c_nationkey == F.col("n_nationkey"))
             .select("c_custkey", F.col("c_nationkey").alias("_c_nk"),
                     "n_name"))
    o_cut = (o.join(F.broadcast(c_cut), o.o_custkey == c_cut.c_custkey)
             .select("o_orderkey", "_c_nk", "n_name")
             .hint("SHUFFLE_HASH"))
    return (
        li.join(o_cut, li.l_orderkey == o_cut.o_orderkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (F.col("_c_nk") == s.s_nationkey))
        .groupBy("n_name")
        .agg(F.expr(hi).alias("_hi"), F.expr(lo).alias("_lo"))
        .select("n_name", F.expr(dsum_join("_hi", "_lo")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def run_once(spark, fn, sf_dir):
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_100x"
    spark = get_spark("ab_q5_dimfirst")
    old = entrymod.queries()["q5_local_supplier_volume"]

    small = "/root/testdata/sf0.01"
    a = sorted(map(tuple, old(spark, small).collect()))
    b = sorted(map(tuple, q5_dimfirst(spark, small).collect()))
    assert a == b, f"IDENTITY MISMATCH:\n{a}\nvs\n{b}"
    print(f"identity ok: {len(a)} rows bit-equal at sf0.01", flush=True)

    olds, news = [], []
    run_once(spark, old, sf_dir)  # warm
    for cy in range(cycles):
        t_old = run_once(spark, old, sf_dir)
        t_new = run_once(spark, q5_dimfirst, sf_dir)
        olds.append(t_old)
        news.append(t_new)
        print(f"cycle {cy}: old={t_old:.2f} new={t_new:.2f}", flush=True)
    print(json.dumps({
        "old": olds, "new": news,
        "median_old": statistics.median(olds),
        "median_new": statistics.median(news),
    }))


if __name__ == "__main__":
    main()
