"""Round-11 q7 dim-first A/B at the scaled replicas.

The r11 sf100 characterization left q7 as the worst standing join row
(~40 s warm-cache vs DuckDB ~8.4). Dissection: the registered plan
joins the UNFILTERED lineitem (600M rows at sf100) against the full
orders table FIRST, and only then applies the broadcast supplier/
customer/nation chain — but the nation-pair predicate implies
s_nationkey IN (3,7) and c_nationkey IN (3,7), each an ~8% cut, and
both cuts attach to the fact sides BEFORE the fact-fact shuffle:

  li2 = lineitem  x broadcast(supplier restricted to the two nations)
  o2  = orders    x broadcast(customer restricted to the two nations)
  li2 x o2 (SHUFFLE_HASH on o2), then the (supp, cust) pair filter.

Shuffle volume drops ~12.5x (600M+150M -> 48M+12M rows). Values are
bit-identical: inner-join reassociation plus pushing an implied
IN-list through the join — the residual pair filter still excludes
the (3,3)/(7,7) combinations post-join.

Protocol: identity assert at sf0.01 (collected rows equal), then
interleaved old/new cycles on an existing replica; episode cycles
(either arm > 5x the running floor) discarded and reported.

Usage: python tools/ab_q7_dimfirst_r11.py [cycles] [sf_dir]
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

NATIONS = ("NATION_3", "NATION_7")


def q7_dimfirst(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"))
    s_cut = (s.join(F.broadcast(n1.filter(F.col("supp_nation").isin(*NATIONS))),
                    F.col("s_nationkey") == F.col("n1_key"))
             .select("s_suppkey", "supp_nation"))
    c_cut = (c.join(F.broadcast(n2.filter(F.col("cust_nation").isin(*NATIONS))),
                    F.col("c_nationkey") == F.col("n2_key"))
             .select("c_custkey", "cust_nation"))
    li2 = li.join(F.broadcast(s_cut), li.l_suppkey == F.col("s_suppkey"))
    o2 = (o.join(F.broadcast(c_cut), o.o_custkey == F.col("c_custkey"))
          .select("o_orderkey", "cust_nation")
          .hint("SHUFFLE_HASH"))
    pair = (
        ((F.col("supp_nation") == NATIONS[0]) & (F.col("cust_nation") == NATIONS[1]))
        | ((F.col("supp_nation") == NATIONS[1]) & (F.col("cust_nation") == NATIONS[0])))
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.expr(dsum("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def run_once(spark, fn, sf_dir):
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_100x"
    spark = get_spark("ab_q7_dimfirst")
    old = entrymod.queries()["q7_nation_volume"]

    # identity assert at sf0.01
    small = "/root/testdata/sf0.01"
    a = sorted(map(tuple, old(spark, small).collect()))
    b = sorted(map(tuple, q7_dimfirst(spark, small).collect()))
    assert a == b, f"IDENTITY MISMATCH: {len(a)} vs {len(b)} rows"
    print(f"identity ok: {len(a)} rows bit-equal at sf0.01", flush=True)

    olds, news, dropped = [], [], 0
    run_once(spark, old, sf_dir)  # warm
    for cy in range(cycles):
        t_old = run_once(spark, old, sf_dir)
        t_new = run_once(spark, q7_dimfirst, sf_dir)
        floor = min(olds + news + [t_old, t_new])
        if max(t_old, t_new) > 5 * floor:
            dropped += 1
            print(f"cycle {cy}: EPISODE dropped (old={t_old:.2f} new={t_new:.2f})",
                  flush=True)
            continue
        olds.append(t_old)
        news.append(t_new)
        print(f"cycle {cy}: old={t_old:.2f} new={t_new:.2f}", flush=True)
    print(json.dumps({
        "old": olds, "new": news, "dropped": dropped,
        "median_old": statistics.median(olds) if olds else None,
        "median_new": statistics.median(news) if news else None,
    }))


if __name__ == "__main__":
    main()
