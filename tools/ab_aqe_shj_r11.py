"""Round-11 A/B: AQE runtime SMJ->SHJ conversion across the join family.

The q3 rewrite won at sf100 partly by replacing the sort-merge join's
per-partition sort of the huge lineitem side with a SHUFFLE_HASH build
on the dim-reduced orders side. That was a per-query hint; Spark has
the adaptive generalization built in:

    spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold

When set >= advisoryPartitionSizeInBytes, AQE converts a sort-merge
join to a shuffled hash join AT RUNTIME whenever every build-side
post-shuffle partition is under the threshold — i.e. the decision is
made from MEASURED shuffle sizes, not estimates, so it is exactly as
safe at 100 TB as the cluster's per-executor memory budget: an
oversized build side simply stays sort-merge. If this wins broadly,
it belongs in session.py as a default and the q3-style hint becomes
unnecessary for future operators.

Protocol: one session (the conf is runtime-settable SQL conf),
interleaved OFF/ON cycles per query on the K=100 (~sf10) replica,
episode cycles (either arm > 5x its running floor) discarded and
reported. Identity is not at issue — join strategy cannot change
values under the decimal-accumulator aggregates — but the oracle gate
still re-certifies everything at sf0.01 before any conversion ships.

Usage: python tools/ab_aqe_shj_r11.py [cycles] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402

THRESHOLD = "128MB"

# Join-family rows where a fact-fact sort-merge join is on the plan's
# critical path at sf10+ (q3 already converted by hand; it runs here
# too as a sanity row — its hint wins regardless of the conf).
QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q9_product_type_profit",
    "q10_returned_items",
    "q18_large_orders",
]
if os.environ.get("SPARK_GRAFT_AB_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_AB_QUERIES"].split(",")

CONF = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"


def run_once(spark, fn, sf_dir):
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_100x"
    spark = get_spark("ab_aqe_shj")
    qs = entrymod.queries()
    base = spark.conf.get(CONF, "0")
    out = {}
    for name in QUERIES:
        fn = qs[name]
        run_once(spark, fn, sf_dir)  # warm scan caches, JIT
        offs, ons, dropped = [], [], 0
        for c in range(cycles):
            spark.conf.set(CONF, base)
            t_off = run_once(spark, fn, sf_dir)
            spark.conf.set(CONF, THRESHOLD)
            t_on = run_once(spark, fn, sf_dir)
            floor = min(offs + ons + [t_off, t_on])
            if max(t_off, t_on) > 5 * floor:
                dropped += 1
                print(f"  {name} cycle {c}: EPISODE dropped "
                      f"(off={t_off:.2f} on={t_on:.2f})", flush=True)
                continue
            offs.append(t_off)
            ons.append(t_on)
            print(f"  {name} cycle {c}: off={t_off:.2f} on={t_on:.2f}",
                  flush=True)
        med_off = statistics.median(offs) if offs else None
        med_on = statistics.median(ons) if ons else None
        out[name] = {"off": offs, "on": ons, "median_off": med_off,
                     "median_on": med_on, "dropped": dropped,
                     "speedup": (med_off / med_on) if offs and ons else None}
        print(f"{name}: median off={med_off:.2f} on={med_on:.2f} "
              f"speedup={out[name]['speedup']:.2f}x", flush=True)
    spark.conf.set(CONF, base)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
