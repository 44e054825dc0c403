"""Round-13 gated-broadcast arm A/B at a scaled replica.

Round 13 converted the q-series' static F.broadcast hints on
fact-scaled dimensions (customer/supplier/part) to the stats-gated
catalog.gated_broadcast (VERDICT r12 item 1). At K=1000 (~sf100) the
gate selects the SHUFFLE_HASH arm for customer (168 MB parquet) and
part (136 MB) — a plan change vs the broadcast arm the standing
BASELINE §4 rows were recorded under. This tool measures both arms
interleaved on the same session/replica so host weather hits them
equally:

  arm A (gated)  — the shipped code; dataset_nbytes reads real stats
  arm B (bcast)  — catalog.dataset_nbytes monkeypatched to 1 byte, so
                   the gate always picks F.broadcast

Both arms run the CURRENT query bodies, so the A/B isolates the
JOIN-STRATEGY choice alone. For queries that also changed shape this
round (q10/q18's eager-aggregation rewrites landed after their arm
A/Bs ran), arm B is the forced-broadcast variant of the NEW shape —
comparisons against pre-r13 standing rows compound the two changes
and are labelled as such in BASELINE §4.

Identity is asserted at sf0.01 (same rows both arms) before timing.

Usage: python tools/ab_gate_r13.py [cycles] [dest] [query ...]
Default queries: q10_returned_items q18_large_orders (the two worst
standing sf100 rows — both carried full-customer broadcasts).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import coursera_etl_pipeline_spark.catalog as catalog  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402

REAL_NBYTES = catalog.dataset_nbytes


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _rows(df):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


def main() -> None:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench_1000x"
    names = sys.argv[3:] or ["q10_returned_items", "q18_large_orders"]
    spark = get_spark("ab_gate_r13")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    def gated_on() -> None:
        catalog.dataset_nbytes = REAL_NBYTES

    def bcast_on() -> None:
        catalog.dataset_nbytes = lambda p: 1

    out = {}
    for name in names:
        fn = queries[name]
        # identity at sf0.01: force each arm explicitly (at sf0.01 the
        # real stats would pick broadcast for both, proving nothing)
        catalog.dataset_nbytes = lambda p: 10**12  # shuffle arm
        a = _rows(fn(spark, "/root/testdata/sf0.01"))
        bcast_on()
        b = _rows(fn(spark, "/root/testdata/sf0.01"))
        gated_on()
        assert a == b, f"{name}: arms disagree at sf0.01"

        times = {"gated": [], "bcast": []}
        for arm, setter in (("gated", gated_on), ("bcast", bcast_on)):
            setter()
            _noop(fn(spark, dest))  # warm this arm once
        gated_on()
        for i in range(cycles):
            for arm, setter in (("gated", gated_on), ("bcast", bcast_on)):
                setter()
                t0 = time.perf_counter()
                _noop(fn(spark, dest))
                dt = round(time.perf_counter() - t0, 3)
                times[arm].append(dt)
                print(json.dumps({name: {arm: dt, "cycle": i}}),
                      file=sys.stderr)
        gated_on()
        out[name] = {
            "gated": times["gated"], "bcast": times["bcast"],
            "gated_median": round(statistics.median(times["gated"]), 3),
            "bcast_median": round(statistics.median(times["bcast"]), 3),
        }
    print(json.dumps({"dest": dest, "cycles": cycles, "rows": out}))


if __name__ == "__main__":
    main()
