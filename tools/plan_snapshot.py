"""Snapshot `.explain("formatted")` for headline queries into
plans/r18/<query>_<tag>.txt — the optimization round's evidence files
(the judge checks plan-shape claims against these, guide §1).

Usage:
    python tools/plan_snapshot.py before [name ...]   # default: HEADLINE
    python tools/plan_snapshot.py after  dedup_simhash ...

Each file holds the FORMATTED physical plan rendered at
$SPARK_GRAFT_SF_DIR (default sf0.1 — the bench's scale), plus a
one-line header with the fixture dir so a reader knows what was
planned. AQE plans print `isFinalPlan=false`; the shape claims
(Exchange count, join strategy, PushedFilters) are all visible in the
initial plan, which is what explain() can show without executing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18"))


def main() -> int:
    import bench
    import __spark_entry__ as entrymod
    from coursera_etl_pipeline_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            continue
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) @ {SF_DIR}\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
