"""Per-query runtime profile: jobs / stages / tasks / wall-clock for
each headline query (optimization-round evidence, guide §1/§7).

For every headline row: one warm-up noop run, then one profiled noop
run inside a dedicated job group; the status tracker then reports how
many Spark jobs the query launched and how many stages/tasks ran.
High job counts expose driver-sequenced loops (iterative algorithms,
eager probes); high stage counts expose deep shuffle chains — both
are the fixed-overhead drivers at bench scale and the shuffle-count
drivers at 100 TB.

Usage: python tools/profile_bench.py [name ...] > profile.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import bench
    import __spark_entry__ as entrymod
    from coursera_etl_pipeline_spark.session import get_spark

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        # warm-up: parquet footers, codegen, and any memoized artifacts
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        group = f"profile:{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        # NOTE: plan CONSTRUCTION can itself launch jobs (eager probes,
        # iterative loops); building inside the group charges them too.
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        job_ids = sorted(tracker.getJobIdsForGroup(group))
        n_stages = n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {"sec": round(dt, 3), "jobs": len(job_ids),
                     "stages_run": n_stages, "tasks": n_tasks}
        print(f"{name:40s} {dt:7.3f}s jobs={len(job_ids):3d} "
              f"stages={n_stages:3d} tasks={n_tasks:5d}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
