"""Interleaved A/B for the r18 funnel restructure:

A = r17 chain: cur_k = cur_{k-1} LEFT-JOIN nxt_k, nxt_k joins cur_{k-1}
    (each cur referenced twice -> the logical tree doubles per step;
    8 parquet scans in the initial plan)
B = flat per-step frames: s_k = events[step k] JOIN s_{k-1}, final
    assembly users LEFT-JOIN s1 LEFT-JOIN s2 LEFT-JOIN s3 (each s_k
    referenced at most twice; 7 scans, shallower duplication)

Output equality asserted per cycle.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("AB_CYCLES", "5"))


def funnel_B(events, steps):
    us = F.unix_micros(F.col("ts"))
    frames = []
    prev = None
    for k, step in enumerate(steps, start=1):
        ev = events.filter(F.col("event_type") == step)
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min(us).alias("u1"))
        else:
            cur = (ev.select("user_id", us.alias("_ts"))
                   .join(prev.select("user_id", f"u{k - 1}"), "user_id")
                   .filter(F.col("_ts") > F.col(f"u{k - 1}"))
                   .groupBy("user_id").agg(F.min("_ts").alias(f"u{k}")))
        frames.append(cur)
        prev = cur
    out = events.select("user_id").distinct()
    for cur in frames:
        out = out.join(cur, "user_id", "left")
    depth = F.lit(0)
    for k in range(1, len(steps) + 1):
        depth = F.when(F.col(f"u{k}").isNotNull(), F.lit(k)).otherwise(depth)
    return out.select(
        "user_id", depth.cast("int").alias("depth"),
        *[F.col(f"u{k}").alias(f"t{k}_us") for k in range(1, len(steps) + 1)])


def main() -> None:
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.session import get_spark
    from coursera_etl_pipeline_spark.streaming.queries import (
        FUNNEL_STEPS,
        funnel_depth,
    )

    spark = get_spark("ab_funnel_r18")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    events = load_table(spark, SF_DIR, "events")
    arms = {"A": lambda: funnel_depth(events),
            "B": lambda: funnel_B(events, FUNNEL_STEPS)}
    ref = None
    times = {k: [] for k in arms}
    jobs = {k: [] for k in arms}
    for cyc in range(CYCLES):
        for arm, fn in arms.items():
            group = f"funnel:{arm}:{cyc}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            times[arm].append(time.perf_counter() - t0)
            spark.sparkContext.setJobGroup(None, None)
            jobs[arm].append(len(tracker.getJobIdsForGroup(group)))
            got = sorted(map(tuple, out.collect()))
            if ref is None:
                ref = got
            assert got == ref, f"arm {arm} differs"
    for arm in arms:
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {[round(t, 3) for t in times[arm]]} jobs {jobs[arm]}")


if __name__ == "__main__":
    main()
