"""Interleaved A/B for the r18 keyed fan-out on the events family:

A = round-robin fan-out (load_table default): every downstream
    operator pays its own exchange (agg on (user,bucket), grid agg on
    user, window on user, ...)
B = cluster_by=("user_id",) fan-out: ONE hash exchange on user_id that
    every downstream groupBy/join/window clustering requirement reuses

Arms run the full registered queries (resample_gapfill, session_window,
funnel, retention). Equality asserted per cycle via count + xxhash64
checksum over all columns (order-insensitive, the oracle's own
comparison class). Job counts per execution recorded alongside medians.
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


def _checksum(df):
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    row = df.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")).collect()[0]
    return row["n"], row["h"]


def build_queries(spark, keyed: bool):
    """The four event queries, parameterized only by the loader key."""
    from coursera_etl_pipeline_spark.catalog import load_table
    from coursera_etl_pipeline_spark.streaming import queries as Q

    cluster = ("user_id",) if keyed else None
    e = load_table(spark, SF_DIR, "events", cluster_by=cluster)

    from pyspark.sql import Window as W

    def resample():
        from coursera_etl_pipeline_spark.llm_ops.dedup import _materialize
        from coursera_etl_pipeline_spark.registry import dsum
        step = 43200
        bucket = (F.floor(F.unix_timestamp("ts") / step) * step).cast("long")
        b = _materialize(
            e.withColumn("bucket", bucket)
            .groupBy("user_id", "bucket")
            .agg(F.expr(dsum("value")).alias("bucket_value"),
                 F.count(F.lit(1)).alias("n_events")))
        grid = (b.groupBy("user_id")
                .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
                .select("user_id",
                        F.explode(F.sequence("mn", "mx", F.lit(step))).alias("bucket")))
        w = (W.partitionBy("user_id").orderBy("bucket")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        return (grid.join(b, ["user_id", "bucket"], "left")
                .select("user_id",
                        F.date_format(F.timestamp_seconds("bucket"),
                                      "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
                        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
                        F.last("bucket_value", ignorenulls=True).over(w)
                        .alias("filled_value")))

    def session():
        from coursera_etl_pipeline_spark.registry import dsum
        return (e.groupBy(F.session_window("ts", "4 hours"), "user_id")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.expr(dsum("value")).alias("session_value"))
                .select(F.date_format("session_window.start",
                                      "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                        "user_id", "n_events", "session_value"))

    def funnel():
        return Q.funnel_depth(e)

    def retention():
        return Q.retention_cohorts(e)

    return {"resample": resample, "session": session,
            "funnel": funnel, "retention": retention}


def run_arm(spark, sc, fns, group: str):
    sc.setJobGroup(group, group)
    per = {}
    t0 = time.monotonic()
    for name, fn in fns.items():
        q0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        per[name] = round(time.monotonic() - q0, 3)
    dt = time.monotonic() - t0
    nj = len(sc.statusTracker().getJobIdsForGroup(group))
    return dt, nj, per


def main() -> None:
    from coursera_etl_pipeline_spark.session import get_spark

    spark = get_spark()
    sc = spark.sparkContext
    arms = {"A": build_queries(spark, keyed=False),
            "B": build_queries(spark, keyed=True)}

    # equality first, per query
    for qname in arms["A"]:
        ca = _checksum(arms["A"][qname]())
        cb = _checksum(arms["B"][qname]())
        assert ca == cb, f"{qname}: A {ca} != B {cb}"
        print(f"equal {qname}: n={ca[0]}")

    times: dict[str, list] = {"A": [], "B": []}
    jobs: dict[str, list] = {"A": [], "B": []}
    per_q: dict[str, dict] = {"A": {}, "B": {}}
    for cyc in range(CYCLES):
        for arm in ("A", "B") if cyc % 2 == 0 else ("B", "A"):
            dt, nj, per = run_arm(spark, sc, arms[arm],
                                  f"ab_events_key_{arm}_{cyc}")
            times[arm].append(round(dt, 3))
            jobs[arm].append(nj)
            for q, s in per.items():
                per_q[arm].setdefault(q, []).append(s)
    sc.setJobDescription(None)
    for arm in ("A", "B"):
        print(f"{arm}: median {statistics.median(times[arm]):.3f}s "
              f"samples {times[arm]} jobs {jobs[arm]}")
        for q, ss in per_q[arm].items():
            print(f"  {arm}.{q}: median {statistics.median(ss):.3f}s {ss}")


if __name__ == "__main__":
    main()
