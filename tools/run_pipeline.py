"""End-to-end pipeline CLI — the engine-side replacement for the
reference's two Cloud Run services (extract-service + transform-service)
and their manual trigger ordering.

    # extract: GraphQL response -> timestamped landing JSON (O1, O6, O7)
    python tools/run_pipeline.py extract --landing /tmp/landing \\
        [--url https://api... | --mock]    # --mock uses the offline fixture

    # transform: landing glob -> courses CSV (+ optional warehouse table)
    python tools/run_pipeline.py transform --landing /tmp/landing \\
        --out /tmp/courses_csv [--table courses] [--all-files] [--typed]

    # stream: incremental transform, exactly-once per file (O21 fixed)
    python tools/run_pipeline.py stream --landing /tmp/landing \\
        --out /tmp/courses_ds --checkpoint /tmp/chk

A reference user maps their workflow 1:1: the daily Cloud Scheduler hit
becomes `extract` + `transform` (or the always-correct `stream`, which
also removes the transform-before-extract crash and the rerun
double-append, SURVEY §3.3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402


def cmd_extract(args) -> None:
    from coursera_etl_pipeline_spark.plans import fixtures
    from coursera_etl_pipeline_spark.sources import http_graphql

    if args.mock:
        payload = fixtures.make_response(3, 4)
    else:
        payload = http_graphql.validate_payload(
            http_graphql.fetch_graphql(args.url, args.query or "",
                                       json.loads(args.variables)))
    os.makedirs(args.landing, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = fixtures.write_response_file(payload, args.landing, stamp)
    print(f"wrote {path}")


def cmd_transform(args) -> None:
    from coursera_etl_pipeline_spark.plans import pipeline

    spark = get_spark("pipeline_transform")
    spark.sparkContext.setLogLevel("ERROR")
    df = pipeline.run_transform(
        spark, f"{args.landing}/coursera_response_*.json",
        latest_only=not args.all_files, parity=not args.typed)
    pipeline.write_csv(df, args.out)
    n = spark.read.option("header", "true").csv(args.out).count()
    if args.table:
        pipeline.append_to_table(df, args.table,
                                 dedup_keys=["course_id", "collection_id"])
    print(f"wrote {n} course rows -> {args.out}"
          + (f" and appended to table {args.table}" if args.table else ""))


def cmd_stream(args) -> None:
    from coursera_etl_pipeline_spark.streaming import pipeline_stream

    spark = get_spark("pipeline_stream")
    spark.sparkContext.setLogLevel("ERROR")
    courses = pipeline_stream.stream_courses(
        spark, f"{args.landing}/coursera_response_*.json")
    q = pipeline_stream.start_append(
        courses, args.out, args.checkpoint,
        dedup_keys=["course_id", "collection_id"])
    q.awaitTermination()
    print(f"dataset now holds {spark.read.parquet(args.out).count()} rows")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract", help="GraphQL -> timestamped landing JSON")
    e.add_argument("--landing", required=True)
    e.add_argument("--url")
    e.add_argument("--query", default="")
    e.add_argument("--variables", default="{}")
    e.add_argument("--mock", action="store_true",
                   help="use the offline fixture payload (no network)")
    e.set_defaults(fn=cmd_extract)

    t = sub.add_parser("transform", help="landing glob -> courses CSV/table")
    t.add_argument("--landing", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--table")
    t.add_argument("--all-files", action="store_true",
                   help="process every landed file, not just the latest")
    t.add_argument("--typed", action="store_true",
                   help="typed columns instead of reference CSV parity")
    t.set_defaults(fn=cmd_transform)

    s = sub.add_parser("stream", help="incremental exactly-once transform")
    s.add_argument("--landing", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint", required=True)
    s.set_defaults(fn=cmd_stream)

    args = p.parse_args()
    if args.cmd == "extract" and not args.mock and not args.url:
        p.error("extract needs --url or --mock")
    args.fn(args)


if __name__ == "__main__":
    main()
