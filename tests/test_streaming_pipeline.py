"""Streaming reference-pipeline e2e + stateful operator tests."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.plans import fixtures, pipeline
from coursera_etl_pipeline_spark.streaming import pipeline_stream, stateful


def test_streaming_pipeline_incremental_and_idempotent(spark, tmp_path):
    """File 1 arrives -> 6 rows; file 2 (4 new + full re-delivery of
    file 1's content) -> only the 12 new rows append. The reference
    would have produced 6 + 16 = 22 rows (duplicates)."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "courses")
    chk = str(tmp_path / "chk")
    (tmp_path / "landing").mkdir()

    fixtures.write_response_file(fixtures.make_response(2, 3), landing, "20240101_000000")
    courses = pipeline_stream.stream_courses(spark, f"{landing}/coursera_response_*.json")
    keys = ["course_id", "collection_id"]
    pipeline_stream.start_append(courses, out, chk, dedup_keys=keys).awaitTermination()
    assert spark.read.parquet(out).count() == 6

    # file 2: a superset payload (re-delivers the same 2x3 plus 2 more collections)
    fixtures.write_response_file(fixtures.make_response(4, 3), landing, "20240102_000000")
    courses2 = pipeline_stream.stream_courses(spark, f"{landing}/coursera_response_*.json")
    pipeline_stream.start_append(courses2, out, chk, dedup_keys=keys).awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == 12  # 6 old (not duplicated) + 6 genuinely new
    assert got.select(*keys).distinct().count() == 12
    assert got.columns[: len(pipeline.COURSE_COLUMNS)] == pipeline.COURSE_COLUMNS


def test_stateful_user_profiles_accumulate_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    deliver the same users in two files, profiles must accumulate."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < 10)
          .select("user_id", "ts", "value").cache())
    half1 = ev.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    half2 = ev.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
    landing = str(tmp_path / "landing")
    half1.write.mode("append").parquet(landing)

    # one live query, two file arrivals: state carries across the
    # micro-batches inside the running query
    name = f"profiles_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.schema(half1.schema).parquet(landing))
    q = (stateful.user_profiles(stream).writeStream.outputMode("update")
         .format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "chk"))
         .start())
    q.processAllAvailable()
    half2.write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()

    # memory sink in update mode appends each emission; take the last
    # row per user = final state
    final = (spark.table(name)
             .groupBy("user_id").agg(F.max("n_events").alias("n")))
    expect = ev.groupBy("user_id").count()
    got = {r.user_id: r.n for r in final.collect()}
    for r in expect.collect():
        assert got[r.user_id] == r["count"], f"user {r.user_id} state lost"
