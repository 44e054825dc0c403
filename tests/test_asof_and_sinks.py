"""As-of join unit semantics, physical-layout sinks (partitioning,
bucketing), observe() metrics, approx-aggregate error bounds."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.operators.asof import asof_join
from coursera_etl_pipeline_spark.operators.subqueries import agg_approx
from coursera_etl_pipeline_spark.sources import sinks


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 50, "e3")],
        "k long, ts long, ev string")
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 60, "r60")],
        "k long, rts long, tag string")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_values=["tag"])
    got = {r.ev: r.asof_tag for r in out.collect()}
    assert got == {
        "e0": None,    # no right row at/before ts=5
        "e1": "r10",   # tie at ts=10 -> inclusive (<=)
        "e2": "r15",   # latest at/before 20
        "e3": None,    # right exists only after
    }


def test_partitioned_write_and_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders") \
        .withColumn("order_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_part")
    sinks.write_partitioned(orders, path, ["order_year"])

    back = sinks.read_partition_pruned(spark, path)
    pruned = back.filter(F.col("order_year") == 1998)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "order_year" in plan
    expect = orders.filter(F.col("order_year") == 1998).count()
    assert pruned.count() == expect > 0


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """Two tables co-bucketed on the join key must join with no
    Exchange — the zero-shuffle co-located join."""
    import shutil
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a crashed run can leave the managed location behind with no
        # catalog entry; clear it or saveAsTable refuses the name
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    sinks.write_bucketed(load_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey")
    sinks.write_bucketed(load_table(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey")

    # force the sort-merge path (tiny test data would broadcast, which
    # bypasses bucketing; at real scale SMJ is what bucketing serves)
    j = (spark.table("b_lineitem").hint("merge")
         .join(spark.table("b_orders"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("o_orderstatus").count())
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    # no shuffle on either join key — buckets are already co-located
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_observe_metrics(spark, sf_dir, tmp_path):
    """O5's len() counts as riding observations — no second pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25)
    observed, obs = sinks.with_observed_counts(li)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get["n_rows"] == li.count()


def test_approx_aggs_within_error_bounds(spark, sf_dir):
    """agg_approx emits the bounds contract (subqueries.py:144-178):
    the exact distinct count as a hash anchor plus within-tolerance
    booleans for the HLL++ count and the KLL quantile sketch — assert
    every flag is TRUE and the anchor matches an independent exact
    recompute."""
    rows = {r.l_returnflag: r for r in agg_approx(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {r.l_returnflag: r.nd for r in
             li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("nd")).collect()}
    assert set(rows) == set(exact)
    for flag, nd in exact.items():
        a = rows[flag]
        assert a.exact_parts == nd
        assert a.cd_within_10pct          # HLL ~2% rsd, 10% gate
        assert a.median_within_5pct       # quantile sketch
        assert a.p25_within_5pct and a.p75_within_5pct


def test_merge_upsert_and_scd2_helpers(spark):
    from coursera_etl_pipeline_spark.operators.merge import merge_upsert, scd2_apply
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double")
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, v string, x double")
    snap = {r.k: (r.v, r.x) for r in merge_upsert(target, source, "k").collect()}
    assert snap == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    hist = spark.createDataFrame(
        [(1, 10.0, 1, True), (2, 20.0, 1, True)], "k long, x double, version int, is_current boolean")
    changes = spark.createDataFrame([(2, 25.0), (5, 50.0)], "k long, x double")
    out = scd2_apply(hist, changes, "k")
    rows = {(r.k, r.version): (r.x, r.is_current) for r in out.collect()}
    assert rows[(1, 1)] == (10.0, True)     # untouched stays current
    assert rows[(2, 1)] == (20.0, False)    # old version closed out
    assert rows[(2, 2)] == (25.0, True)     # new version current
    assert rows[(5, 1)] == (50.0, True)     # brand-new key starts at v1


def test_range_clustered_layout_disjoint_file_stats(spark, sf_dir, tmp_path):
    """write_range_clustered must produce files whose parquet footer
    min/max ranges on the cluster column are non-overlapping (boundary
    values may touch) — the property that lets range predicates skip
    whole files at scan time."""
    import glob

    import pyarrow.parquet as pq

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "orders_clustered")
    sinks.write_range_clustered(orders, path, "o_orderkey", n_files=6)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # o_orderkey
            assert col.path_in_schema == "o_orderkey"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4  # range partitioner actually split the data
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file value ranges overlap - no data skipping"

    back = spark.read.parquet(path)
    assert back.count() == orders.count()


def test_binaryfile_blob_ingest(spark, tmp_path):
    """read_blob_files: real binaryFile source -> blob schema; media
    type from extension; features computable over the payloads."""
    from coursera_etl_pipeline_spark.llm_ops import multimodal

    (tmp_path / "a.png").write_bytes(b"\x89PNG fake image bytes")
    (tmp_path / "b.wav").write_bytes(b"RIFF fake audio bytes!!")
    (tmp_path / "c.bin").write_bytes(b"\x00\x01\x02")

    blobs = multimodal.read_blob_files(spark, str(tmp_path))
    rows = {r.source_path.rsplit("/", 1)[-1]: r for r in blobs.collect()}
    assert set(rows) == {"a.png", "b.wav", "c.bin"}
    assert rows["a.png"].media_type == "image/png"
    assert rows["b.wav"].media_type == "audio/wav"
    assert rows["c.bin"].media_type == "application/octet-stream"
    assert rows["a.png"].n_bytes == 21
    assert bytes(rows["c.bin"].payload) == b"\x00\x01\x02"
    assert len({r.doc_id for r in rows.values()}) == 3  # distinct ids

    feats = multimodal.extract_features(blobs.drop("source_path")).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r.features) == multimodal.N_FEATURES
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_dynamic_partition_overwrite_touches_only_loaded_partitions(spark, sf_dir, tmp_path):
    """Re-loading one year must rewrite ONLY that year's partition
    directory; other partitions' files stay byte-identical (same names,
    same mtimes) — the idempotent-backfill contract."""
    import glob
    import os

    orders = load_table(spark, sf_dir, "orders") \
        .withColumn("order_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_dyn")
    sinks.write_partitioned(orders, path, ["order_year"])

    def snapshot(year):
        return {f: os.path.getmtime(f)
                for f in glob.glob(f"{path}/order_year={year}/*.parquet")}

    before_1996 = snapshot(1996)
    before_1998 = snapshot(1998)
    assert before_1996 and before_1998

    redo = orders.filter(F.col("order_year") == 1998) \
        .withColumn("o_orderpriority", F.lit("5-LOW"))
    sinks.overwrite_partitions(redo, path, ["order_year"])

    assert snapshot(1996) == before_1996          # untouched partition intact
    assert snapshot(1998) != before_1998          # reloaded partition replaced
    back = spark.read.parquet(path)
    assert back.filter("order_year = 1998") \
        .select("o_orderpriority").distinct().collect()[0][0] == "5-LOW"
    n96 = orders.filter("order_year = 1996").count()
    assert back.filter("order_year = 1996").count() == n96
