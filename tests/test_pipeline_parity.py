"""E2E pipeline-parity tests (SURVEY §5.2 items 2 and 4).

Reference-shaped nested JSON -> full transform plan -> exact 15-column
output with the reference's sentinel semantics
(transform-service/main.py:113-157), plus the edge cases the reference
handles by raising.
"""

from __future__ import annotations

import pytest

from coursera_etl_pipeline_spark.plans import fixtures, pipeline
from coursera_etl_pipeline_spark.sources import files


@pytest.fixture()
def landing(tmp_path):
    return str(tmp_path)


def test_happy_path_schema_and_values(spark, landing):
    fixtures.write_response_file(fixtures.make_response(2, 3), landing, "20240101_000000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")

    assert out.columns == pipeline.COURSE_COLUMNS
    rows = {r.course_id: r for r in out.collect()}
    assert len(rows) == 6  # 2 collections x 3 entities

    # entity 0: specialization in collection 0 (fixture is index-deterministic)
    r = rows["ent-0"]
    assert r.collection_label == "Collection 0"
    assert r.collection_id == "coll-0"
    assert r.course_name == "Course 0"
    assert r.slug == "slug-0"
    assert r.url == "/learn/slug-0"
    assert r.image_url == "https://img.example/0.png"
    # O12/O13: struct-array and string-array joined with ", "
    assert r.partners == "Partner 0, Partner 1"
    assert r.partner_ids == "p0, p1"
    assert r.difficulty_level == "Beginner"
    assert r.is_part_of_coursera_plus is False
    assert r.course_count == "3"          # specialization -> stringified int
    assert r.is_cost_free == "N/A"        # course-only field absent
    assert r.marketing_product_type == "SPECIALIZATION"
    assert r.is_pathway_content is True

    # entity 1: course variant — isCostFree present, courseCount absent
    r1 = rows["ent-1"]
    assert r1.course_count == "N/A"
    assert r1.is_cost_free == "False"     # Python str(bool) capitalization
    rows4 = rows["ent-4"]                 # course variant, i%4==0
    assert rows4.is_cost_free == "True"


def test_optional_defaults_match_reference(spark, landing):
    """Entities missing every optional field -> the O15 defaults of
    transform-service/main.py:123-128: 'N/A' strings, False bool."""
    fixtures.write_response_file(
        fixtures.make_response(1, 3, drop_optionals=True), landing, "20240101_000000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")
    for r in out.collect():
        assert r.difficulty_level == "N/A"
        assert r.is_part_of_coursera_plus is False
        assert r.course_count == "N/A"
        assert r.is_cost_free == "N/A"


def test_typed_mode_keeps_real_types(spark, landing):
    fixtures.write_response_file(fixtures.make_response(1, 3), landing, "20240101_000000")
    out = pipeline.run_transform(
        spark, f"{landing}/coursera_response_*.json", parity=False)
    schema = dict(out.dtypes)
    assert schema["course_count"] == "int"
    assert schema["is_cost_free"] == "boolean"
    r = {x.course_id: x for x in out.collect()}
    assert r["ent-0"].course_count == 3
    assert r["ent-1"].course_count is None


def test_latest_file_selection(spark, landing):
    """O9: only the lexicographically-latest timestamped file feeds the
    transform (transform-service/main.py:89)."""
    fixtures.write_response_file(fixtures.make_response(1, 2), landing, "20240101_000000")
    fixtures.write_response_file(fixtures.make_response(3, 4), landing, "20240102_120000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")
    assert out.count() == 12  # only the 3x4 file

    all_files = pipeline.run_transform(
        spark, f"{landing}/coursera_response_*.json", latest_only=False)
    assert all_files.count() == 14


def test_error_payload_raises(spark, landing):
    fixtures.write_response_file(fixtures.ERROR_RESPONSE, landing, "20240101_000000")
    with pytest.raises(pipeline.PipelineValidationError, match="error"):
        pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")


def test_empty_collections_raises(spark, landing):
    fixtures.write_response_file(fixtures.EMPTY_RESPONSE, landing, "20240101_000000")
    with pytest.raises(pipeline.PipelineValidationError, match="[Nn]o collections"):
        pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")


def test_missing_required_productcard_nulls_not_crash(spark, landing):
    """Reference crashes on absent productCard (transform-service/
    main.py:129-134); engine policy is tolerant nulls (SURVEY §7.0.2)."""
    payload = fixtures.make_response(1, 1)
    del payload[0]["data"]["DiscoveryCollections"]["queryCollections"][0]["entities"][0]["productCard"]
    fixtures.write_response_file(payload, landing, "20240101_000000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")
    r = out.collect()[0]
    assert r.marketing_product_type is None
    assert r.is_pathway_content is None


def test_csv_sink_roundtrip(spark, landing, tmp_path):
    """O17: header CSV in the fixed 15-column order."""
    fixtures.write_response_file(fixtures.make_response(1, 3), landing, "20240101_000000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")
    dest = str(tmp_path / "courses_csv")
    pipeline.write_csv(out, dest)
    back = spark.read.option("header", "true").csv(dest)
    assert back.columns == pipeline.COURSE_COLUMNS
    assert back.count() == 3


def test_csv_ingest_autodetect_matches_explicit(spark, landing, tmp_path):
    """O19 autodetect parity (transform-service/main.py:64,
    autodetect=True): schema inference over the parity CSV must land on
    exactly the documented explicit schema — booleans for the two
    True/False columns, string everywhere the 'N/A' sentinel appears —
    and read identical rows."""
    fixtures.write_response_file(
        fixtures.make_response(2, 3, drop_optionals=True), landing, "20240101_000000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")
    dest = str(tmp_path / "courses_csv")
    pipeline.write_csv(out, dest)

    inferred = pipeline.read_courses_csv(spark, dest, infer_schema=True)
    explicit = pipeline.read_courses_csv(spark, dest)
    assert [(f.name, f.dataType) for f in inferred.schema.fields] == \
           [(f.name, f.dataType) for f in explicit.schema.fields]
    key = pipeline.COURSE_COLUMNS
    assert sorted(map(tuple, inferred.select(*key).collect())) == \
           sorted(map(tuple, explicit.select(*key).collect()))
    assert inferred.count() == 6


def test_append_dedup_idempotent(spark, landing, tmp_path):
    """SURVEY §7.0.3: re-delivering the same rows must NOT duplicate
    (the reference's WRITE_APPEND rerun hazard, transform-service/
    main.py:65). Raw mode preserves reference behavior."""
    spark.sql("DROP TABLE IF EXISTS courses_dedup_test")
    fixtures.write_response_file(fixtures.make_response(1, 3), landing, "20240101_000000")
    out = pipeline.run_transform(spark, f"{landing}/coursera_response_*.json")

    keys = ["course_id", "collection_id"]
    pipeline.append_to_table(out, "courses_dedup_test", dedup_keys=keys)
    pipeline.append_to_table(out, "courses_dedup_test", dedup_keys=keys)  # rerun
    assert spark.table("courses_dedup_test").count() == 3

    pipeline.append_to_table(out, "courses_dedup_test", dedup_keys=None)  # parity mode
    assert spark.table("courses_dedup_test").count() == 6
    spark.sql("DROP TABLE IF EXISTS courses_dedup_test")


def test_source_file_helpers(tmp_path):
    """O7/O8/O9 driver-side helpers."""
    d = str(tmp_path)
    for ts in ("20240101_000000", "20240103_000000", "20240102_000000"):
        fixtures.write_response_file(fixtures.make_response(1, 1), d, ts)
    found = files.discover(d, "coursera_response_")
    assert len(found) == 3
    assert files.latest_path(d, "coursera_response_").endswith("20240103_000000.json")
    with pytest.raises(FileNotFoundError):
        files.latest_path(d, "nonexistent_prefix_")
    name = files.timestamped_name("coursera_response", ".json")
    assert name.startswith("coursera_response_") and name.endswith(".json")
