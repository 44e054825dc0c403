"""HTTP/GraphQL source tests (O1/O2) — offline via mock_response."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.plans import fixtures, pipeline
from coursera_etl_pipeline_spark.sources import http_graphql


@pytest.fixture(scope="module")
def registered(spark):
    assert http_graphql.register(spark), "Python DataSource API missing"
    return spark


def test_source_emits_raw_payload_rows(registered):
    payload = fixtures.make_response(2, 2)
    df = (registered.read.format("http_graphql")
          .option("mock_response", json.dumps(payload)).load())
    assert df.columns == ["value"]
    rows = df.collect()
    assert len(rows) == 1  # one top-level element
    assert json.loads(rows[0].value) == payload[0]


def test_source_into_pipeline(registered):
    """Full extract->transform chain without files: source -> from_json
    -> the same transform plan (O1 -> O10 -> O3..O16)."""
    payload = fixtures.make_response(2, 3)
    raw = (registered.read.format("http_graphql")
           .option("mock_response", json.dumps(payload)).load())
    typed = raw.select(F.from_json("value", pipeline.RESPONSE).alias("r")).select("r.*")
    out = pipeline.transform_courses(typed)
    assert out.count() == 6
    assert out.columns == pipeline.COURSE_COLUMNS


def test_paginated_source_one_partition_per_page(registered):
    """pages=N plans N input partitions, each reading its own page;
    rows from every page land in the result exactly once."""
    pages = [fixtures.make_response(1, i + 1) for i in range(3)]
    df = (registered.read.format("http_graphql")
          .option("pages", "3")
          .option("mock_pages", json.dumps(pages)).load())
    assert df.rdd.getNumPartitions() == 3
    rows = [json.loads(r.value) for r in df.collect()]
    assert len(rows) == 3
    # page i's single collection carries i+1 entities — all distinct pages present
    sizes = sorted(len(p["data"]["DiscoveryCollections"]["queryCollections"][0]["entities"])
                   for p in rows)
    assert sizes == [1, 2, 3]


def test_error_payload_fails_job(registered):
    df = (registered.read.format("http_graphql")
          .option("mock_response", json.dumps(fixtures.ERROR_RESPONSE)).load())
    with pytest.raises(Exception, match="(?i)error"):
        df.collect()


def test_validate_payload_unit():
    with pytest.raises(ValueError, match="RATE_LIMITED|error"):
        http_graphql.validate_payload(fixtures.ERROR_RESPONSE)
    with pytest.raises(ValueError, match="[Ee]mpty"):
        http_graphql.validate_payload([])
    ok = fixtures.make_response(1, 1)
    assert http_graphql.validate_payload(ok) is ok
