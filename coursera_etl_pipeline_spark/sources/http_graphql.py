"""HTTP/GraphQL source (O1, extract-service/main.py:148-192).

Spark has no built-in HTTP source; this is a Python DataSource
(pyspark.sql.datasource, Spark 4.x) registered as
``spark.read.format("http_graphql")``. It emits one row per top-level
response element with the raw JSON payload in a ``value`` column;
parsing into the typed tree is a separate operator
(``F.from_json(value, RESPONSE)``), mirroring the reference's
raw-JSON-to-GCS then parse split (O6 -> O10).

The reference issues exactly ONE unpaginated POST (extract-service/
main.py:46-49,152), so the source plans a single input partition. A
paginated API would map one partition per page — the hook is
``partitions()``.

Offline use (tests, this container): pass ``mock_response`` with the
JSON payload instead of ``url``; no network is touched.
"""

from __future__ import annotations

import json
import urllib.request

try:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - Spark < 4.0
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    HAS_DATASOURCE_API = False


def fetch_graphql(url: str, query: str, variables: dict | None = None,
                  timeout: int = 60) -> list:
    """One POST, parsed JSON back — the entire 'execution engine' of
    the reference's extract stage (extract-service/main.py:151-157)."""
    body = json.dumps({"query": query, "variables": variables or {}}).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.load(resp)
    return payload if isinstance(payload, list) else [payload]


def validate_payload(payload: list) -> list:
    """O2 error/empty guards (extract-service/main.py:160-174)."""
    if not payload:
        raise ValueError("Empty response payload")
    first = payload[0]
    if isinstance(first, dict) and "error" in first:
        raise ValueError(f"API returned error: {first.get('message', first['error'])}")
    return payload


class GraphQLReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        # single unpaginated request == single partition
        return [InputPartition(0)]

    def read(self, partition):
        mock = self.options.get("mock_response")
        if mock is not None:
            payload = json.loads(mock)
            if not isinstance(payload, list):
                payload = [payload]
        else:
            payload = fetch_graphql(
                self.options["url"], self.options["query"],
                json.loads(self.options.get("variables", "{}")))
        if self.options.get("validate", "true") == "true":
            payload = validate_payload(payload)
        for element in payload:
            yield (json.dumps(element),)


class HttpGraphQLDataSource(DataSource):
    """spark.read.format("http_graphql").option("url", ...).option("query", ...)"""

    @classmethod
    def name(cls) -> str:
        return "http_graphql"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> "GraphQLReader":
        return GraphQLReader(self.options)


def register(spark) -> bool:
    """Register the source on a session; False when the Python
    DataSource API is unavailable (Spark < 4.0)."""
    if not HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(HttpGraphQLDataSource)
    return True
