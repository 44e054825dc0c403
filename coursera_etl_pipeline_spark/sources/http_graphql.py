"""HTTP/GraphQL source (O1, extract-service/main.py:148-192).

Spark has no built-in HTTP source; this is a Python DataSource
(pyspark.sql.datasource, Spark 4.x) registered as
``spark.read.format("http_graphql")``. It emits one row per top-level
response element with the raw JSON payload in a ``value`` column;
parsing into the typed tree is a separate operator
(``F.from_json(value, RESPONSE)``), mirroring the reference's
raw-JSON-to-GCS then parse split (O6 -> O10).

The reference issues exactly ONE unpaginated POST (extract-service/
main.py:46-49,152), so the source plans a single input partition by
default. A paginated API maps one partition per page: pass
``pages=N`` (and optionally ``page_var``, default ``page``) and each
of the N partitions issues its own POST with the page index injected
into the GraphQL variables — the fetch fans out across executors
instead of serializing through the driver.

Offline use (tests, this container): pass ``mock_response`` with the
JSON payload instead of ``url`` — or ``mock_pages`` (a JSON array
whose i-th element is page i's payload) for the paginated path; no
network is touched.
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
        # one partition per page; the reference's single unpaginated
        # request is the pages=1 default. When mock_pages supplies the
        # payloads, the payload list IS the page count — silently
        # reading fewer pages than were provided would drop data.
        mock_pages = self.options.get("mock_pages")
        if mock_pages is not None:
            n = len(json.loads(mock_pages))
            pages = int(self.options.get("pages", str(n)))
            if pages != n:
                raise ValueError(
                    f"mock_pages supplies {n} pages but pages={pages}")
            return [InputPartition(i) for i in range(n)]
        return [InputPartition(i) for i in range(int(self.options.get("pages", "1")))]

    def read(self, partition):
        page = partition.value
        mock_pages = self.options.get("mock_pages")
        mock = self.options.get("mock_response")
        if mock_pages is not None:
            payload = json.loads(mock_pages)[page]
        elif mock is not None:
            payload = json.loads(mock)
        else:
            variables = json.loads(self.options.get("variables", "{}"))
            if int(self.options.get("pages", "1")) > 1:
                variables[self.options.get("page_var", "page")] = page
            payload = fetch_graphql(
                self.options["url"], self.options["query"], variables)
        if not isinstance(payload, list):
            payload = [payload]
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
