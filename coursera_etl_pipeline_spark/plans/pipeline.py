"""Reference-parity pipeline: nested GraphQL-response JSON -> 15-column
courses table, as ONE lazy DataFrame plan.

Replaces the reference's row-at-a-time Python transform
(transform-service/main.py:79-178) with scan -> explode -> explode ->
project/coalesce -> sink. The plan is embarrassingly parallel (narrow
ops only — GenerateExec for the explodes, no shuffle), so the same
plan that handles one daily file handles a 100 TB backlog: parallelism
comes purely from input splits.

Operator map (SURVEY §2.1):
  O3  nested path projection   data.DiscoveryCollections.queryCollections
  O4/O11 flatten x2 w/ parents explode(queryCollections), explode(entities)
  O12 array<struct> -> string  array_join(transform(partners, p -> p.name))
  O13 array<string> -> string  array_join(partnerIds, ', ')
  O14 projection + rename      camelCase -> snake_case, 15 columns
  O15 null-default fill        coalesce(col, 'N/A' / false)
  O16 nested struct access     productCard.productTypeAttributes.isPathwayContent
  O2  validation               error-key / empty-collections guards
  O6/O17/O19 sinks             write.json / write.csv(header) / saveAsTable
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class PipelineValidationError(ValueError):
    """O2 semantics: the reference raises on an error payload
    (extract-service/main.py:160-164) and on empty collections
    (:173-174); the engine surfaces the same guards explicitly."""


# Explicit source schema — the GraphQL selection set *is* the schema
# (extract-service/main.py:46-145). One wide nullable Entity struct is
# the union of the three polymorphic variants (specialization | course
# | professionalCertificate, :89-117), discriminated by __typename.
PARTNER = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("logo", T.StringType()),
])

PRODUCT_CARD = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("marketingProductType", T.StringType()),
    T.StructField("productTypeAttributes", T.StructType([
        T.StructField("isPathwayContent", T.BooleanType()),
    ])),
])

ENTITY = T.StructType([
    T.StructField("__typename", T.StringType()),
    T.StructField("id", T.StringType()),
    T.StructField("slug", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("partnerIds", T.ArrayType(T.StringType())),
    T.StructField("imageUrl", T.StringType()),
    T.StructField("partners", T.ArrayType(PARTNER)),
    T.StructField("courseCount", T.IntegerType()),      # specialization only
    T.StructField("difficultyLevel", T.StringType()),
    T.StructField("isPartOfCourseraPlus", T.BooleanType()),
    T.StructField("isCostFree", T.BooleanType()),       # course only
    T.StructField("productCard", PRODUCT_CARD),
])

COLLECTION = T.StructType([
    T.StructField("__typename", T.StringType()),
    T.StructField("id", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("linkedCollectionPageMetadata", T.StructType([
        T.StructField("url", T.StringType()),
    ])),
    T.StructField("entities", T.ArrayType(ENTITY)),
])

RESPONSE = T.StructType([
    # error payload fields (extract-service/main.py:160-164)
    T.StructField("error", T.StringType()),
    T.StructField("message", T.StringType()),
    T.StructField("data", T.StructType([
        T.StructField("DiscoveryCollections", T.StructType([
            T.StructField("queryCollections", T.ArrayType(COLLECTION)),
        ])),
    ])),
])

# The 15-column warehouse schema (README.md:42-60,
# transform-service/main.py:141-157) in exact header order.
COURSE_COLUMNS = [
    "collection_label", "collection_id", "course_name", "course_id",
    "slug", "url", "image_url", "partners", "partner_ids",
    "difficulty_level", "is_part_of_coursera_plus", "course_count",
    "is_cost_free", "marketing_product_type", "is_pathway_content",
]


def read_responses(spark: SparkSession, path: str) -> DataFrame:
    """O10/O8: JSON scan over a glob of timestamped response files.
    The reference pretty-prints (extract-service/main.py:201-203) so
    multiLine=True; a top-level JSON array yields one row per element.
    input_file_name() is retained for latest-partition selection."""
    return (
        spark.read.schema(RESPONSE).option("multiLine", "true").json(path)
        .withColumn("_source_file", F.input_file_name())
    )


def latest_response(df: DataFrame) -> DataFrame:
    """O9: lexicographic max over file names == newest timestamped
    partition. The reference selects the newest blob DRIVER-side — a
    plain max() over the bucket listing (transform-service/main.py:89)
    — and this mirrors it: one 1-row aggregate over the file-name
    column (domain == the file listing, tiny by construction), then a
    literal filter the scan applies as a narrow op. The previous
    broadcast-semi-join form kept the plan fully lazy but added a
    broadcast exchange + join that re-executed inside both the
    validation barrier and the final action — measured at ~35% of
    pipeline_courses_parity's wall time for zero semantic difference
    (the round-7→8 drift watch item). At scale the aggregate reads one
    short string per input split; the data columns are pruned.

    FROZEN-AT-CONSTRUCTION semantics (deliberate, matching the
    reference's driver-side max): the eager aggregate runs HERE, so the
    returned plan filters on a literal file name. A retained DataFrame
    re-executed after new files land still selects the file that was
    newest at construction — rebuild the plan to re-resolve, exactly as
    the reference re-lists the bucket per run. Streaming frames cannot
    take this path (no eager aggregate mid-stream), so they are
    rejected rather than silently frozen."""
    if df.isStreaming:
        raise ValueError(
            "latest_response freezes the newest file at plan construction "
            "and cannot apply to a streaming DataFrame; use the streaming "
            "ingest path (streaming/ingest.py) instead")
    latest = df.agg(F.max("_source_file")).collect()[0][0]
    if latest is None:  # empty input: preserve emptiness for O2's guard
        return df.filter(F.lit(False))
    return df.filter(F.col("_source_file") == F.lit(latest))


def validate_response(df: DataFrame) -> DataFrame:
    """O2: error-payload and empty-collections guards
    (extract-service/main.py:160-174). One small aggregate action —
    a deliberate validation barrier, same as the reference's raises."""
    stats = df.agg(
        F.max(F.col("error").isNotNull().cast("int")).alias("has_error"),
        F.max(F.coalesce(
            F.size("data.DiscoveryCollections.queryCollections"), F.lit(0))
        ).alias("max_collections"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    if stats.n_rows == 0:
        raise PipelineValidationError("No JSON response rows found")
    if stats.has_error:
        raise PipelineValidationError("API returned an error payload")
    if not stats.max_collections:
        raise PipelineValidationError("No collections found in the response")
    return df


def transform_courses(responses: DataFrame, parity: bool = True) -> DataFrame:
    """O3-O16 as one narrow plan.

    parity=True reproduces the reference's CSV row semantics exactly
    (SURVEY §7.0): courseCount/isCostFree stringified with 'N/A'
    sentinels and Python-style 'True'/'False' capitalization
    (transform-service/main.py:123-128). parity=False keeps typed
    nullable columns (int / boolean) for analytical use."""
    c = F.col("collection")
    e = F.col("entity")

    flat = (
        responses
        # O3: nested path projection; O4/O11: two correlated unnests
        .select(F.explode("data.DiscoveryCollections.queryCollections").alias("collection"))
        .select(c["label"].alias("collection_label"),
                c["id"].alias("collection_id"),
                F.explode(c["entities"]).alias("entity"))
    )

    if parity:
        course_count = F.coalesce(e["courseCount"].cast("string"), F.lit("N/A"))
        # Python str(bool) capitalizes — match the reference CSV bytes.
        # Two-branch when() keeps NULL null so the 'N/A' default applies.
        is_cost_free = F.coalesce(
            F.when(e["isCostFree"], "True").when(~e["isCostFree"], "False"),
            F.lit("N/A"))
    else:
        course_count = e["courseCount"]
        is_cost_free = e["isCostFree"]

    return flat.select(
        "collection_label",
        "collection_id",
        e["name"].alias("course_name"),
        e["id"].alias("course_id"),
        e["slug"].alias("slug"),
        e["url"].alias("url"),
        e["imageUrl"].alias("image_url"),
        # O12: project name out of each partner struct, join with ", "
        F.array_join(F.transform(e["partners"], lambda p: p["name"]), ", ").alias("partners"),
        # O13: array<string> -> delimited string
        F.array_join(e["partnerIds"], ", ").alias("partner_ids"),
        # O15: null-default fill (transform-service/main.py:123-126)
        F.coalesce(e["difficultyLevel"], F.lit("N/A")).alias("difficulty_level"),
        F.coalesce(e["isPartOfCourseraPlus"], F.lit(False)).alias("is_part_of_coursera_plus"),
        course_count.alias("course_count"),
        is_cost_free.alias("is_cost_free"),
        # O16: nested struct access (reference crashes on missing
        # productCard, :129-134; engine policy = tolerant nulls, §7.0)
        e["productCard"]["marketingProductType"].alias("marketing_product_type"),
        e["productCard"]["productTypeAttributes"]["isPathwayContent"].alias("is_pathway_content"),
    )


def run_transform(spark: SparkSession, in_path: str, *,
                  latest_only: bool = True, parity: bool = True,
                  validate: bool = True) -> DataFrame:
    """The full transform-service main() (transform-service/main.py:80-178)
    as one lazy plan: discover -> latest -> validate -> flatten/project."""
    df = read_responses(spark, in_path)
    if latest_only:
        df = latest_response(df)
    if validate:
        df = validate_response(df)
    return transform_courses(df, parity=parity)


# Explicit schema of the parity CSV: the three typed columns are the
# ones the reference's autodetect would discover (booleans from
# True/False literals); everything else — including course_count and
# is_cost_free, whose 'N/A' sentinels force string — stays string.
COURSES_CSV_SCHEMA = T.StructType(
    [T.StructField(c, T.BooleanType() if c in (
        "is_part_of_coursera_plus", "is_pathway_content") else T.StringType())
     for c in COURSE_COLUMNS])


def read_courses_csv(spark: SparkSession, path: str, *,
                     infer_schema: bool = False) -> DataFrame:
    """O19 ingest-side read of the courses CSV.

    infer_schema=True mirrors the reference's warehouse autodetect load
    (transform-service/main.py:64, autodetect=True): the schema is
    discovered from the data at the cost of one extra pass over the
    files — fine for a daily batch, wrong for a 100 TB backfill, where
    the explicit default reads each file once and guarantees a stable
    schema across partitions."""
    reader = spark.read.option("header", "true")
    if infer_schema:
        return reader.option("inferSchema", "true").csv(path)
    return reader.schema(COURSES_CSV_SCHEMA).csv(path)


def write_csv(df: DataFrame, path: str) -> None:
    """O17: CSV sink with header, fixed column order
    (transform-service/main.py:159-166)."""
    df.select(*COURSE_COLUMNS).write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """O6: JSON sink (extract-service/main.py:195-209; pretty-printing
    carries no semantics)."""
    df.write.mode("overwrite").json(path)


def append_to_table(df: DataFrame, table: str, dedup_keys: list[str] | None = None) -> None:
    """O19: warehouse append-load (transform-service/main.py:54-76,
    WRITE_APPEND). Reference reruns double-append (no key); engine
    default dedups against the existing table on a key (SURVEY §7.0.3);
    dedup_keys=None preserves raw reference behavior for parity."""
    spark = df.sparkSession
    if dedup_keys and spark.catalog.tableExists(table):
        existing = spark.table(table).select(*dedup_keys)
        df = df.join(existing, dedup_keys, "left_anti")
    df.write.mode("append").saveAsTable(table)
