"""Relational operator pack (SURVEY §2.2).

Importing this package registers every relational query in the
registry. Modules: relational (filters/joins/aggs/sorts/setops),
windows (ranking/analytic/frames), scalars (string/date/math/json),
quality (table-level data-quality expectations).
"""

from coursera_etl_pipeline_spark.operators import (  # noqa: F401
    asof,
    merge,
    quality,
    relational,
    skew,
    scalars,
    subqueries,
    tpch_extra,
    windows,
)
