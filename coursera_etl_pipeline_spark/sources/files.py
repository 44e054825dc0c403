"""File-set tables: prefix/glob discovery, timestamped partitions,
latest-partition selection.

The reference's "table" is a set of timestamp-named objects under a
prefix (O7/O8/O9: extract-service/main.py:217-219, transform-service/
main.py:84-89). Engine equivalents keep the listing on the driver
(file listings are small) and the data path fully distributed.
"""

from __future__ import annotations

import glob as _glob
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def timestamped_name(prefix: str, ext: str, now: datetime | None = None) -> str:
    """O7: one immutable object per run — prefix_%Y%m%d_%H%M%S.ext
    (extract-service/main.py:217-219)."""
    now = now or datetime.now(timezone.utc)
    return f"{prefix}_{now.strftime('%Y%m%d_%H%M%S')}{ext}"


def discover(path_dir: str, prefix: str) -> list[str]:
    """O8: file discovery by prefix (transform-service/main.py:84-88)."""
    return sorted(_glob.glob(os.path.join(path_dir, f"{prefix}*")))


def latest_path(path_dir: str, prefix: str) -> str:
    """O9: lexicographic max over names == newest timestamped partition
    (transform-service/main.py:89). Raises like the reference when no
    input exists (:87-88)."""
    paths = discover(path_dir, prefix)
    if not paths:
        raise FileNotFoundError(f"No files found for prefix {prefix!r} in {path_dir}")
    return max(paths)


def with_ingest_ts(df: DataFrame) -> DataFrame:
    """Promote run metadata to real columns: source file + ingest time
    (the engine's typed version of the reference's name-embedded
    timestamps)."""
    return (df.withColumn("_source_file", F.input_file_name())
              .withColumn("ingest_ts", F.current_timestamp()))


def read_latest_json(spark: SparkSession, path_dir: str, prefix: str,
                     schema=None) -> DataFrame:
    """O8+O9+O10 composed: discover -> pick latest -> scan."""
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(latest_path(path_dir, prefix))
