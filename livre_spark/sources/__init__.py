"""B1/B2: sources & sinks.

The production table is Iceberg (``spark.read.format("iceberg")`` /
``df.writeTo(...).append()``); parquet stands in inside the sandbox where
no Iceberg catalog is configured.  Both paths go through these helpers so
the pipeline code is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

# input_hint table shape (BASELINE.json)
PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the Common-Crawl-style pages table.

    ``source`` is an Iceberg table name (contains no '/') or a parquet
    path.  Column pruning / predicate pushdown happen downstream via
    Catalyst either way.
    """
    if "/" not in source and "." in source:
        try:
            return spark.read.format("iceberg").load(source)
        except Exception:
            pass
    return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write to Iceberg when the target looks like a table, else parquet."""
    if "/" not in target and "." in target:
        try:
            if mode == "append":
                df.writeTo(target).append()
            else:
                df.writeTo(target).createOrReplace()
            return
        except Exception:
            pass
    df.write.mode(mode).parquet(target)
