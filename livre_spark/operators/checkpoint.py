"""B18: checkpoint / idempotent resume.

The pipeline appends a *manifest* of completed urls per run.  On restart,
an anti-join against the manifest skips everything already extracted;
because every kernel is a pure function of the input bytes, re-running a
partially-completed job appends exactly the missing rows and the final
output table is byte-identical to a single clean run.

On a real deployment the manifest lives next to the Iceberg table and the
anti-join's small side is the manifest (broadcast when it fits); here it
is plain parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "done_urls")


def read_done_urls(spark: SparkSession, checkpoint_dir: str) -> DataFrame | None:
    path = manifest_path(checkpoint_dir)
    try:
        return spark.read.parquet(path).select("url")
    except Exception:
        return None


def filter_done(pages: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Anti-join already-done urls (B13 left_anti)."""
    if not checkpoint_dir:
        return pages
    done = read_done_urls(pages.sparkSession, checkpoint_dir)
    if done is None:
        return pages
    return pages.join(done, "url", "left_anti")


def append_manifest(extracted: DataFrame, checkpoint_dir: str | None) -> None:
    """Record completed urls (success AND contained-error rows - both are
    terminal states; a retry would reproduce the identical row)."""
    if not checkpoint_dir:
        return
    (extracted.select("url")
     .write.mode("append").parquet(manifest_path(checkpoint_dir)))
