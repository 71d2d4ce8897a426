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

MANIFEST_TABLE = "done_urls"


def _sink(checkpoint):
    """A checkpoint location is a directory (parquet, the in-sandbox
    default) or any TableSink (e.g. plans.sinks.IcebergSink, whose
    atomic snapshots collapse the torn-batch window - see sinks.py)."""
    if isinstance(checkpoint, str):
        from ..plans.sinks import ParquetSink

        return ParquetSink(checkpoint)
    return checkpoint


def manifest_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, MANIFEST_TABLE)


def read_done_urls(spark: SparkSession, checkpoint) -> DataFrame | None:
    done = _sink(checkpoint).read_or_none(spark, MANIFEST_TABLE)
    return None if done is None else done.select("url")


def filter_done(pages: DataFrame, checkpoint) -> DataFrame:
    """Anti-join already-done urls (B13 left_anti)."""
    if not checkpoint:
        return pages
    done = read_done_urls(pages.sparkSession, checkpoint)
    if done is None:
        return pages
    return pages.join(done, "url", "left_anti")


def append_manifest(extracted: DataFrame, checkpoint) -> None:
    """Record completed urls (success AND contained-error rows - both are
    terminal states; a retry would reproduce the identical row)."""
    if not checkpoint:
        return
    _sink(checkpoint).append(extracted.select("url"), MANIFEST_TABLE)
