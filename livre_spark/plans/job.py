"""The end-to-end extraction pipeline (SURVEY.md section 3.4).

read (B1) -> latest-per-url dedup (B12) -> magic-byte filter (B4) ->
checkpoint anti-join (B13/B18) -> size-bucket + salt repartition (B5/B6)
-> mapInPandas extraction (B7) -> text + spans sinks (B2/B9) ->
per-partition metrics (B10/B11) -> manifest append (B18).

Catalyst plans everything outside the UDF.  Stage boundaries: one shuffle
for the dedup window, one for the skew repartition, one for the metrics
aggregate - the minimum for these semantics.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession

from ..operators.checkpoint import append_manifest, filter_done
from ..operators.extraction import (
    explode_spans, extract_documents, pdf_magic_filter,
)
from ..operators.metrics import partition_metrics
from ..operators.skew import latest_per_url, size_bucketed_repartition
from ..sources import read_pages


def build_session(app_name: str = "livre-spark", cores: str | int = "*",
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    """local[cores] session tuned for the extraction workload."""
    n = (os.cpu_count() or 8) if cores == "*" else int(cores)
    builder = (SparkSession.builder
               .appName(app_name)
               .master(f"local[{cores}]")
               .config("spark.sql.shuffle.partitions",
                       str(shuffle_partitions or max(2 * n, 8)))
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
               .config("spark.sql.adaptive.enabled", "true")
               # byte-capped scan splits: the shuffle-free small-doc
               # path relies on these for balance (operators/skew.py).
               # 4 MiB keeps tasks seconds-long for binary-heavy docs;
               # raise via env at larger scales to bound task counts
               .config("spark.sql.files.maxPartitionBytes", os.environ.get(
                   "SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 << 20)))
               .config("spark.driver.memory", os.environ.get(
                   "SPARK_GRAFT_DRIVER_MEM", "8g"))
               .config("spark.ui.enabled", "false")
               .config("spark.driver.host", "127.0.0.1"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def run_pipeline(spark: SparkSession, source: str, output_dir: str,
                 checkpoint_dir: str | None = None,
                 dedup_snapshots: bool = True,
                 write_spans: bool = True,
                 run_id: str | None = None) -> dict:
    """Execute the full pipeline; returns output locations + counts."""
    run_id = run_id or uuid.uuid4().hex[:12]

    pages = read_pages(spark, source)
    if dedup_snapshots and "warc_ts" in pages.columns:
        pages = latest_per_url(pages)
    pages = pdf_magic_filter(pages)
    pages = filter_done(pages, checkpoint_dir)
    pages = size_bucketed_repartition(pages)

    extracted = extract_documents(pages)
    # the UDF output feeds three sinks; cache once to avoid re-extraction
    extracted.persist()
    try:
        text_path = os.path.join(output_dir, "documents_text")
        (extracted
         .select("url", "text", "n_pages", "n_spans", "error", "parse_ms")
         .write.mode("append").parquet(text_path))

        spans_path = None
        if write_spans:
            spans_path = os.path.join(output_dir, "documents_spans")
            explode_spans(extracted).write.mode("append").parquet(spans_path)

        metrics_path = os.path.join(output_dir, "partition_metrics")
        (partition_metrics(extracted, run_id)
         .write.mode("append").parquet(metrics_path))

        n_docs = extracted.count()
        append_manifest(extracted, checkpoint_dir)
    finally:
        extracted.unpersist()

    return {"run_id": run_id, "n_docs": n_docs, "text_path": text_path,
            "spans_path": spans_path, "metrics_path": metrics_path}
