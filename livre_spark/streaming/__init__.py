"""B20: incremental ingest via Structured Streaming.

The reference has no streaming (a single document in memory); the input
table is a static snapshot, so streaming is optional - micro-batch resume
(checkpoint anti-join, operators/checkpoint.py) covers incremental crawls.
This wrapper exists for continuously-landing crawl data: ``readStream``
over the pages directory -> stateful first-seen url dedup -> ``foreachBatch``
reusing the exact same batch pipeline (same kernels, same skew handling),
with a watermark on ``warc_ts`` for late snapshots.

Design note for scale: ``foreachBatch`` (not ``writeStream`` operators)
because the extraction stage needs the skew repartition + multi-sink
fan-out, which are batch-DataFrame shaped.  Exactly-once comes from the
streaming checkpoint + the idempotent manifest anti-join, not from sink
transactions.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.checkpoint import append_manifest, filter_done
from ..operators.extraction import extract_documents, pdf_magic_filter
from ..operators.skew import size_bucketed_repartition
from ..sources import PAGES_SCHEMA


def dedup_first_seen(pages_stream: DataFrame, url_col: str = "url",
                     ts_col: str = "warc_ts",
                     payload_cols: list[str] | None = None) -> DataFrame:
    """Custom stateful streaming operator: cross-micro-batch first-seen
    url dedup via ``applyInPandasWithState`` (B20+).

    Emits one row per url in the micro-batch where it FIRST appears
    (with that batch's earliest snapshot ts and count); later snapshots
    of the same url only bump the per-key state counter.  This is the
    streaming complement of the batch ``latest_per_url``+manifest resume:
    across runs the first completed extraction of a url wins there too,
    so first-seen streaming reproduces the multi-run batch semantics.
    A crawl frontier dedup needs memory of every url seen so far -
    exactly what the state store (RocksDB per key at scale) provides and
    a stateless watermark aggregation cannot.

    ``payload_cols``: extra columns to carry through on the emitted row
    (e.g. ``["html", "text", "lang"]`` so extraction can run downstream).
    Within the first micro-batch the LATEST-ts snapshot's payload is kept,
    matching the batch pipeline's within-run ``latest_per_url`` choice.
    Scale note: the groupBy shuffles the payload bytes once - the same
    single url-keyed shuffle the batch dedup window pays.

    State per key: a single snapshot counter - bounded by key
    cardinality, not by stream length.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    payload_cols = payload_cols or []
    in_fields = {f.name: f for f in pages_stream.schema.fields}
    out_schema = StructType(
        [StructField(url_col, StringType()),
         StructField("first_ts", TimestampType()),
         StructField("n_snapshots", LongType())]
        + [in_fields[c] for c in payload_cols])
    state_schema = StructType([StructField("n_seen", LongType())])

    def fn(key, pdfs, state):
        import pandas as pd

        n = 0
        first_ts = None
        best_ts = None       # latest ts within this batch
        best_payload = None  # its payload row
        for pdf in pdfs:
            if not len(pdf):  # empty chunk: min() would be NaT
                continue
            n += len(pdf)
            m = pdf[ts_col].min()
            first_ts = m if first_ts is None else min(first_ts, m)
            if payload_cols:
                i = pdf[ts_col].idxmax()
                mx = pdf[ts_col].loc[i]
                if best_ts is None or mx > best_ts:
                    best_ts = mx
                    best_payload = {c: pdf[c].loc[i] for c in payload_cols}
        if n == 0:
            return
        if state.exists:
            (prev,) = state.get
            state.update((prev + n,))
        else:
            state.update((n,))
            row = {url_col: [key[0]], "first_ts": [first_ts],
                   "n_snapshots": [n]}
            for c in payload_cols:
                row[c] = [best_payload[c]]
            yield pd.DataFrame(row)

    return (pages_stream.groupBy(url_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def windowed_page_counts(pages_stream: DataFrame,
                         window: str = "10 minutes",
                         ts_col: str = "warc_ts") -> DataFrame:
    """Watermarked tumbling-window rollup - the standard late-data
    pattern: the ``stream_pages`` watermark (1 day) bounds how long a
    window's state lives; snapshots later than that are dropped rather
    than growing state forever.  Pure built-in streaming aggregation
    (window + count), no custom state."""
    return (pages_stream
            .groupBy(F.window(F.col(ts_col), window))
            .agg(F.count("*").alias("n_pages"),
                 F.approx_count_distinct("url").alias("n_urls"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    "n_pages", "n_urls"))


def stream_pages(spark: SparkSession, source_dir: str,
                 max_files_per_trigger: int = 16) -> DataFrame:
    """readStream over a parquet drop-directory of crawl pages."""
    return (spark.readStream
            .schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(source_dir)
            .withWatermark("warc_ts", "1 day"))


def start_extraction_stream(spark: SparkSession, source_dir: str,
                            output_dir: str, checkpoint_dir: str,
                            trigger_once: bool = True,
                            first_seen: bool = True,
                            max_files_per_trigger: int = 16):
    """Continuous extraction: each micro-batch runs the batch pipeline.

    ``first_seen=True`` (default) puts the stateful first-seen url dedup
    BEFORE extraction, so a url recurring across micro-batches is
    extracted exactly once even within a single run - semantically equal
    to the batch ``latest_per_url``+manifest path.  The manifest anti-join
    stays as the replay/restart guard (state checkpoint and manifest
    commit independently).
    """
    import os

    from ..plans.job import heal_torn

    # converge any torn batch a crashed run left (text written, manifest
    # missing) BEFORE the streaming checkpoint replays that batch - the
    # healed manifest makes the replay's filter_done skip those urls, so
    # no duplicate text rows are appended
    heal_torn(spark, output_dir, checkpoint_dir, write_spans=False)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        run_id = f"batch-{batch_id}"
        text_path = os.path.join(output_dir, "documents_text")
        pages = pdf_magic_filter(batch_df)
        pages = filter_done(pages, checkpoint_dir)
        size_col = "n_bytes" if "n_bytes" in pages.columns else None
        pages = size_bucketed_repartition(pages, size_col=size_col)
        # single action through the UDF; documents_text is partitioned by
        # run_id ("batch-N" - never numeric, so partition-column type
        # inference always yields string) so the manifest read-back below
        # touches ONLY this batch's files - O(batch), not O(table)
        (extract_documents(pages)
         .withColumn("run_id", F.lit(run_id))
         .write.mode("append").partitionBy("run_id").parquet(text_path))
        part_dir = os.path.join(text_path, f"run_id={run_id}")
        # an empty batch writes no partition directory; probe by reading
        # rather than os.path (which is always False on HDFS/S3 paths)
        try:
            written = (spark.read.option("basePath", text_path)
                       .parquet(part_dir))
        except AnalysisException:
            return
        append_manifest(written, checkpoint_dir)

    stream = stream_pages(spark, source_dir,
                          max_files_per_trigger=max_files_per_trigger)
    if first_seen:
        payload = [c for c in stream.columns if c not in ("url", "warc_ts")]
        stream = (dedup_first_seen(stream, payload_cols=payload)
                  .withColumnRenamed("first_ts", "warc_ts")
                  .drop("n_snapshots"))
    writer = (stream
              .writeStream
              .outputMode("append")
              .option("checkpointLocation",
                      f"{checkpoint_dir}/stream_checkpoint")
              .foreachBatch(process_batch))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
