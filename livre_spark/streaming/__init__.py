"""B20: incremental ingest via Structured Streaming.

The reference has no streaming (a single document in memory); the input
table is a static snapshot, so streaming is optional - micro-batch resume
(checkpoint anti-join, operators/checkpoint.py) covers incremental crawls.
This wrapper exists for continuously-landing crawl data: ``readStream``
over the pages directory -> ``foreachBatch`` reusing the exact same batch
pipeline (same kernels, same skew handling), with a watermark on
``warc_ts`` for late snapshots.

Design note for scale: ``foreachBatch`` (not ``writeStream`` operators)
because the extraction stage needs the skew repartition + multi-sink
fan-out, which are batch-DataFrame shaped.  Exactly-once comes from the
streaming checkpoint + the idempotent manifest anti-join, not from sink
transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.checkpoint import append_manifest, filter_done
from ..operators.extraction import extract_documents, pdf_magic_filter
from ..operators.skew import size_bucketed_repartition
from ..sources import PAGES_SCHEMA


def dedup_first_seen(pages_stream: DataFrame, url_col: str = "url",
                     ts_col: str = "warc_ts") -> DataFrame:
    """Custom stateful streaming operator: cross-micro-batch first-seen
    url dedup via ``applyInPandasWithState`` (B20+).

    Emits one row per url in the micro-batch where it FIRST appears
    (with that batch's earliest snapshot ts and count); later snapshots
    of the same url only bump the per-key state counter.  This is the
    streaming complement of the batch ``latest_per_url`` window: a crawl
    frontier dedup that needs memory of every url seen so far - exactly
    what the state store (RocksDB per key at scale) provides and a
    stateless watermark aggregation cannot.

    State per key: a single snapshot counter - bounded by key
    cardinality, not by stream length.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    out_schema = StructType([
        StructField(url_col, StringType()),
        StructField("first_ts", TimestampType()),
        StructField("n_snapshots", LongType()),
    ])
    state_schema = StructType([StructField("n_seen", LongType())])

    def fn(key, pdfs, state):
        import pandas as pd

        n = 0
        first_ts = None
        for pdf in pdfs:
            n += len(pdf)
            m = pdf[ts_col].min()
            first_ts = m if first_ts is None else min(first_ts, m)
        if state.exists:
            (prev,) = state.get
            state.update((prev + n,))
        else:
            state.update((n,))
            yield pd.DataFrame({url_col: [key[0]],
                                "first_ts": [first_ts],
                                "n_snapshots": [n]})

    return (pages_stream.groupBy(url_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


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
                            trigger_once: bool = True):
    """Continuous extraction: each micro-batch runs the batch pipeline."""
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
        pages = size_bucketed_repartition(pages)
        # single action through the UDF; the manifest derives from the
        # written table (column-pruned read-back), not a persist()
        (extract_documents(pages)
         .withColumn("run_id", F.lit(run_id))
         .write.mode("append").parquet(text_path))
        written = (spark.read.parquet(text_path)
                   .filter(F.col("run_id") == run_id))
        append_manifest(written, checkpoint_dir)

    writer = (stream_pages(spark, source_dir)
              .writeStream
              .option("checkpointLocation",
                      f"{checkpoint_dir}/stream_checkpoint")
              .foreachBatch(process_batch))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
