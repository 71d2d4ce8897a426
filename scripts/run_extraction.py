#!/usr/bin/env python
"""spark-submit entrypoint for the extraction pipeline.

Cluster usage (north rule: ships via --py-files):

    cd /root/repo && zip -qr /tmp/engine.zip livre_spark
    spark-submit --py-files /tmp/engine.zip scripts/run_extraction.py \\
        --input <pages table, parquet path, or .warc[.gz] file/dir/glob> \\
        --output <output dir / Iceberg namespace> \\
        --checkpoint <manifest dir>            # enables idempotent resume

On a real cluster drop the --master handling below (spark-submit sets it)
and size spark.sql.shuffle.partitions to ~2-3x total executor cores.
"""

from __future__ import annotations

import argparse
import os
import sys

# running `python scripts/run_extraction.py` from a checkout puts scripts/
# (not the repo root) on sys.path; on a cluster --py-files covers this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="livre-spark extraction job")
    parser.add_argument("--input", required=True,
                        help="Iceberg table, parquet path, or raw"
                             " crawl WARC file/dir/glob")
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--no-spans", action="store_true")
    parser.add_argument("--cmap", action="store_true",
                        help="decode via /ToUnicode CMaps (extension; "
                             "default stays reference-byte-identical)")
    parser.add_argument("--with-info", action="store_true",
                        help="populate the info column with the decoded"
                             " (and decrypted) /Info metadata map")
    parser.add_argument("--strip-inline-images", action="store_true",
                        help="remove BI/ID/EI inline-image spans before "
                             "tokenization (extension; recovers text on "
                             "image-heavy pages)")
    parser.add_argument("--no-dedup", action="store_true")
    parser.add_argument("--html-mode", choices=["main", "strip"], default=None,
                        help="also extract non-PDF HTML rows (boilerplate "
                             "strip / main-content heuristics)")
    parser.add_argument("--local-cores", default=None,
                        help="run on local[N] (sandbox); omit on a cluster")
    args = parser.parse_args()

    if args.local_cores:
        from livre_spark.plans.job import build_session
        spark = build_session(app_name="livre-spark-extract",
                              cores=args.local_cores)
    else:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.appName("livre-spark-extract")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .config("spark.sql.adaptive.enabled", "true")
                 .getOrCreate())

    from livre_spark.plans.job import run_pipeline

    info = run_pipeline(spark, args.input, args.output,
                        checkpoint_dir=args.checkpoint,
                        dedup_snapshots=not args.no_dedup,
                        write_spans=not args.no_spans,
                        cmap=args.cmap,
                        strip_inline=args.strip_inline_images,
                        with_info=args.with_info,
                        html_mode=args.html_mode)
    print(info)
    spark.stop()


if __name__ == "__main__":
    main()
