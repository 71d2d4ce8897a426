"""Structured Streaming wrapper: availableNow micro-batch over a parquet
drop-directory, reusing the batch extraction pipeline."""

import os

from livre_spark.plans.corpus import expected_rows, write_corpus
from livre_spark.streaming import start_extraction_stream


def test_stream_extracts(spark, tmp_path):
    src = str(tmp_path / "drop")
    write_corpus(src, 20, duplicate_every=0)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = start_extraction_stream(spark, src, out, ckpt, trigger_once=True)
    q.awaitTermination(timeout=180)

    got = {r["url"]: r["text"] for r in
           spark.read.parquet(os.path.join(out, "documents_text")).collect()}
    expected = {e["url"]: e for e in expected_rows(20)}
    pdf_urls = {u for u, e in expected.items() if e["kind"] == "pdf"}
    assert set(got) >= pdf_urls
    for url in pdf_urls:
        assert got[url] == expected[url]["expected_text"]

    # second trigger over the same files: streaming checkpoint + manifest
    # anti-join -> no duplicates appended
    q2 = start_extraction_stream(spark, src, out, ckpt, trigger_once=True)
    q2.awaitTermination(timeout=180)
    n = spark.read.parquet(os.path.join(out, "documents_text")).count()
    assert n == len(got)
