"""Skew operator: branch routing and stored-size-column pushdown."""

import re

import pyspark.sql.functions as F

from livre_spark.operators.skew import size_bucketed_repartition


def _pages(spark, with_size=False):
    rows = []
    for i in range(40):
        big = i % 10 == 0
        html = bytes([37]) * (3000 if big else 50)  # 4 big docs
        row = [f"u{i}", html]
        if with_size:
            row.append(len(html))
        rows.append(tuple(row))
    schema = "url string, html binary" + (", n_bytes long" if with_size else "")
    return spark.createDataFrame(rows, schema)


def test_routing_by_length(spark):
    df = _pages(spark)
    out = size_bucketed_repartition(df, threshold=1000, n_partitions=8)
    assert out.count() == 40
    # every row survives, columns unchanged
    assert set(out.columns) == {"url", "html"}


def test_corpus_persists_n_bytes_and_pipeline_defaults_to_it(spark, tmp_path):
    """write_corpus stores n_bytes at ingest; the pipeline's size-bucket
    branch predicates then push into the scan (no double scan of html)."""
    import re

    from livre_spark.operators.extraction import pdf_magic_filter
    from livre_spark.plans.corpus import write_corpus
    from livre_spark.sources import read_pages

    src = str(tmp_path / "pages")
    write_corpus(src, 20, duplicate_every=0)
    pages = read_pages(spark, src)
    assert "n_bytes" in pages.columns
    out = size_bucketed_repartition(pdf_magic_filter(pages),
                                    size_col="n_bytes")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\n]*n_bytes", plan), plan[:2000]


def test_size_col_predicate_pushes_down(spark, tmp_path):
    path = str(tmp_path / "pages")
    _pages(spark, with_size=True).write.parquet(path)
    df = spark.read.parquet(path)
    out = size_bucketed_repartition(df, threshold=1000, n_partitions=8,
                                    size_col="n_bytes")
    assert out.count() == 40
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the branch predicates reach the scan as pushed filters on n_bytes
    assert re.search(r"PushedFilters: \[[^\n]*n_bytes", plan), plan[:2000]
