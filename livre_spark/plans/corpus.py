"""Materialize the deterministic synthetic corpus as a parquet pages table.

Written with pyarrow directly (no Spark session needed) so tests and the
bench harness can produce input data cheaply.  Schema = the input_hint
table: (url, warc_ts, html binary, text, lang).
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..pdf.genpdf import generate_row

_BASE_TS = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def corpus_rows(n_docs: int, seed: int = 42, duplicate_every: int = 40):
    """Yield corpus rows; every ``duplicate_every``-th url also gets an
    older duplicate snapshot (exercises latest-per-url dedup)."""
    for i in range(n_docs):
        row = generate_row(i, seed)
        ts = _BASE_TS + datetime.timedelta(seconds=i)
        if duplicate_every and i % duplicate_every == 7:
            # an OLDER snapshot with different (stale) bytes
            stale = generate_row(i + 10_000_000, seed)
            yield dict(url=row["url"], warc_ts=ts - datetime.timedelta(days=1),
                       html=stale["html"], text="", lang=row["lang"],
                       n_bytes=len(stale["html"]))
        yield dict(url=row["url"], warc_ts=ts, html=row["html"],
                   text="", lang=row["lang"], n_bytes=len(row["html"]))


def expected_rows(n_docs: int, seed: int = 42):
    """The golden (url, expected_text, n_pages, kind) for the same corpus."""
    for i in range(n_docs):
        row = generate_row(i, seed)
        yield dict(url=row["url"], expected_text=row["expected_text"],
                   n_pages=row["n_pages"], kind=row["kind"])


def write_corpus(path: str, n_docs: int, seed: int = 42,
                 duplicate_every: int = 40, rows_per_group: int = 2000) -> str:
    """Write the pages table; returns the path."""
    os.makedirs(path, exist_ok=True)
    # n_bytes persisted at ingest: the size-bucket branch predicates then
    # push into the scan as stats-pruned filters instead of measuring the
    # binary column twice (operators/skew.py size_col rationale)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("n_bytes", pa.int64()),
    ])
    out = os.path.join(path, "part-00000.parquet")
    rows = list(corpus_rows(n_docs, seed, duplicate_every))
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, out, row_group_size=rows_per_group)
    return path
