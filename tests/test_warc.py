"""WARC source: writer-twin roundtrips (plain / per-member gzip /
chunked HTTP), record filtering, containment, and the end-to-end
crawl-file -> pipeline path."""

import gzip
import io
import os

import pytest

from livre_spark.sources.warc import (
    WarcError, iter_warc_records, read_warc, write_warc,
)


def _records():
    return [
        {"url": "http://a.example/", "date": "2026-01-02T03:04:05Z",
         "body": b"<html><body>alpha</body></html>"},
        {"url": "http://b.example/x", "date": "2026-01-02T03:04:06Z",
         "body": b"%PDF-1.7 fake pdf bytes"},
        # non-response records must be skipped
        {"url": "http://meta.example/", "type": "metadata",
         "body": b"ignored", "http": False},
        {"url": "http://c.example/", "date": "2026-01-02T03:04:07Z",
         "body": b"\xff\xfebinary \x00payload"},
    ]


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("chunked", [False, True])
def test_roundtrip_plain_gzip_chunked(tmp_path, gz, chunked):
    path = str(tmp_path / ("f.warc.gz" if gz else "f.warc"))
    write_warc(path, _records(), gzip_members=gz, chunked=chunked)
    with open(path, "rb") as fh:
        got = list(iter_warc_records(io.BufferedReader(fh)))
    assert [u for u, _, _ in got] == ["http://a.example/",
                                      "http://b.example/x",
                                      "http://c.example/"]
    assert got[0][2] == b"<html><body>alpha</body></html>"
    assert got[1][2] == b"%PDF-1.7 fake pdf bytes"
    assert got[2][2] == b"\xff\xfebinary \x00payload"
    assert got[0][1].isoformat() == "2026-01-02T03:04:05"


def test_gzip_members_are_individually_skippable(tmp_path):
    """Per-record gzip members (the Common Crawl layout): each member
    decompresses standalone - the property that lets index-driven
    readers seek."""
    path = str(tmp_path / "m.warc.gz")
    write_warc(path, _records())
    data = open(path, "rb").read()
    # locate member boundaries by gzip magic and decode the SECOND one
    starts = [i for i in range(len(data) - 1)
              if data[i] == 0x1F and data[i + 1] == 0x8B]
    assert len(starts) == 4  # one member per record
    member2 = gzip.decompress(data[starts[1]:starts[2]])
    assert b"WARC-Target-URI: http://b.example/x" in member2


def test_bad_stream_raises_warc_error():
    with pytest.raises(WarcError):
        list(iter_warc_records(io.BufferedReader(
            io.BytesIO(b"NOT A WARC\r\n\r\n"))))
    # truncated payload
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: 100\r\n\r\nshort")
    with pytest.raises(WarcError):
        list(iter_warc_records(io.BufferedReader(io.BytesIO(rec))))


def test_read_warc_dataframe(spark, tmp_path):
    """A directory of WARC files -> pages rows, one task per file,
    corrupt files contained as diagnostic rows."""
    d = tmp_path / "crawl"
    os.makedirs(d)
    write_warc(str(d / "a.warc.gz"), _records())
    write_warc(str(d / "b.warc"), [
        {"url": "http://d.example/", "date": "2026-01-03T00:00:00Z",
         "body": b"<html>delta</html>"}], gzip_members=False)
    with open(d / "c.warc", "wb") as fh:
        fh.write(b"garbage that is not a warc record\r\n")
    df = read_warc(spark, str(d))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://a.example/", "http://b.example/x",
                         "http://c.example/", "http://d.example/",
                         f"warc-error://{d}/c.warc"}
    assert bytes(rows["http://d.example/"]["html"]) == b"<html>delta</html>"
    assert rows["http://b.example/x"]["n_bytes"] == len(
        b"%PDF-1.7 fake pdf bytes")
    assert rows["http://a.example/"]["warc_ts"] is not None
    assert "WarcError" in bytes(
        rows[f"warc-error://{d}/c.warc"]["html"]).decode()
    # file-per-task: the paths frame carries one file per partition
    assert df.rdd.getNumPartitions() == 3


def test_pipeline_from_warc_source(spark, tmp_path):
    """End-to-end: crawl WARC -> run_pipeline (PDF extraction + HTML
    main-content) with the standard sinks - the full ingest path a
    Common Crawl job takes."""
    from livre_spark.pdf.genpdf import build_pdf
    from livre_spark.plans.job import run_pipeline

    d = tmp_path / "crawl"
    os.makedirs(d)
    pdf = build_pdf([b"BT /F1 9 Tf (warc text) Tj ET"], flate=True)
    write_warc(str(d / "crawl-00000.warc.gz"), [
        {"url": "http://pdf.example/doc", "body": bytes(pdf)},
        {"url": "http://html.example/page",
         "body": b"<html><body><p>long enough paragraph of real "
                 b"content for the density rule to keep it around."
                 b"</p></body></html>"},
    ])
    out = str(tmp_path / "out")
    info = run_pipeline(spark, str(d / "*.warc.gz"), out,
                        checkpoint_dir=str(tmp_path / "ckpt"),
                        html_mode="main")
    text = {r["url"]: r["text"] for r in
            spark.read.parquet(info["text_path"]).collect()}
    assert text["http://pdf.example/doc"] == "\nwarc text"
    assert "long enough paragraph" in text["http://html.example/page"]


def test_read_wet_conversion_records(spark, tmp_path):
    """WET files (conversion records, text payloads) land with text
    populated and html empty - the skip-extraction ingest path."""
    from livre_spark.sources.warc import read_wet

    path = str(tmp_path / "f.warc.wet.gz")
    write_warc(path, [
        {"url": "http://a.example/", "type": "conversion",
         "body": "pre-extracted text éè".encode(),
         "http": False},
        {"url": "http://skip.example/",
         "body": b"<html>a response record must be skipped</html>"},
    ])
    rows = read_wet(spark, path).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["url"] == "http://a.example/"
    assert r["text"] == "pre-extracted text éè"
    assert r["html"] is None


def test_corrupt_gzip_member_is_warc_error(tmp_path):
    """zlib errors from damaged gzip members surface as WarcError -
    read_warc's per-file containment catches exactly one family."""
    import random

    path = str(tmp_path / "f.warc.gz")
    write_warc(path, [{"url": "http://x/", "body": b"<html>ok</html>"}] * 3)
    valid = open(path, "rb").read()
    rng = random.Random(7)
    seen_error = False
    for _ in range(300):
        b = bytearray(valid)
        b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        try:
            list(iter_warc_records(io.BufferedReader(io.BytesIO(bytes(b)))))
        except (WarcError, EOFError, OSError):
            seen_error = True
    assert seen_error  # flips do corrupt; they just stay contained


def test_chunked_batches_bound_task_memory(tmp_path):
    """A multi-record file yields MULTIPLE pandas batches under a small
    chunk budget (the read_warc memory contract: peak = one chunk, not
    one file), and the concatenation equals the unchunked rows."""
    import pandas as pd

    from livre_spark.sources.warc import iter_warc_batches

    path = str(tmp_path / "f.warc.gz")
    recs = [{"url": f"http://r{i}.example/", "body": b"x" * 100}
            for i in range(7)]
    write_warc(path, recs)

    by_records = list(iter_warc_batches(path, chunk_records=2))
    assert [len(b) for b in by_records] == [2, 2, 2, 1]
    by_bytes = list(iter_warc_batches(path, chunk_bytes=250))
    assert len(by_bytes) == 3 and [len(b) for b in by_bytes] == [3, 3, 1]
    whole = list(iter_warc_batches(path))
    assert len(whole) == 1
    got = pd.concat(by_records, ignore_index=True)
    exp = whole[0]
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["n_bytes"].tolist() == exp["n_bytes"].tolist()


def test_chunked_error_row_after_partial_records(tmp_path):
    """A file that goes bad mid-stream still yields the records parsed
    before the failure, then one diagnostic row, under chunking."""
    from livre_spark.sources.warc import iter_warc_batches

    path = str(tmp_path / "f.warc")
    write_warc(path, [{"url": "http://ok.example/", "body": b"fine"}],
               gzip_members=False)
    with open(path, "ab") as fh:
        fh.write(b"NOT A WARC RECORD\r\n")
    import pandas as pd
    rows = pd.concat(list(iter_warc_batches(path, chunk_records=1)),
                     ignore_index=True)
    assert rows["url"].tolist() == ["http://ok.example/",
                                    f"warc-error://{path}"]


def test_empty_source_is_clear_warc_error(spark, tmp_path):
    """No matching files -> a clear WarcError naming the source, not an
    opaque Spark repartition(0) failure."""
    d = tmp_path / "empty"
    os.makedirs(d)
    with pytest.raises(WarcError, match="no WARC files"):
        read_warc(spark, str(d / "*.warc.gz"))


def test_read_pages_routing(spark, tmp_path):
    """read_pages routes on basename/extension: '.warc' inside a
    parquet path or an Iceberg-ish table name must NOT hit the WARC
    file reader."""
    from livre_spark.sources import _is_warc_source

    assert _is_warc_source("/data/crawl-0.warc")
    assert _is_warc_source("/data/crawl-0.warc.gz")
    assert _is_warc_source("/data/crawl/*.warc.gz")
    assert not _is_warc_source("crawl.warc_index")        # Iceberg table
    assert not _is_warc_source("/data/x.warc_backup/part-0.parquet")
    # directory of warcs routes; directory of parquet does not
    d = tmp_path / "crawl"
    os.makedirs(d)
    write_warc(str(d / "a.warc.gz"),
               [{"url": "http://a.example/", "body": b"<html>a</html>"}])
    assert _is_warc_source(str(d))
    from livre_spark.sources import read_pages
    assert read_pages(spark, str(d)).count() == 1
    p = tmp_path / "pages.warc_style"   # '.warc' in path, parquet inside
    spark.range(3).write.parquet(str(p))
    assert not _is_warc_source(str(p))
    assert read_pages(spark, str(p)).count() == 3


def test_mixed_record_file_skip_logic(spark, tmp_path):
    """A realistic crawl file interleaving warcinfo / request /
    response / metadata records (all written by the twin, none
    hand-built): the reader keeps exactly the responses."""
    path = str(tmp_path / "mixed.warc.gz")
    write_warc(path, [
        {"type": "warcinfo",
         "body": b"Software-Info: crawler\r\nFormat: WARC 1.0\r\n"},
        {"type": "request", "url": "http://a.example/page"},
        {"url": "http://a.example/page", "body": b"<html>A</html>"},
        {"type": "metadata", "url": "http://a.example/page",
         "body": b"fetchTimeMs: 12\r\n", "http": False},
        {"type": "request", "url": "http://b.example/"},
        {"url": "http://b.example/", "body": b"<html>B</html>"},
    ])
    rows = {r["url"]: bytes(r["html"]) for r in
            read_warc(spark, path).collect()}
    assert rows == {"http://a.example/page": b"<html>A</html>",
                    "http://b.example/": b"<html>B</html>"}
    # the request records ARE HTTP request wire bytes (twin realism)
    reqs = list(iter_warc_records(
        io.BufferedReader(io.BytesIO(gzip.open(path, "rb").read())),
        record_types=(b"request",)))
    assert len(reqs) == 2
    assert reqs[0][2].startswith(b"GET /page HTTP/1.1\r\nHost: a.example")
    # warcinfo has no Target-URI -> url None
    infos = list(iter_warc_records(
        io.BufferedReader(io.BytesIO(gzip.open(path, "rb").read())),
        record_types=(b"warcinfo",)))
    assert infos[0][0] is None


def test_write_wet_roundtrip(spark, tmp_path):
    """write_wet -> read_wet: warcinfo header skipped, conversion text
    lands in the text column byte-for-byte."""
    from livre_spark.sources.warc import read_wet, write_wet

    path = str(tmp_path / "f.warc.wet.gz")
    write_wet(path, [
        {"url": "http://a.example/", "text": "extracted text é one"},
        {"url": "http://b.example/", "text": "two\nlines here"},
    ])
    rows = {r["url"]: r["text"] for r in read_wet(spark, path).collect()}
    assert rows == {"http://a.example/": "extracted text é one",
                    "http://b.example/": "two\nlines here"}
    assert all(r["html"] is None
               for r in read_wet(spark, path).collect())
