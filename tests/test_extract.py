"""Golden end-to-end tests: synthetic PDFs with text known by construction."""

import pytest

from livre_spark.pdf import genpdf
from livre_spark.pdf.api import extract_text, is_pdf

CASES = genpdf.fixture_cases()


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_fixture_case(case):
    result = extract_text(case["pdf"])
    assert result["error"] == case["error"], (case["name"], result["error"])
    assert result["text"] == case["text"], case["name"]
    if case["error"] is None:
        assert result["n_pages"] == case["n_pages"]


def test_spans_simple():
    pdf = genpdf.build_pdf([b"BT /F1 12 Tf 100 700 Td (Hello) Tj ET"])
    r = extract_text(pdf)
    assert r["error"] is None
    assert r["text"] == "\nHello"
    assert r["spans"] == [
        {"page": 0, "x": 100.0, "y": 700.0, "off": 1, "len": 5}]


def test_spans_positions_tj():
    pdf = genpdf.build_pdf(
        [b"BT /F1 12 Tf 10 20 Td [ (ab) 1000 (cd) ] TJ ET"])
    r = extract_text(pdf)
    assert r["text"] == "\nabcd"
    # second segment moved by -1000/1000 = -1 in x
    assert r["spans"][0]["x"] == 10.0 and r["spans"][0]["off"] == 1
    assert r["spans"][1]["x"] == 9.0 and r["spans"][1]["off"] == 3


def test_spans_quote_newline_positions():
    pdf = genpdf.build_pdf(
        [b"BT /F1 12 Tf 14 TL 0 100 Td (a) Tj (b) ' ET"])
    r = extract_text(pdf)
    assert r["text"] == "\nab\n"
    assert r["spans"][0]["y"] == 100.0
    # ' moves down by the leading before showing
    assert r["spans"][1]["y"] == 86.0


def test_spans_multi_page_offsets():
    pdf = genpdf.build_pdf([
        genpdf._simple_content(["one"]),
        genpdf._simple_content(["two"]),
    ])
    r = extract_text(pdf)
    assert r["text"] == "\none\ntwo"
    assert [s["page"] for s in r["spans"]] == [0, 1]
    assert [s["off"] for s in r["spans"]] == [1, 5]


def test_byte_identity_across_runs():
    for i in (0, 7, 31):
        row = genpdf.generate_row(i)
        if row["kind"] != "pdf":
            continue
        r1 = extract_text(row["html"])
        r2 = extract_text(row["html"])
        assert r1["text"] == r2["text"] == row["expected_text"]
        assert r1["spans"] == r2["spans"]
        assert r1["error"] is None
        assert r1["n_pages"] == row["n_pages"]


def test_corpus_expected_text():
    """The generator's expected text matches the kernel output exactly."""
    ok = err = html = 0
    for i in range(120):
        row = genpdf.generate_row(i)
        r = extract_text(row["html"])
        if row["kind"] == "pdf":
            assert r["error"] is None, (i, r["error"])
            assert r["text"] == row["expected_text"], i
            ok += 1
        elif row["kind"] == "html":
            assert not is_pdf(row["html"])
            html += 1
        else:
            assert r["error"] is not None
            err += 1
    assert ok > 90 and html >= 2 and err >= 1


def test_is_pdf():
    assert is_pdf(b"%PDF-1.7\nrest")
    assert not is_pdf(b"<html>")


def test_asciihex_decode_vectors():
    """Beyond-reference extension (north_star): PDF 32000-1 7.4.2."""
    from livre_spark.pdf.errors import ParseError
    from livre_spark.pdf.filters import asciihex_decode

    assert asciihex_decode(b"48656C6C6F>") == b"Hello"
    # PDF whitespace between digits is skipped
    assert asciihex_decode(b"48 65\n6C\t6c 6F >") == b"Hello"
    # odd trailing digit padded with 0
    assert asciihex_decode(b"7>") == b"\x70"
    # data after EOD ignored
    assert asciihex_decode(b"41>GARBAGE") == b"A"
    # no EOD marker: consume to end
    assert asciihex_decode(b"4142") == b"AB"
    assert asciihex_decode(b"") == b""
    try:
        asciihex_decode(b"4G>")
        raise AssertionError("expected ParseError")
    except ParseError:
        pass


def test_asciihex_pdf_end_to_end():
    from livre_spark.pdf.api import extract_text
    from livre_spark.pdf.genpdf import _simple_content, build_pdf

    lines = ["hex encoded page", "second line"]
    expected = "\n" + "\n".join(lines)
    for kwargs in (dict(ahx=True), dict(ahx=True, flate=True),
                   dict(ahx=True, xref="stream"),
                   dict(ahx=True, contents_array=True)):
        r = extract_text(build_pdf([_simple_content(lines)], **kwargs))
        assert r["error"] is None, (kwargs, r["error"])
        assert r["text"] == expected, kwargs


def test_strip_inline_images_opt_in():
    """BI/ID/EI spans poison the default tokenizer (contained error,
    matching the reference); strip_inline=True recovers all the text."""
    from livre_spark.pdf.api import extract_text
    from livre_spark.pdf.genpdf import build_pdf
    from livre_spark.pdf.inline import strip_inline_images

    content = (b"BT /F1 12 Tf 72 720 Td (before) Tj ET\n"
               b"BI /W 2 /H 2 /CS /RGB /BPC 8 ID \x00\x01\xfe\xff(\x9b\\ "
               b"EI\nBT /F1 12 Tf 72 700 Td (after) Tj ET")
    pdf = build_pdf([content])
    r0 = extract_text(pdf)
    assert r0["error"] is not None            # default: contained error
    r1 = extract_text(pdf, strip_inline=True)
    assert r1["error"] is None
    assert r1["text"] == "\nbefore\nafter"

    # tolerant edges: unterminated image, BI without ID
    assert strip_inline_images(b"(a) Tj BI /W 1 ID \xff\xff") == b"(a) Tj  "
    assert strip_inline_images(b"BI /W 1 /H 1") == b" "
    # EI inside a text string is NOT an image terminator context
    kept = strip_inline_images(b"BT (no EI here) Tj ET")
    assert kept == b"BT (no EI here) Tj ET"
