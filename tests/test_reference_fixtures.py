"""Parse the reference's own binary fixture PDFs (read in place from the
read-only reference checkout; skipped when absent).

These mirror the reference's integration tests (tests/content.rs:20-43,
tests/text_objects.rs:24-49), whose assertion is that every page's
content stream parses COMPLETELY - our equivalent is error is None.

- letter.pdf: PDF-1.7, hybrid xref (plain table + /XRefStm + object
  streams), /Prev incremental update, TrueType + Type0 fonts.
- text.pdf: PDF-1.4, plain xref, Flate content, Type0/Identity hex glyph
  codes - whose "text" under the reference's no-CMap heuristic is the
  Latin-1 decoding of the raw glyph bytes (README.md:24-26).
"""

import os

import pytest

from livre_spark.pdf.api import extract_text

RESOURCES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RESOURCES), reason="reference checkout not present")


def _load(name):
    with open(os.path.join(RESOURCES, name), "rb") as fh:
        return fh.read()


def test_letter_pdf_parses_completely():
    r = extract_text(_load("letter.pdf"))
    assert r["error"] is None
    assert r["n_pages"] == 1
    assert len(r["spans"]) > 500
    # WinAnsi-encoded simple-font text decodes readably via Latin-1
    assert "Groupe Hospitalier Henri Mondor" in r["text"]


def test_text_pdf_parses_completely():
    r = extract_text(_load("text.pdf"))
    assert r["error"] is None
    assert r["n_pages"] == 1
    assert len(r["spans"]) > 1000
    # Type0/Identity glyph codes surface as Latin-1 of the raw bytes -
    # the reference's documented pre-font-support behavior
    assert r["text"].startswith("\n\x00/\x00R\x00Q\x00J")


def test_reference_fixtures_deterministic():
    for name in ("letter.pdf", "text.pdf"):
        buf = _load(name)
        r1, r2 = extract_text(buf), extract_text(buf)
        r1.pop("parse_ms"), r2.pop("parse_ms")  # the only wall-clock field
        assert r1 == r2
