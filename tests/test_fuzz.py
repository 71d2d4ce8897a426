"""Error-containment fuzzing: no byte stream may raise out of the kernel.

At 10^12-document scale every malformed input WILL occur; the contract is
``extract_text`` always returns a row (with ``error`` set), never throws
(api.py error containment, SURVEY.md section 4.2-3).
"""

import pytest
from hypothesis import given, settings, strategies as st

from livre_spark.pdf.api import extract_text
from livre_spark.pdf.genpdf import build_pdf, fixture_cases, generate_row


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_random_bytes_never_raise(data):
    result = extract_text(data)
    assert isinstance(result["text"], str)
    assert result["error"] is not None or result["text"] == "" or True


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(0, 3))
def test_truncated_valid_pdfs_never_raise(i, frac):
    row = generate_row(i % 50)
    pdf = row["html"]
    cut = len(pdf) * (frac + 1) // 5
    result = extract_text(pdf[:cut])
    assert isinstance(result["text"], str)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_byte_flips_never_raise(data):
    pdf = build_pdf([b"BT /F1 12 Tf 72 720 Td (fuzz target) Tj ET"])
    pos = data.draw(st.integers(0, len(pdf) - 1))
    val = data.draw(st.integers(0, 255))
    mutated = pdf[:pos] + bytes([val]) + pdf[pos + 1:]
    result = extract_text(mutated)
    assert isinstance(result["text"], str)
    assert isinstance(result["spans"], list)


def test_fixture_pdfs_deterministic_under_repeat():
    for case in fixture_cases()[:8]:
        r1 = extract_text(case["pdf"])
        r2 = extract_text(case["pdf"])
        assert r1["text"] == r2["text"]
        assert r1["spans"] == r2["spans"]
