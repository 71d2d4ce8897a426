"""The fused single-pass extractor must be byte-identical to the
reference-shaped two-pass implementation on every input."""

from hypothesis import given, settings, strategies as st

from livre_spark.pdf import content as C
from livre_spark.pdf.document import open_document
from livre_spark.pdf.genpdf import fixture_cases, generate_row

ADVERSARIAL = [
    b"",
    b"BT",
    b"(a) Tj",                      # show outside BT: text only
    b"1 2",                         # dangling operands
    b"BT )",                        # bad byte
    b"%cmt\nBT ET",                 # comments are invalid in content streams
    b"BDCX (x) Tj",                 # >3-char unknown op splits
    b"1 2 3 Td (x) Tj",             # extra operand ignored
    b"(unclosed Tj",
    b"/N 1 Tf <41> Tj ET",          # Tf outside BT
    b"BT /F1 1 Tf (a) Tj /F2 2 Tf (b) Tj ET",   # second Tf
    b"BT 5 TL /F1 1 Tf (a) ' 1 2 (b) \" [ (c) -3 (d) ] TJ ET",
    b"BT 72 720 Td ET BT /F1 1 Tf (ok) Tj ET",  # first BT never gets Tf
    b"BT /F1 1 Tf (a) Tj",          # unclosed after Tf: NOT an error
    b"q 1 0 0 1 5 5 cm BT /F1 2 Tf T* (x) Tj ET Q",
    b"BT BT /F1 1 Tf (n) Tj ET",    # nested BT skipped in build
    b"9 Tr",                        # bad rendering mode
    b"{ }",                         # invalid bytes
]


def test_adversarial_equivalence():
    for cs in ADVERSARIAL:
        assert C.extract_page(cs) == C.extract_page_twopass(cs), cs


def test_fixture_corpus_equivalence():
    checked = 0
    for case in fixture_cases():
        if case["error"] in ("NoStartXref", "BadStartXref"):
            continue
        try:
            doc = open_document(case["pdf"])
            pages = doc.pages()
        except Exception:
            continue
        for page in pages:
            try:
                cs = doc.build_content(page)
            except Exception:
                continue
            assert C.extract_page(cs) == C.extract_page_twopass(cs), case["name"]
            checked += 1
    assert checked > 15


def test_generated_corpus_equivalence():
    checked = 0
    for i in range(60):
        row = generate_row(i)
        if row["kind"] != "pdf":
            continue
        doc = open_document(row["html"])
        for page in doc.pages():
            cs = doc.build_content(page)
            assert C.extract_page(cs) == C.extract_page_twopass(cs), i
            checked += 1
    assert checked > 50


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_random_bytes_equivalence(data):
    assert C.extract_page(data) == C.extract_page_twopass(data)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from([
    b"BT", b"ET", b"T*", b"(s) Tj", b"<4142> Tj", b"(s) '",
    b"1 2 (s) \"", b"[ (a) 5 (b) ] TJ", b"/F1 9 Tf", b"3 Tc", b"7 TL",
    b"1 0 0 1 10 20 Tm", b"5 -6 Td", b"2 3 TD", b"q", b"Q",
    b"0.5 0 0 0.5 0 0 cm", b"2 Tr", b"0.4 Ts", b"110 Tz", b"1.5 Tw",
]), max_size=25))
def test_op_sequences_equivalence(ops):
    cs = b" ".join(ops)
    assert C.extract_page(cs) == C.extract_page_twopass(cs)
