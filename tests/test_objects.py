"""Kernel unit tests: ported 1:1 from the reference's inline test vectors.

Each parametrized case cites its source in /root/reference (see the
module-level comments).  These pin the primitive byte->value semantics.
"""

import pytest

from livre_spark.pdf import lex, objects as ob
from livre_spark.pdf.errors import ParseError


# --- numbers (primitives/numbers.rs:188-201) -------------------------------

@pytest.mark.parametrize("raw,expected", [
    (b"42", 42), (b"+42", 42), (b"65535", 65535),
])
def test_unsigned(raw, expected):
    assert ob.parse_unsigned(raw, 0)[0] == expected


@pytest.mark.parametrize("raw,expected", [
    (b"32767", 32767), (b"-32768", -32768), (b"42", 42), (b"-42", -42),
])
def test_signed(raw, expected):
    assert ob.parse_signed(raw, 0)[0] == expected


@pytest.mark.parametrize("raw,expected", [
    (b"42", 42.0), (b"00042", 42.0), (b"-0.42", -0.42), (b"1.5e2", 150.0),
])
def test_real(raw, expected):
    assert ob.parse_real(raw, 0)[0] == pytest.approx(expected)


def test_unsigned_rejects_minus():
    with pytest.raises(ParseError):
        ob.parse_unsigned(b"-42", 0)


# --- booleans (primitives/boolean.rs:34-52) --------------------------------

@pytest.mark.parametrize("raw,expected", [(b"true", True), (b"false", False)])
def test_bool(raw, expected):
    assert ob.parse_bool(raw, 0) == (expected, len(raw))


@pytest.mark.parametrize("raw", [b"tru", b"fals", b"test"])
def test_bool_fail(raw):
    with pytest.raises(ParseError):
        ob.parse_bool(raw, 0)


# --- literal strings (special/strings/literal_string.rs:153-174) -----------

@pytest.mark.parametrize("raw,expected", [
    (b"(abcd)", b"abcd"),
    (b"(test)", b"test"),
    (b"(test\n)", b"test\n"),
    (b"(test (with inner parenthesis))", b"test (with inner parenthesis)"),
    (b"(\\0533)", b"+3"),
    (b"(te\\\\st)", b"te\\st"),
    (b"(te\\\nst)", b"test"),
    (b"(!3\\(.!530)", b"!3(.!530"),
    # reference-quirk escapes (literal_string.rs:94-120)
    (b"(a\\nb)", b"a\nb"),
    (b"(a\\rb)", b"a\rb"),
    (b"(a\\\tb)", b"a\tb"),          # backslash + literal TAB
    (b"(a\\bb)", b"a" + bytes([33, 161]) + b"b"),
    (b"(a\\fb)", b"a" + bytes([35, 43]) + b"b"),
    (b"(\\1)", b"\x01"), (b"(\\17)", b"\x0f"), (b"(\\137)", b"_"),
])
def test_literal_string(raw, expected):
    value, end = ob.parse_literal_string(raw, 0)
    assert bytes(value) == expected
    assert end == len(raw)


@pytest.mark.parametrize("raw", [
    b"(a\\tb)",   # the *letter* t is not a valid escape in the reference
    b"(a\\zb)",
    b"(\\777)",   # octal overflow panics in the reference
])
def test_literal_string_bad_escape(raw):
    with pytest.raises(ParseError):
        ob.parse_literal_string(raw, 0)


# --- hex strings (special/strings/hex_string.rs:96-102) --------------------

@pytest.mark.parametrize("raw,expected", [
    (b"<901FA3>", bytes([144, 31, 163])),
    (b"<901FA>", bytes([144, 31, 160])),
])
def test_hex_string(raw, expected):
    value, end = ob.parse_hex_string(raw, 0)
    assert bytes(value) == expected
    assert end == len(raw)


def test_hex_string_empty_fails():
    with pytest.raises(ParseError):
        ob.parse_hex_string(b"<>", 0)


# --- PDFString decode heuristic (strings/mod.rs:59-97) ---------------------

@pytest.mark.parametrize("raw,expected", [
    (b"abc", "abc"),
    (b"\xe9\xff", "\xe9\xff"),                      # Latin-1 passthrough
    (b"\xfe\xff\x00h\x00i", "hi"),                  # UTF-16BE BOM
    (b"\xfe\xff\x00h\x00i\x00", "hi"),              # odd trailing byte dropped
    (b"\xfe\xff\xd8\x00\x00a", "�a"),          # unpaired surrogate
    (b"\xfe\xff\xd8\x01\xdc\x37", "\U00010437"),    # valid surrogate pair
    (b"\x00/", "\x00/"),                            # glyph-code bytes (text.pdf style)
])
def test_decode(raw, expected):
    assert ob.decode_pdf_string(raw) == expected


# --- names (special/name.rs:98-117) ----------------------------------------

@pytest.mark.parametrize("raw,expected", [
    (b"/Name1", "Name1"),
    (b"/ASomewhatLongerName", "ASomewhatLongerName"),
    (b"/A;Name_With-Various***Characters?", "A;Name_With-Various***Characters?"),
    (b"/1.2", "1.2"),
    (b"/$$", "$$"),
    (b"/@pattern", "@pattern"),
    (b"/.notdef", ".notdef"),
    (b"/Lime#20Green\n", "Lime Green"),
    (b"/paired#28#29parentheses", "paired()parentheses"),
    (b"/The_Key_of_F#23_Minor", "The_Key_of_F#_Minor"),
    (b"/A#42", "AB"),
])
def test_name(raw, expected):
    value, _ = ob.parse_name(raw, 0)
    assert bytes(value).decode("latin-1") == expected


# --- references / indirect (refs/reference.rs:121-140, refs/indirect.rs:83-97)

@pytest.mark.parametrize("raw,expected", [
    (b"0 0 R", (0, 0)), (b"10 0 R", (10, 0)), (b"10 10 R", (10, 10)),
])
def test_reference(raw, expected):
    ref, end = ob.parse_reference(raw, 0)
    assert ref.id == expected
    assert end == len(raw)


def test_reference_needs_single_spaces():
    with pytest.raises(ParseError):
        ob.parse_reference(b"10  0 R", 0)


@pytest.mark.parametrize("raw,inner", [
    (b"0 0 obj\n10\nendobj", 10),
    (b"0 0 obj\ntrue\nendobj", True),
])
def test_indirect(raw, inner):
    rid, value, end = ob.parse_indirect(raw, 0, ob.parse_object)
    assert rid == (0, 0)
    assert value == inner
    assert end == len(raw)


# --- raw values / raw dict (special/map.rs:246-280) -------------------------

@pytest.mark.parametrize("raw", [
    b"+200", b"/Name", b"(string)", b"<</Key1 true/Key2 (test)>>",
    b"<F3BB>", b"[1 2 3 4 true]",
])
def test_raw_value_roundtrip(raw):
    s, e, _ = ob.recognize_raw_value(raw, 0)
    assert raw[s:e] == raw


def test_raw_dict():
    raw = b"<</Key1 true/Key2   false   /Key3 42>>"
    d, end = ob.parse_raw_dict(raw, 0)
    assert end == len(raw)
    assert {k: raw[s:e] for k, (s, e) in d.entries.items()} == {
        b"Key1": b"true", b"Key2": b"false", b"Key3": b"42"}
    assert d.pop(b"Key1") is not None
    assert d.pop(b"inexistant") is None


# --- any-object parser (special/object.rs:238-284) --------------------------

@pytest.mark.parametrize("raw,expected", [
    (b"null", None),
    (b"1", 1),
    (b"1.0", 1.0),
    (b"[true 1]", [True, 1]),
    (b"(test)", ob.PdfString(b"test")),
    (b"/test", ob.PdfName(b"test")),
    (b"0 0 R", ob.Ref(0, 0)),
])
def test_parse_object(raw, expected):
    value, _ = ob.parse_object(raw, 0)
    assert value == expected
    assert type(value) is type(expected)


def test_parse_object_real_vs_int():
    v, _ = ob.parse_object(b"1.0", 0)
    assert isinstance(v, float)
    v, _ = ob.parse_object(b"1", 0)
    assert isinstance(v, int) and not isinstance(v, bool)


def test_parse_object_dict():
    raw = b"<<\n/bool true\n/int 1\n>>\n"
    value, _ = ob.parse_object(raw, 0)
    assert value == {b"bool": True, b"int": 1}


def test_parse_object_stream():
    raw = b"<</Length 1>>stream\n0\nendstream\n"
    value, _ = ob.parse_object(raw, 0)
    assert isinstance(value, ob.PdfStream)
    assert value.content == b"0"
    assert value.structured == {}

    raw = b"<</Length 1/Test (test)>>stream\n0\nendstream\n"
    value, _ = ob.parse_object(raw, 0)
    assert value.content == b"0"
    assert value.structured == {b"Test": ob.PdfString(b"test")}


# --- stream extraction vectors (special/stream.rs:214-244) ------------------

@pytest.mark.parametrize("raw,content", [
    (b"<</Length 10/Test true>> stream\n0123456789\nendstream\n", b"0123456789"),
    (b"<</Length 1/Test false /Test2 false>>stream\n0\nendstream\n", b"0"),
    (b"<</Length 10/Test/Test>> stream\n0123456789\nendstream\n", b"0123456789"),
])
def test_stream(raw, content):
    value, _ = ob.parse_stream(raw, 0)
    assert value.content == content


def test_stream_flate():
    import zlib
    payload = zlib.compress(b"hello world" * 10)
    raw = (b"<</Length " + str(len(payload)).encode() +
           b"/Filter/FlateDecode>>stream\n" + payload + b"\nendstream")
    value, _ = ob.parse_stream(raw, 0)
    assert value.content == b"hello world" * 10


def test_stream_unsupported_filter():
    raw = b"<</Length 1/Filter/DCTDecode>>stream\n0\nendstream"
    with pytest.raises(ParseError):
        ob.parse_stream(raw, 0)


# --- containers (vec.rs:47-58, array.rs:47-69, tuple, maybe_array) ----------

@pytest.mark.parametrize("raw,expected", [
    (b"[true true  false]", [True, True, False]),
    (b"[  true true  false  ]", [True, True, False]),
    (b"[  1   2 3]", [1, 2, 3]),
])
def test_vec(raw, expected):
    value, end = ob.parse_vec(raw, 0, ob.parse_object)
    assert value == expected
    assert end == len(raw)


def test_fixed_array_wrong_length():
    with pytest.raises(ParseError):
        ob.parse_fixed_array(b"[1 2 3]", 0, ob.parse_signed, 2)


@pytest.mark.parametrize("raw,expected", [
    (b"[true true]", [True, True]),
    (b"true", [True]),
])
def test_maybe_array(raw, expected):
    value, _ = ob.parse_maybe_array(raw, 0, ob.parse_bool)
    assert value == expected


def test_tuple():
    value, _ = ob.parse_tuple(b"42 true", 0, ob.parse_signed, ob.parse_bool)
    assert value == (42, True)


# --- rectangle / id / date (special/{rectangle,id,date}.rs tests) -----------

@pytest.mark.parametrize("raw,expected", [
    (b"[ 0 0 10 10]", (0.0, 0.0, 10.0, 10.0)),
    (b"[ -3 2 10 10.5]", (-3.0, 2.0, 10.0, 10.5)),
])
def test_rectangle(raw, expected):
    assert ob.parse_rectangle(raw, 0)[0] == expected


def test_file_id():
    value, _ = ob.parse_file_id(b"[<2B55><0a12>]", 0)
    assert value == (b"\x2b\x55", b"\x0a\x12")


@pytest.mark.parametrize("raw,fields", [
    (b"D:199812231952-08'00", dict(year=1998, month=12, day=23, hour=19,
                                   minute=52, second=None, offset=-480)),
    (b"D:199812231952+08'00", dict(year=1998, month=12, day=23, hour=19,
                                   minute=52, second=None, offset=480)),
    (b"D:199812231952Z", dict(year=1998, month=12, day=23, hour=19,
                              minute=52, second=None, offset=0)),
    (b"D:2000", dict(year=2000, month=None, day=None, hour=None,
                     minute=None, second=None, offset=None)),
    (b"D:200001", dict(year=2000, month=1, day=None, hour=None,
                       minute=None, second=None, offset=None)),
    (b"D:20000102", dict(year=2000, month=1, day=2, hour=None,
                         minute=None, second=None, offset=None)),
])
def test_date(raw, fields):
    value, _ = ob.parse_date(raw, 0)
    assert value == fields


# --- comments (special/comments.rs tests) -----------------------------------

@pytest.mark.parametrize("raw", [b"% 42\n", b"% Another comment\r\n"])
def test_comment(raw):
    assert lex.comment_recognize(raw, 0) == len(raw)


@pytest.mark.parametrize("raw", [b"% 42\n", b"\r\n", b""])
def test_multicomment0(raw):
    assert lex.multicomment0(raw, 0) == len(raw)


def test_multicomment1_fails_on_empty():
    with pytest.raises(ParseError):
        lex.multicomment1(b"", 0)


# --- balanced delimiters (delimiter.rs:148-180) -----------------------------

@pytest.mark.parametrize("raw,inner", [
    (b"<test>", b"test"), (b"<>", b""), (b"<te<s>t>", b"te<s>t"),
    (b"<te<s>eafwt>", b"te<s>eafwt"),
])
def test_angles(raw, inner):
    s, e, end = lex.recognize_angles(raw, 0)
    assert raw[s:e] == inner
    assert end == len(raw)


def test_double_angles():
    s, e, end = lex.recognize_double_angles(b"<<test>>", 0)
    assert b"<<test>>"[s:e] == b"test"
    assert end == 8


def test_unbalanced_fails():
    with pytest.raises(ParseError):
        lex.recognize_parens(b"(unclosed", 0)


# --- Option<T> (primitives/option.rs:32-48) ---------------------------------

@pytest.mark.parametrize("raw,expected", [
    (b"true", True), (b"false", False), (b"null", None),
])
def test_option_bool(raw, expected):
    value, end = ob.parse_option(raw, 0, ob.parse_bool)
    assert value == expected
    assert end == len(raw)


@pytest.mark.parametrize("raw,expected", [
    (b"-23", -23), (b"42", 42), (b"null", None),
])
def test_option_int(raw, expected):
    value, _ = ob.parse_option(raw, 0, ob.parse_signed)
    assert value == expected


def test_filter_list_forms():
    assert ob.parse_filter_list(b"/FlateDecode", 0)[0] == [b"FlateDecode"]
    assert ob.parse_filter_list(b"[ /FlateDecode ]", 0)[0] == [b"FlateDecode"]
    assert ob.parse_filter_list(b"[/FlateDecode /FlateDecode]", 0)[0] == \
        [b"FlateDecode", b"FlateDecode"]
